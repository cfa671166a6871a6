"""Net-services protocol logic against in-process mock endpoints.

Reference behaviors being verified: NAT-PMP port mapping
(RFC 6886; the reference's auto-NAT via `upnpc`,
`net/services.cpp:488-545`), UPnP IGD SSDP+SOAP, public-IP JSON
parsing (`services.cpp:676-690` ipinfo_json fallback order),
registry check-in URL (`services.cpp:825-900`), dyndns2 update, and
the auto-update state machine (`net/update.cpp:107-270`).
No network egress: UDP peers and HTTP servers run in-process.
"""

import asyncio
import socket
import struct
import threading

import numpy as np  # noqa: F401  (conftest forces CPU jax)
import pytest

from flydog_sdr_gps_tpu.server import netproto as npx
from flydog_sdr_gps_tpu.server.update import (
    FAIL_BUILD, FAIL_NO_INET, FAIL_NONE, UpdateManager, parse_version)


# -- NAT-PMP ----------------------------------------------------------------

def test_natpmp_roundtrip_against_fake_gateway():
    """A fake gateway thread answers RFC 6886 requests; the builders
    and parser must interoperate with it."""
    gw = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    gw.bind(("127.0.0.1", 0))
    gw_port = gw.getsockname()[1]

    def gateway():
        for _ in range(2):
            data, addr = gw.recvfrom(64)
            ver, op = data[0], data[1]
            assert ver == 0
            if op == npx.OP_EXTERNAL_ADDR:
                resp = struct.pack("!BBHI4B", 0, 128, 0, 1234,
                                   203, 0, 113, 7)
            else:
                _, _, _, priv, pub, life = struct.unpack("!BBHHHI",
                                                         data)
                resp = struct.pack("!BBHIHHI", 0, 128 + op, 0, 1234,
                                   priv, pub, life)
            gw.sendto(resp, addr)

    t = threading.Thread(target=gateway, daemon=True)
    t.start()
    cl = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    cl.settimeout(5)
    cl.sendto(npx.natpmp_external_addr_request(),
              ("127.0.0.1", gw_port))
    ext = npx.natpmp_parse_response(cl.recv(64))
    assert ext["result"] == 0 and ext["external_ip"] == "203.0.113.7"

    cl.sendto(npx.natpmp_map_request(8073, 8073, 7200, tcp=True),
              ("127.0.0.1", gw_port))
    mp = npx.natpmp_parse_response(cl.recv(64))
    assert mp["opcode"] == npx.OP_MAP_TCP and mp["result"] == 0
    assert mp["public_port"] == 8073 and mp["lifetime_s"] == 7200
    t.join(timeout=5)
    gw.close()
    cl.close()


def test_natpmp_rejects_garbage():
    with pytest.raises(ValueError):
        npx.natpmp_parse_response(b"\x01\x00")
    with pytest.raises(ValueError):
        npx.natpmp_parse_response(b"\x00\x01" + b"\x00" * 10)  # op<128


# -- UPnP -------------------------------------------------------------------

def test_ssdp_and_soap_builders():
    req = npx.ssdp_msearch_request()
    assert req.startswith(b"M-SEARCH * HTTP/1.1")
    assert b"ST: urn:schemas-upnp-org:device:InternetGatewayDevice:1" \
        in req
    hdrs = npx.ssdp_parse_response(
        b"HTTP/1.1 200 OK\r\nST: upnp:rootdevice\r\n"
        b"LOCATION: http://192.168.1.1:5000/rootDesc.xml\r\n\r\n")
    assert hdrs["LOCATION"].endswith("rootDesc.xml")

    desc = """<root><device><serviceList><service>
<serviceType>urn:schemas-upnp-org:service:WANIPConnection:1</serviceType>
<controlURL>/ctl/IPConn</controlURL></service>
</serviceList></device></root>"""
    url = npx.upnp_control_url(desc,
                               "http://192.168.1.1:5000/rootDesc.xml")
    assert url == "http://192.168.1.1:5000/ctl/IPConn"

    headers, body = npx.upnp_add_port_mapping_soap(
        8073, 8073, "192.168.1.77")
    assert "AddPortMapping" in headers["SOAPAction"]
    assert b"<NewInternalClient>192.168.1.77</NewInternalClient>" \
        in body
    assert npx.upnp_parse_soap_response(200, b"")["ok"]
    err = npx.upnp_parse_soap_response(500, b"""<e>
<errorCode>718</errorCode>
<errorDescription>ConflictInMappingEntry</errorDescription></e>""")
    assert not err["ok"] and err["error_code"] == 718


# -- HTTP services against an in-process aiohttp server ---------------------

def test_public_ip_registry_ddns_against_mock_server():
    aiohttp = pytest.importorskip("aiohttp")
    from aiohttp import web

    hits = []

    async def scenario():
        app = web.Application()

        async def ip_json(request):
            return web.json_response(
                {"ip": "203.0.113.9", "latitude": 47.3,
                 "longitude": 8.5})

        async def registry(request):
            hits.append(dict(request.query))
            return web.Response(text="ok")

        async def ddns(request):
            hits.append(dict(request.query))
            assert request.headers["Authorization"].startswith("Basic")
            return web.Response(text="good 203.0.113.9")

        app.router.add_get("/json", ip_json)
        app.router.add_get("/reg", registry)
        app.router.add_get("/nic/update", ddns)
        runner = web.AppRunner(app)
        await runner.setup()
        site = web.TCPSite(runner, "127.0.0.1", 18911)
        await site.start()
        base = "http://127.0.0.1:18911"

        async def fetch(url, data=None, headers=None):
            # first API in the list is unreachable -> fallback works
            if "ipapi.co" in url or "ipinfo.io" in url or \
                    "ip-api.com" in url:
                url = base + "/json"
            async with aiohttp.ClientSession() as s:
                async with s.get(url, headers=headers or {}) as r:
                    return r.status, await r.read()

        info = await npx.public_ip_lookup(fetch)
        assert info == {"ip": "203.0.113.9", "lat": 47.3, "lon": 8.5}

        class FakeEng:
            class params:
                num_channels = 8

        class FakeServer:
            engine = FakeEng()
            conns = {}
            gps = None
            port = 8073
            ui_srate = 30e6
            start_time = 0.0

        ok = await npx.registry_checkin(fetch, base + "/reg",
                                        FakeServer())
        assert ok and hits[0]["users_max"] == "8"

        word = await npx.ddns_update(fetch, base + "/nic/update",
                                     "me.example.org", info["ip"],
                                     auth="user:pw")
        assert word == "good"
        assert hits[1] == {"hostname": "me.example.org",
                           "myip": "203.0.113.9"}
        await runner.cleanup()

    asyncio.run(asyncio.wait_for(scenario(), timeout=60))


def test_ip_api_parser_rejects_bad():
    assert npx.parse_ip_api(b"not json", "ip", None, None) is None
    assert npx.parse_ip_api(b'{"ip": "nope"}', "ip", None, None) is None
    # ipinfo.io loc="lat,lon" form
    out = npx.parse_ip_api(b'{"ip":"1.2.3.4","loc":"1.5,-2.5"}',
                           "ip", None, None)
    assert out == {"ip": "1.2.3.4", "lat": 1.5, "lon": -2.5}


# -- auto-update state machine ----------------------------------------------

def _runner_factory(remote_version: str, fails: set[str]):
    log = []

    def runner(cmd: str):
        log.append(cmd)
        if "df ." in cmd:
            return (0, "") if "fs_full" in fails else (1, "")
        if "ping" in cmd:
            return (1, "") if "inet" in fails else (0, "")
        if "git fetch" in cmd:
            return (1, "") if "github" in fails else (0, "")
        if "git show" in cmd:
            return 0, f'__version__ = "{remote_version}"\n'
        if "git merge" in cmd:
            return (1, "boom") if "build" in fails else (0, "built ok")
        return 0, ""
    return runner, log


def test_update_version_parsers():
    assert parse_version("VERSION_MAJ = 1\nVERSION_MIN = 662\n") \
        == (1, 662)
    assert parse_version('__version__ = "0.1.0"') == (0, 1)
    assert parse_version("nothing") is None


def test_update_check_only_reports_pending():
    runner, log = _runner_factory("9.9.0", set())
    upd = UpdateManager(runner=runner, install_enabled=False)
    st = upd.check()
    assert st["f"] == FAIL_NONE and st["p"] == 1
    assert (st["p1"], st["p2"]) == (9, 9)
    assert not upd.restart_requested
    assert not any("git merge" in c for c in log)   # no install


def test_update_install_builds_and_restarts():
    runner, log = _runner_factory("9.9.0", set())
    upd = UpdateManager(runner=runner, install_enabled=True)
    st = upd.check()
    assert st["f"] == FAIL_NONE and upd.restart_requested
    assert any("git merge" in c for c in log)
    assert any("build complete" in ln for ln in upd.build_log)


def test_update_failure_paths():
    runner, _ = _runner_factory("9.9.0", {"inet"})
    upd = UpdateManager(runner=runner)
    assert upd.check()["f"] == FAIL_NO_INET

    runner, _ = _runner_factory("9.9.0", {"build"})
    upd = UpdateManager(runner=runner, install_enabled=True)
    assert upd.check()["f"] == FAIL_BUILD
    assert not upd.restart_requested

    # same version: nothing to do
    runner, log = _runner_factory("0.1.0", set())
    upd = UpdateManager(runner=runner, install_enabled=True)
    st = upd.check()
    assert st["f"] == FAIL_NONE and st["p"] == 0
    assert not upd.restart_requested

    # forced build installs even without a version change
    runner, log = _runner_factory("0.1.0", set())
    upd = UpdateManager(runner=runner, install_enabled=True)
    upd.check(force_build=True)
    assert upd.restart_requested


def test_update_window():
    import time as _t
    upd = UpdateManager()
    three_am = _t.mktime((2026, 8, 21, 3, 0, 0, 0, 0, -1))
    noon = _t.mktime((2026, 8, 21, 12, 0, 0, 0, 0, -1))
    assert upd.in_window(three_am) and not upd.in_window(noon)


def test_auto_nat_natpmp_then_upnp_fallback():
    """Full auto-NAT flow against in-process mocks: a NAT-PMP-capable
    gateway answers directly; a NAT-PMP-deaf gateway falls back to
    the complete UPnP chain (SSDP -> description -> SOAP)."""
    aiohttp = pytest.importorskip("aiohttp")
    from aiohttp import web

    async def scenario():
        # --- mock IGD HTTP side ---
        app = web.Application()

        async def root_desc(request):
            return web.Response(text="""<root><device><serviceList>
<service><serviceType>urn:schemas-upnp-org:service:WANIPConnection:1\
</serviceType><controlURL>/ctl</controlURL></service>
</serviceList></device></root>""")

        soap_hits = []

        async def ctl(request):
            body = await request.read()
            soap_hits.append(body)
            assert b"<NewExternalPort>8073</NewExternalPort>" in body
            return web.Response(text="<ok/>")

        app.router.add_get("/rootDesc.xml", root_desc)
        app.router.add_post("/ctl", ctl)
        runner = web.AppRunner(app)
        await runner.setup()
        site = web.TCPSite(runner, "127.0.0.1", 18913)
        await site.start()

        async def fetch(url, data=None, headers=None):
            async with aiohttp.ClientSession() as s:
                meth = s.post if data is not None else s.get
                kw = dict(headers=headers or {})
                if data is not None:
                    kw["data"] = data
                async with meth(url, **kw) as r:
                    return r.status, await r.read()

        # gateway A: speaks NAT-PMP
        async def udp_a(payload, addr):
            if addr[1] == npx.NATPMP_PORT:
                _, op, _, priv, pub, life = struct.unpack("!BBHHHI",
                                                          payload)
                return struct.pack("!BBHIHHI", 0, 128 + op, 0, 99,
                                   priv, pub, life)
            return None

        out = await npx.auto_nat_open(fetch, udp_a, "192.168.1.1",
                                      8073, "192.168.1.77", 8073)
        assert out["ok"] and out["via"] == "natpmp"
        assert out["public_port"] == 8073

        # gateway B: no NAT-PMP; answers SSDP with the mock IGD
        async def udp_b(payload, addr):
            if addr[1] == npx.NATPMP_PORT:
                return None
            assert payload.startswith(b"M-SEARCH")
            return (b"HTTP/1.1 200 OK\r\nST: upnp:rootdevice\r\n"
                    b"LOCATION: http://127.0.0.1:18913/rootDesc.xml"
                    b"\r\n\r\n")

        out = await npx.auto_nat_open(fetch, udp_b, "192.168.1.1",
                                      8073, "192.168.1.77", 8073)
        assert out["ok"] and out["via"] == "upnp"
        assert soap_hits, "SOAP AddPortMapping never reached the IGD"
        await runner.cleanup()

    asyncio.run(asyncio.wait_for(scenario(), timeout=60))
