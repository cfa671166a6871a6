"""Connection policy + extended SET surface.

Reference behavior under test:
- keepalive expiry kick (`rx/rx_sound.cpp:382-414`,
  `rx/rx_waterfall.cpp:700-721`)
- inactivity timeout with tlimit-exempt passwords
  (`rx/rx_cmd.cpp` CMD_AUTH)
- per-IP channel limit (CMD_AUTH dup-ip policy)
- DX label serving ("SET MARKER" -> "MSG mkr=", `init/dx.cpp`) and
  editing ("SET DX_UPD", `rx/rx_cmd.cpp:885-905`)
- geoloc / pref_export / pref_import (`rx/rx_cmd.cpp:1885,1963`)
"""

import asyncio
import json

import pytest

aiohttp = pytest.importorskip("aiohttp")

from flydog_sdr_gps_tpu.models import rx_channel as rx
from flydog_sdr_gps_tpu.runtime import StreamEngine, SyntheticSource
from flydog_sdr_gps_tpu.server import KiwiServer
from flydog_sdr_gps_tpu.utils import dx as dx_mod

PORT = 18078


def make_server(**policy):
    params = rx.RxParams(num_channels=2, audio_block=128)
    src = SyntheticSource(tones=((14.201e6, 0.5),), noise_rms=0.001)
    eng = StreamEngine(params, src)
    srv = KiwiServer(eng, port=PORT, realtime=False)
    srv.policy_period = 0.2
    for k, v in policy.items():
        setattr(srv, k, v)
    return srv


async def ws_connect(session, stream, ts="111"):
    return await session.ws_connect(
        f"http://127.0.0.1:{PORT}/{ts}/{stream}")


async def drain_until_closed(ws, timeout=6.0):
    """Pump the socket until the server closes it (returns True)."""
    try:
        async def pump():
            async for _ in ws:
                pass
        await asyncio.wait_for(pump(), timeout)
        return True
    except asyncio.TimeoutError:
        return False


def test_keepalive_kick():
    async def scenario():
        server = make_server(keepalive_sec=1)
        runner = await server.start()
        try:
            async with aiohttp.ClientSession() as session:
                ws = await ws_connect(session, "SND")
                await ws.send_str("SET auth t=kiwi p=")
                # send nothing further: keepalive expires -> kicked
                closed = await drain_until_closed(ws)
                assert closed, "server did not kick silent connection"
                assert server.kicks >= 1
        finally:
            await server.stop()
            await runner.cleanup()
    asyncio.run(scenario())


def test_inactivity_kick_and_exemption():
    async def scenario():
        server = make_server(inactivity_min=1.0 / 60)   # 1 second
        server.cfg = None
        runner = await server.start()
        try:
            async with aiohttp.ClientSession() as session:
                ws = await ws_connect(session, "SND")
                await ws.send_str("SET auth t=kiwi p=")

                async def keepalives():
                    # keepalives alone must NOT count as activity
                    for _ in range(30):
                        if ws.closed:
                            return
                        await ws.send_str("SET keepalive")
                        await asyncio.sleep(0.1)
                ka = asyncio.create_task(keepalives())
                closed = await drain_until_closed(ws)
                ka.cancel()
                assert closed, "inactivity timeout did not kick"

                # a password-authed conn is exempt
                server.cfg = type("C", (), {
                    "string": lambda self, k, d="": (
                        "sesame" if k == "user_password" else d),
                    "int": lambda self, k, d=0: d})()
                ws2 = await ws_connect(session, "SND", ts="222")
                await ws2.send_str("SET auth t=kiwi p=sesame")
                await asyncio.sleep(1.6)
                assert not ws2.closed
                await ws2.close()
        finally:
            await server.stop()
            await runner.cleanup()
    asyncio.run(scenario())


def test_per_ip_channel_limit():
    async def scenario():
        server = make_server(max_conns_per_ip=1)
        runner = await server.start()
        try:
            async with aiohttp.ClientSession() as session:
                ws1 = await ws_connect(session, "SND", ts="aaa")
                await ws1.send_str("SET auth t=kiwi p=")
                await asyncio.sleep(0.1)
                ws2 = await ws_connect(session, "SND", ts="bbb")
                m = await asyncio.wait_for(ws2.receive(), 5)
                assert m.type == aiohttp.WSMsgType.BINARY
                assert b"too_busy=1" in m.data
                await ws1.close()
        finally:
            await server.stop()
            await runner.cleanup()
    asyncio.run(scenario())


def test_dx_marker_query_and_update():
    async def scenario():
        server = make_server()
        server.dx.upsert(dx_mod.DxLabel(7038.6, "usb", "WSPR", "beacon"))
        server.dx.upsert(dx_mod.DxLabel(14070.0, "usb", "PSK31"))
        server.dx.upsert(dx_mod.DxLabel(25000.0, "am", "out-of-span"))
        runner = await server.start()
        try:
            async with aiohttp.ClientSession() as session:
                ws = await ws_connect(session, "W/F")
                await ws.send_str("SET auth t=kiwi p=")
                # span query
                await ws.send_str(
                    "SET MARKER db=0 min=7000.0 max=15000.0 zoom=4 "
                    "width=1024")
                mkr = None
                for _ in range(20):
                    m = await asyncio.wait_for(ws.receive(), 5)
                    if m.type != aiohttp.WSMsgType.BINARY:
                        continue
                    if m.data.startswith(b"MSG mkr="):
                        mkr = json.loads(m.data[8:].decode())
                        break
                assert mkr is not None
                idents = [r.get("i") for r in mkr[1:]]
                assert idents == ["WSPR", "PSK31"]
                gid_wspr = mkr[1]["g"]

                # edit: move WSPR, then delete it
                async def wait_ack():
                    for _ in range(20):
                        m = await asyncio.wait_for(ws.receive(), 5)
                        if m.type == aiohttp.WSMsgType.BINARY and \
                                b"request_dx_update" in m.data:
                            return True
                    return False

                await ws.send_str(
                    f"SET DX_UPD g={gid_wspr} f=7040.1 lo=0 hi=0 o=0 "
                    "fl=2 i=WSPR2 n=")
                assert await wait_ack()
                assert any(abs(l.freq_khz - 7040.1) < 1e-6
                           for l in server.dx.labels)
                gid = next(g for g, l in
                           server.dx.in_range_gid(7040, 7041))
                await ws.send_str(f"SET DX_UPD g={gid} f=-1")
                assert await wait_ack()
                assert not server.dx.in_range_gid(7040, 7041)
        finally:
            await server.stop()
            await runner.cleanup()
    asyncio.run(scenario())


def test_geoloc_and_prefs():
    async def scenario():
        server = make_server()
        runner = await server.start()
        try:
            async with aiohttp.ClientSession() as session:
                ws = await ws_connect(session, "SND")
                await ws.send_str("SET auth t=kiwi p=")
                await ws.send_str("SET geoloc=Lisbon%2C%20Portugal")
                await ws.send_str(
                    'SET pref_export id=cafe pref={"volume":7}')
                await asyncio.sleep(0.2)
                conn = list(server.conns.values())[0]
                assert conn.geo == "Lisbon, Portugal"
                assert server.prefs["cafe"] == '{"volume":7}'
                # /users shows geo
                async with session.get(
                        f"http://127.0.0.1:{PORT}/users") as r:
                    users = json.loads(await r.text())
                assert users[0]["g"] == "Lisbon, Portugal"
                # import round-trip
                await ws.send_str("SET pref_import id=cafe")
                got = None
                for _ in range(20):
                    m = await asyncio.wait_for(ws.receive(), 5)
                    if m.type == aiohttp.WSMsgType.BINARY and \
                            b"pref_import=" in m.data:
                        got = m.data
                        break
                assert got is not None and b'{"volume":7}' in got
        finally:
            await server.stop()
            await runner.cleanup()
    asyncio.run(scenario())
