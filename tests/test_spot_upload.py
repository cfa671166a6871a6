"""Spot-upload wire formats, parsed structurally (no network).

Reference behaviors: the wsprnet.org query
(`extensions/wspr/wspr_main.cpp:524-528`) and PSKReporter's
IPFIX-style UDP packet (`extensions/FT8/PSKReporter.cpp`: v10
header, sender template 0x1140 / receiver option-template 0x1138
under enterprise 30351, length-prefixed strings, 4-byte set
padding).
"""

import struct
import time
from urllib.parse import parse_qs, urlparse

from flydog_sdr_gps_tpu.extensions import spot_upload as su


def test_wsprnet_url_fields():
    when = time.struct_time((2026, 8, 21, 4, 32, 0, 0, 0, 0))
    url = su.wsprnet_url("TP0U", "JN47", 7.0386, when, -17.0, 0.3, 1,
                         7.040102, "K1ABC", "FN42", "+37")
    q = {k: v[0] for k, v in parse_qs(urlparse(url).query).items()}
    assert q["function"] == "wspr" and q["rcall"] == "TP0U"
    assert q["date"] == "260821" and q["time"] == "0432"
    assert q["sig"] == "-17" and q["drift"] == "1"
    assert q["tqrg"] == "7.040102" and q["tcall"] == "K1ABC"
    assert q["tgrid"] == "FN42" and q["dbm"] == "+37"


def _walk_sets(pkt: bytes):
    """Parse the IPFIX framing: header then (set_id, body) tuples."""
    ver, total, t, seq, uid = struct.unpack(">HHIII", pkt[:16])
    assert ver == 10 and total == len(pkt)
    off = 16
    sets = []
    while off < len(pkt):
        sid, slen = struct.unpack(">HH", pkt[off:off + 4])
        assert slen >= 4 and slen % 4 == 0
        sets.append((sid, pkt[off + 4:off + slen]))
        off += slen
    assert off == len(pkt)
    return seq, uid, sets


def _pstr_at(b: bytes, off: int):
    n = b[off]
    return b[off + 1:off + 1 + n].decode(), off + 1 + n


def test_pskreporter_datagram_structure():
    rep = su.PskReporter("TP0U", "JN47")
    spot = dict(call="K1ABC", grid="FN42", freq_hz=14075234,
                snr_db=-7, mode="FT8", time=1787000000)
    pkt = rep.datagram([spot], now=1787000100)
    seq, uid, sets = _walk_sets(pkt)
    assert seq == 0
    ids = [sid for sid, _ in sets]
    # first packet: tx template (2), rx option template (3), rx
    # record (0x1138), one spot record (0x1140)
    assert ids == [2, 3, 0x1138, 0x1140]

    # tx template: id 0x1140, 7 fields, enterprise on all but
    # flowStartSeconds(150)
    tmpl = sets[0][1]
    tid, nf = struct.unpack(">HH", tmpl[:4])
    assert tid == 0x1140 and nf == 7
    el0, ln0, ent0 = struct.unpack(">HHI", tmpl[4:12])
    assert el0 == 0x8001 and ln0 == 0xFFFF and ent0 == 30351
    el6, ln6 = struct.unpack(">HH", tmpl[4 + 6 * 8:4 + 6 * 8 + 4])
    assert el6 == 150 and ln6 == 4

    # rx record strings
    rx = sets[2][1]
    call, off = _pstr_at(rx, 0)
    grid, off = _pstr_at(rx, off)
    client, off = _pstr_at(rx, off)
    assert (call, grid) == ("TP0U", "JN47")
    assert client.startswith("flydog")

    # spot record fields round-trip
    tx = sets[3][1]
    call, off = _pstr_at(tx, 0)
    freq, = struct.unpack(">I", tx[off:off + 4])
    snr, = struct.unpack(">b", tx[off + 4:off + 5])
    mode, off2 = _pstr_at(tx, off + 5)
    grid, off2 = _pstr_at(tx, off2)
    isrc = tx[off2]
    t, = struct.unpack(">I", tx[off2 + 1:off2 + 5])
    assert call == "K1ABC" and freq == 14075234 and snr == -7
    assert mode == "FT8" and grid == "FN42" and isrc == 1
    assert t == 1787000000

    # descriptors stop after 3 packets; seq advances
    rep.datagram([spot])
    rep.datagram([spot])
    pkt4 = rep.datagram([spot])
    seq, uid, sets = _walk_sets(pkt4)
    assert seq == 3
    assert [sid for sid, _ in sets] == [0x1138, 0x1140]


def test_spot_uploader_routing():
    sent_urls, sent_udp = [], []
    up = su.SpotUploader("TP0U", "JN47",
                         http_send=sent_urls.append,
                         udp_send=lambda pkt, addr: sent_udp.append(
                             (pkt, addr)))
    up(dict(ext="WSPR", dial_khz=7038.6, t=1787000000.0,
            text="K1ABC FN42 +37 -17dB 0.3s"))
    assert len(sent_urls) == 1 and "tcall=K1ABC" in sent_urls[0]
    up(dict(ext="FT8", dial_khz=14074.0, t=1787000000.0,
            text="CQ K1ABC FN42 1230.0"))
    assert len(sent_udp) == 1
    pkt, addr = sent_udp[0]
    assert addr == (su.PSKREPORTER_HOST, su.PSKREPORTER_PORT)
    _, _, sets = _walk_sets(pkt)
    assert sets[-1][0] == 0x1140
    call, _ = _pstr_at(sets[-1][1], 0)
    assert call == "K1ABC"
    assert up.sent == 2
