"""FT8 codec: LDPC, CRC, message pack/unpack, full RF round trip."""

import numpy as np
import pytest

from flydog_sdr_gps_tpu.extensions import ft8 as f8
from flydog_sdr_gps_tpu.extensions import ft8_decode as fd

FS = 12000.0


def test_ldpc_encode_valid():
    rng = np.random.default_rng(0)
    msg = rng.integers(0, 2, 91).astype(np.uint8)
    cw = fd.ldpc_encode(msg)
    assert cw.shape == (174,)
    assert fd.ldpc_check(cw) == 0
    # flipping any bit breaks at least one check
    bad = cw.copy()
    bad[100] ^= 1
    assert fd.ldpc_check(bad) > 0


def test_bp_decode_with_noise():
    rng = np.random.default_rng(1)
    msg = rng.integers(0, 2, 91).astype(np.uint8)
    cw = fd.ldpc_encode(msg)
    llr = (2.0 * cw - 1.0) * 2.0 + rng.standard_normal(174) * 0.9
    got = fd.bp_decode(llr)
    assert got is not None
    np.testing.assert_array_equal(got[:91], msg)


def test_crc_round_trip():
    rng = np.random.default_rng(2)
    payload = rng.integers(0, 2, 77).astype(np.uint8)
    msg91 = fd.add_crc(payload)
    assert fd.check_crc(msg91)
    bad = msg91.copy()
    bad[5] ^= 1
    assert not fd.check_crc(bad)


@pytest.mark.parametrize("to,de,extra", [
    ("CQ", "K1ABC", "FN42"),
    ("W9XYZ", "K1ABC", "R-15"),
    ("K1ABC", "W9XYZ", "RR73"),
    ("CQ", "VK2DEF", ""),
    ("QRZ", "G4AAA", "73"),
])
def test_payload_pack_unpack(to, de, extra):
    msg = fd.Ft8Message(to, de, extra)
    bits = fd.pack_payload(msg)
    assert bits is not None and bits.shape == (77,)
    back = fd.unpack_payload(bits)
    assert back is not None
    assert back.call_to == to and back.call_de == de
    assert back.extra == extra


def test_end_to_end_ft8_spot():
    """CQ K1ABC FN42 -> 8-FSK audio -> front end -> LDPC -> decoded."""
    msg = fd.Ft8Message("CQ", "K1ABC", "FN42")
    payload = fd.pack_payload(msg)
    cw = fd.ldpc_encode(fd.add_crc(payload))
    tones = fd.codeword_to_tones(cw)
    assert tones.shape == (79,)

    base = 1200.0
    n = int(f8.Ft8Ext.CAPTURE_S * FS)
    rng = np.random.default_rng(3)
    sig = np.zeros(n)
    phase = 0.0
    for i, tone in enumerate(tones):
        a, b = i * f8.SPS, min((i + 1) * f8.SPS, n)
        if a >= n:
            break
        f = base + tone * f8.BAUD
        t = np.arange(b - a)
        sig[a:b] = np.sin(phase + 2 * np.pi * f * t / FS)
        phase = (phase + 2 * np.pi * f * (b - a) / FS) % (2 * np.pi)
    sig = (0.3 * sig + 0.2 * rng.standard_normal(n)).astype(np.float32)

    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_extensions import make_taps, FakeEngine
    from flydog_sdr_gps_tpu import extensions as ext
    e = ext.ext_create("FT8", FakeEngine(), 0)
    e.start()
    msgs = []
    for i in range(0, n, 512):
        blk = np.zeros(512, np.float32)
        chunk = sig[i:i + 512]
        blk[:len(chunk)] = chunk
        msgs += e.process_block(make_taps(blk))
        if msgs:
            break
    decodes = [m for m in msgs if m[0] == "ft8_decode"]
    assert decodes, [m[1][:60] for m in msgs]
    text = decodes[0][1].decode()
    assert text.startswith("CQ K1ABC FN42"), text
