"""FT4: whitening, tone layout, and the full RF round trip."""

import numpy as np

from flydog_sdr_gps_tpu.extensions import ft4 as f4
from flydog_sdr_gps_tpu.extensions import ft8_decode as fd

FS = 12000.0


def test_ft4_tone_layout():
    payload = np.zeros(77, np.uint8)
    tones = f4.encode_tones(payload)
    assert tones.shape == (105,)
    # ramp symbols
    assert tones[0] == 0 and tones[104] == 0
    # the four Costas groups at their table positions
    for g, p in enumerate(f4.SYNC_POS):
        np.testing.assert_array_equal(tones[p:p + 4], f4.COSTAS4[g])
    # whitening: the all-zero payload must NOT produce all-zero data
    # tones (that is the point of the XOR sequence)
    data = tones[list(f4.DATA_POS)]
    assert np.count_nonzero(data) > 20


def test_ft4_llr_round_trip():
    msg = fd.Ft8Message("W9XYZ", "K1ABC", "R-07")
    payload = fd.pack_payload(msg)
    tones = f4.encode_tones(payload)
    # clean tone powers
    p = np.zeros((87, 4))
    for k, i in enumerate(f4.DATA_POS):
        p[k, tones[i]] = 1.0
    p += 0.01
    got = f4.decode_llrs(f4.tone_powers_to_llrs(p))
    assert got is not None
    assert (got.call_to, got.call_de, got.extra) == \
        ("W9XYZ", "K1ABC", "R-07")


def test_end_to_end_ft4_spot():
    """CQ K1ABC FN42 -> 4-FSK audio -> front end -> LDPC -> decoded."""
    msg = fd.Ft8Message("CQ", "K1ABC", "FN42")
    payload = fd.pack_payload(msg)
    tones = f4.encode_tones(payload)

    base = 1500.0
    n = int(f4.Ft4Ext.CAPTURE_S * FS)
    rng = np.random.default_rng(4)
    sig = np.zeros(n)
    phase = 0.0
    for i, tone in enumerate(tones):
        a, b = i * f4.SPS, min((i + 1) * f4.SPS, n)
        if a >= n:
            break
        f = base + tone * f4.BAUD
        t = np.arange(b - a)
        sig[a:b] = np.sin(phase + 2 * np.pi * f * t / FS)
        phase = (phase + 2 * np.pi * f * (b - a) / FS) % (2 * np.pi)
    sig = (0.3 * sig + 0.2 * rng.standard_normal(n)).astype(np.float32)

    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_extensions import make_taps, FakeEngine
    from flydog_sdr_gps_tpu import extensions as ext
    e = ext.ext_create("FT4", FakeEngine(), 0)
    e.start()
    msgs = []
    for i in range(0, n, 512):
        blk = np.zeros(512, np.float32)
        chunk = sig[i:i + 512]
        blk[:len(chunk)] = chunk
        msgs += e.process_block(make_taps(blk))
        if msgs:
            break
    decodes = [m for m in msgs if m[0] == "ft4_decode"]
    assert decodes, [m[1][:60] for m in msgs]
    text = decodes[0][1].decode()
    assert text.startswith("CQ K1ABC FN42"), text
