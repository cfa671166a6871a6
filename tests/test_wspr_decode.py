"""WSPR full-chain decode: message -> RF -> front end -> decoded spot."""

import numpy as np
import pytest

from flydog_sdr_gps_tpu.extensions import wspr as w
from flydog_sdr_gps_tpu.extensions import wspr_decode as wd

FS = 12000.0


def test_pack_unpack_round_trip():
    for call, grid, dbm in [("K1ABC", "FN42", 37), ("W3XYZ", "EM79", 10),
                            ("G4AAA", "IO91", 23), ("VK2DEF", "QF56", 0)]:
        msg = wd.WsprMessage(call, grid, dbm)
        bits = wd.pack_message(msg)
        back = wd.unpack_message(bits)
        assert back is not None
        assert back.callsign == call and back.grid == grid
        assert back.dbm == dbm


def test_conv_code_and_interleave_consistency():
    rng = np.random.default_rng(0)
    bits = np.concatenate([rng.integers(0, 2, 50).astype(np.uint8),
                           np.zeros(31, np.uint8)])
    coded = wd.conv_encode(bits)
    # perfect LLRs decode exactly
    soft = (2.0 * coded - 1.0) * 4.0
    got = wd.stack_decode(soft)
    assert got is not None
    np.testing.assert_array_equal(got, bits[:50])


def test_decoder_tolerates_noise():
    rng = np.random.default_rng(1)
    bits = np.concatenate([rng.integers(0, 2, 50).astype(np.uint8),
                           np.zeros(31, np.uint8)])
    coded = wd.conv_encode(bits).astype(np.float64)
    soft = (2 * coded - 1) * 2.0 + rng.standard_normal(162) * 1.0
    got = wd.stack_decode(soft)
    assert got is not None
    np.testing.assert_array_equal(got, bits[:50])


def test_end_to_end_wspr_spot():
    """Encode a real WSPR message, modulate 4-FSK at 12 kHz, run the
    TPU front end + sequential decoder, recover the spot."""
    msg = wd.WsprMessage("K1ABC", "FN42", 37)
    tones = wd.encode_to_tones(msg)
    assert tones.shape == (162,) and tones.max() <= 3

    f0 = w.DIAL_OFFSET + (-33) * w.TONE_SPACING
    n = int(w.CAPTURE_S * FS)
    sps_audio = int(w.SPS * w.DECIM)
    rng = np.random.default_rng(2)
    sig = np.zeros(n)
    phase = 0.0
    for i, tone in enumerate(tones):
        a, b = i * sps_audio, min((i + 1) * sps_audio, n)
        if a >= n:
            break
        f = f0 + tone * w.TONE_SPACING
        t = np.arange(b - a)
        sig[a:b] = np.sin(phase + 2 * np.pi * f * t / FS)
        phase = (phase + 2 * np.pi * f * (b - a) / FS) % (2 * np.pi)
    sig = (0.25 * sig + 0.25 * rng.standard_normal(n)).astype(np.float32)

    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_extensions import make_taps, FakeEngine
    from flydog_sdr_gps_tpu import extensions as ext
    e = ext.ext_create("wspr", FakeEngine(), 0)
    e.start()
    msgs = []
    for i in range(0, n, 512):
        blk = np.zeros(512, np.float32)
        chunk = sig[i:i + 512]
        blk[:len(chunk)] = chunk
        msgs += e.process_block(make_taps(blk))
        if msgs:
            break
    decodes = [m for m in msgs if m[0] == "wspr_decode"]
    assert decodes, [m[1] for m in msgs]
    text = decodes[0][1].decode()
    assert text.startswith("K1ABC FN42 37"), text
