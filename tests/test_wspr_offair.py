"""Off-air WSPR decode: the one decoder test whose input this repo did
NOT synthesize.

The fixture `tests/data/wspr_offair_375.npz` is the real recorded
40 m WSPR capture the reference ships in `tools/wspr.wav.h` (45000 IQ
samples at 375 Hz centered on 7040100 Hz = dial 7038600 + 1500 Hz,
consumed by `tools/wspr.cpp:1-60`).  It contains an off-air
transmission from ZL3DMH (Christchurch, NZ — grid RE66, 37 dBm = 5 W)
plus overlapping weaker signals that corrupt the tail symbols.

Decoding a capture we did not generate retires the loopback-blindness
risk for the decoder methodology: it already caught one real bug (the
convolutional polynomials were the NASA-standard pair instead of
WSPR's Layland-Lushbaugh pair — both directions of the loopback test
agreed and passed while no real signal could ever decode).
"""

import os

import numpy as np
import pytest

from flydog_sdr_gps_tpu.extensions import wspr, wspr_decode

DATA = os.path.join(os.path.dirname(__file__), "data",
                    "wspr_offair_375.npz")
TRUTH = ("ZL3DMH", "RE66", 37)


def _load():
    d = np.load(DATA)
    return d["iq"].astype(np.complex128)


def test_offair_decode_from_375_baseband():
    """Package pipeline from the 375 Hz baseband: coarse spectrogram
    candidates -> fine (freq/time/drift) refinement -> stack decode."""
    z = _load()
    nsym = len(z) // wspr.SPS
    segs = z[: nsym * wspr.SPS].reshape(nsym, wspr.SPS)
    power = np.abs(np.fft.fftshift(np.fft.fft(segs, axis=1),
                                   axes=1)).astype(np.float32) ** 2
    cands = wspr.sync_correlate(power, max_dt_sym=nsym - wspr.NSYM)
    assert cands, "no coarse candidates in the off-air capture"
    spots = []
    for c in cands[:5]:
        r = wspr.refine_candidate(z, c)
        if r is None:
            continue
        msg = wspr_decode.decode_soft_symbols(r["soft"])
        if msg is not None:
            spots.append((msg, r))
    decoded = {(m.callsign, m.grid, m.dbm) for m, _ in spots}
    assert TRUTH in decoded, spots
    # and the spot's refined frequency sits where the signal is:
    # ~35 Hz above the 1500 Hz sub-band center
    r = next(r for m, r in spots
             if (m.callsign, m.grid, m.dbm) == TRUTH)
    assert abs(r["freq"] - 1535.5) < 2.0, r["freq"]
    assert r["sync"] > 0.5, r["sync"]


def test_offair_decode_through_extension():
    """Full-chain: upsample the capture to 12 kHz real audio and push
    it through the WSPR extension (mix, decimate x32, spectrogram,
    sync, refine, sequential decode) — the exact serving path."""
    from tests.test_extensions import FakeEngine, make_taps
    from flydog_sdr_gps_tpu import extensions as ext

    z = _load()
    # upsample 375 -> 12000 (x32): zero-stuff + lowpass, then mix up
    # to the 1500 Hz sub-band center and take the real part
    up = np.zeros(len(z) * wspr.DECIM, np.complex128)
    up[:: wspr.DECIM] = z * wspr.DECIM
    from flydog_sdr_gps_tpu.ops import filters
    h = filters.kaiser_lowpass(wspr.FS_AUDIO, 150.0, 220.0, 70.0,
                               numtaps=512)
    up = np.convolve(up, h, mode="same")
    t = np.arange(len(up)) / wspr.FS_AUDIO
    audio = np.real(up * np.exp(2j * np.pi * wspr.DIAL_OFFSET * t))
    audio = (audio / (np.abs(audio).max() + 1e-12)).astype(np.float32)

    e = ext.ext_create("wspr", FakeEngine(), 0)
    e.start()
    e.capture_samples = len(audio) // 512 * 512   # use the full 120 s
    msgs = []
    for i in range(0, e.capture_samples, 512):
        msgs += e.process_block(make_taps(audio[i:i + 512]))
    spots = e.decode_candidates()
    assert any(s["callsign"] == TRUTH[0] and s["grid"] == TRUTH[1]
               and s["dbm"] == TRUTH[2] for s in spots), spots
