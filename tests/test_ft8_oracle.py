"""FT8/FT4 cross-implementation vectors (r3 verdict item 5).

The reference's vendored `ft8_lib` (an independent implementation)
is compiled as a local encode oracle (`tools/ft8_oracle.py`).  Two
levels of check:

1. Tone-sequence equality: the repo's own encode chain (payload
   packing + CRC-14 + LDPC(174,91) + Gray mapping + Costas / FT4
   whitening+ramps) must produce EXACTLY the oracle's channel
   symbols.  A mirror bug anywhere in the chain (the class of bug
   the WSPR off-air capture caught) breaks this.
2. Audio decode: FSK audio synthesized from ORACLE tones (symbols
   the repo never produced) must decode through the repo's full
   front end (spectrogram, Costas sync, LLRs, BP-LDPC, unpack).
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))), "tools"))
import ft8_oracle  # noqa: E402

from flydog_sdr_gps_tpu.extensions import ft4 as f4  # noqa: E402
from flydog_sdr_gps_tpu.extensions import ft8_decode as fd  # noqa: E402

_have_oracle = ft8_oracle.build() is not None
pytestmark = pytest.mark.skipif(not _have_oracle,
                                reason="no compiler for ft8_lib oracle")

FS = 12000.0

MSGS = [("CQ", "K1ABC", "FN42", "CQ K1ABC FN42"),
        ("W9XYZ", "K1ABC", "R-07", "W9XYZ K1ABC R-07"),
        ("K1ABC", "W9XYZ", "RR73", "K1ABC W9XYZ RR73")]


def _repo_ft8_tones(msg: fd.Ft8Message) -> np.ndarray:
    payload = fd.pack_payload(msg)
    cw = fd.ldpc_encode(fd.add_crc(payload))
    return fd.codeword_to_tones(cw)


@pytest.mark.parametrize("to,de,extra,text", MSGS)
def test_ft8_tones_match_oracle(to, de, extra, text):
    want = ft8_oracle.tones("ft8", text)
    assert want is not None and len(want) == 79
    got = _repo_ft8_tones(fd.Ft8Message(to, de, extra))
    assert got.tolist() == want


@pytest.mark.parametrize("to,de,extra,text", MSGS)
def test_ft4_tones_match_oracle(to, de, extra, text):
    want = ft8_oracle.tones("ft4", text)
    assert want is not None and len(want) == 105
    got = f4.encode_tones(fd.pack_payload(fd.Ft8Message(to, de, extra)))
    assert got.tolist() == want


def _fsk(tones, sps, baud, base, n, seed):
    rng = np.random.default_rng(seed)
    sig = np.zeros(n)
    phase = 0.0
    for i, tone in enumerate(tones):
        a, b = i * sps, min((i + 1) * sps, n)
        if a >= n:
            break
        f = base + tone * baud
        t = np.arange(b - a)
        sig[a:b] = np.sin(phase + 2 * np.pi * f * t / FS)
        phase = (phase + 2 * np.pi * f * (b - a) / FS) % (2 * np.pi)
    return (0.3 * sig + 0.15 * rng.standard_normal(n)).astype(np.float32)


def _run_ext(name, sig):
    sys.path.insert(0, os.path.dirname(__file__))
    from test_extensions import make_taps, FakeEngine
    from flydog_sdr_gps_tpu import extensions as ext
    e = ext.ext_create(name, FakeEngine(), 0)
    e.start()
    msgs = []
    for i in range(0, len(sig), 512):
        blk = np.zeros(512, np.float32)
        chunk = sig[i:i + 512]
        blk[:len(chunk)] = chunk
        msgs += e.process_block(make_taps(blk))
        if msgs:
            break
    return msgs


def test_ft8_decodes_oracle_audio():
    from flydog_sdr_gps_tpu.extensions import ft8 as f8
    tones = ft8_oracle.tones("ft8", "CQ K1ABC FN42")
    n = int(f8.Ft8Ext.CAPTURE_S * FS)
    sig = _fsk(tones, f8.SPS, f8.BAUD, 1000.0, n, seed=11)
    msgs = _run_ext("FT8", sig)
    dec = [m[1].decode() for m in msgs if m[0] == "ft8_decode"]
    assert any(t.startswith("CQ K1ABC FN42") for t in dec), msgs[:4]


def test_ft4_decodes_oracle_audio():
    tones = ft8_oracle.tones("ft4", "W9XYZ K1ABC R-07")
    n = int(f4.Ft4Ext.CAPTURE_S * FS)
    sig = _fsk(tones, f4.SPS, f4.BAUD, 1500.0, n, seed=12)
    msgs = _run_ext("FT4", sig)
    dec = [m[1].decode() for m in msgs if m[0] == "ft4_decode"]
    assert any(t.startswith("W9XYZ K1ABC R-07") for t in dec), msgs[:4]
