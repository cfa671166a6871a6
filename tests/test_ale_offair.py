"""ALE_2G external validation: off-air captures + the reference's
Golay table.

The reference ships real off-air ALE recordings
(`extensions/ALE_2G/standalone_test/*.au`, 8 kHz Sun audio) used to
test its own decoder — signals this repo had no hand in generating
(r4 verdict Missing #4: ALE was loopback-validated only).

Running them exposed THREE mirror bugs in the pre-oracle code, all
fixed in `extensions/ale_2g.py`:
- the Golay(24,12) used a generic B-matrix arrangement, not the
  MIL-STD cyclic form (g = 0xAE3, parity in bits 11..1, overall even
  parity in bit 0);
- the two Golay halves were transmitted back-to-back instead of
  BIT-INTERLEAVED a0,b0,a1,... (`decode_ff_impl.cpp:240-246`);
- the tone->tribit map missed the A.5.1.2 Gray coding
  (ascending tones carry 0,1,3,2,6,7,5,4).
"""

import re
import struct

import numpy as np
import pytest

from flydog_sdr_gps_tpu.extensions import ale_2g

AU_DIR = "/root/reference/extensions/ALE_2G/standalone_test"


def _read_au(path):
    with open(path, "rb") as f:
        hdr = f.read(24)
        _m, off, _sz, enc, rate, _ch = struct.unpack(">4sIIIII", hdr)
    assert enc == 3                       # 16-bit linear PCM
    with open(path, "rb") as f:
        f.seek(off)
        x = np.frombuffer(f.read(), ">i2").astype(np.float32) / 32768.0
    return x, rate


def _decode_file(name):
    x, fs = _read_au(f"{AU_DIR}/{name}")
    n12 = int(len(x) * 12000 / fs)
    t12 = np.arange(n12) * fs / 12000.0
    x12 = np.interp(t12, np.arange(len(x)), x).astype(np.float32)
    dec = ale_2g.AleDecoder(fs=12000.0)
    got = []
    for i in range(0, len(x12) - 1023, 1024):
        got.extend(dec.feed(x12[i:i + 1024]))
    return got


def test_golay_matches_reference_table():
    """The repo's polynomial-form Golay equals the reference
    decoder's 4096-entry encode table entry-for-entry (parsed from
    the read-only tree at test time; nothing copied)."""
    src = open("/root/reference/extensions/ALE_2G/decode_ff.h").read()
    m = re.search(r"encode_table\[4096\] = \{(.*?)\};", src, re.S)
    assert m is not None
    vals = [int(v, 16) for v in re.findall(r"0x[0-9A-Fa-f]+",
                                           m.group(1))]
    assert len(vals) == 4096
    for d in (0, 1, 2, 0x555, 0xABC, 0xFFF, 123, 2047, 3000):
        assert ale_2g.golay_encode(d) == ((d << 12) | vals[d]), d
    # full-table spot density
    rng = np.random.default_rng(1)
    for d in rng.integers(0, 4096, 200):
        assert ale_2g.golay_encode(int(d)) == ((int(d) << 12)
                                               | vals[int(d)])


def test_offair_uk_dhfcs():
    """Real UK DHFCS sounding: every decoded word is TWAS 'XSS'
    (Forest Moor's ALE address)."""
    got = _decode_file("ALE.2784.uk.au")
    assert len(got) >= 20
    assert all(p == "TWAS" and c == "XSS" for p, c, _e in got)


def test_offair_sigidwiki():
    """sigidwiki sample: an AMD message ride-through — TIS 'SHA' plus
    DATA/REP text words decode."""
    got = _decode_file("ALE.sigidwiki.au")
    words = {(p, c) for p, c, _e in got}
    assert len(got) >= 20
    assert ("TIS", "SHA") in words
    assert ("DATA", "ION") in words and ("REP", "ING") in words


def test_offair_amd_fox():
    """zkd AMD capture: 'THE QUICK BROWN FOX...' text fragments in
    DATA/REP words."""
    got = _decode_file("ALE.zkd.AMD.au")
    words = {(p, c) for p, c, _e in got}
    assert ("REP", "OWN") in words        # ...br-OWN...
    assert ("DATA", "UMP") in words       # ...j-UMP-s...
    assert ("REP", "AZY") in words        # ...l-AZY...
