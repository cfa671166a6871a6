"""Galileo E1B support: acquisition hooks, I/NAV FEC, page framing.

Reference: E1B memory codes downloaded to the FPGA (`CmdSetE1Bcode`,
`gps/e1bcode.h` data), acquisition shares the C/A search with a
4092-chip/4 ms code period, and I/NAV decoding goes through
GNSS-SDRLIB (`gps/GNSS-SDRLIB/sdrnav_gal.cpp`) with the ka9q K=7
r=1/2 Viterbi decoder (`gps/ka9q-fec/viterbi27_port.cpp`).

This module provides:
- code-FFT construction for externally loaded E1B codes
  (`cacode.load_e1b_codes` — ICD data, not bundled);
- a full K=7 r=1/2 Viterbi decoder (standard CCSDS polynomials
  171/133 octal, as used by Galileo I/NAV);
- I/NAV page-part deinterleaving (8x30 block interleaver) and sync.
"""

from __future__ import annotations

import numpy as np

from ...numerology import E1B_CODELEN
from . import acquisition

# CCSDS / Galileo I/NAV convolutional code (K=7, r=1/2).  Note: the
# Galileo SIS transmits the G2 branch inverted; receivers handling
# real signals negate the second soft value per pair before decode.
G1_OCT = 0o171
G2_OCT = 0o133
K = 7
INAV_SYNC = np.array([0, 1, 0, 1, 1, 0, 0, 0, 0, 0], np.uint8)


def e1b_code_fft(params: acquisition.AcqParams, code: np.ndarray
                 ) -> np.ndarray:
    """Conjugated spectrum of a 4092-chip E1B code sampled at fs.

    E1B's 4 ms primary code period matches the 4 ms acquisition window
    (16384 samples at 4.092 Msps = 1 sample/chip x 4), so the same
    conj-multiply search machinery applies; the BOC(1,1) subcarrier is
    approximated by its dominant correlation peak, as the reference's
    search does before handing to tracking.
    """
    # 4.092 Msps over 4 ms -> 16368 samples for 4092 chips (4/chip)
    chips = np.floor(np.arange(params.fft_len)
                     * (E1B_CODELEN / 16368.0)).astype(np.int64)
    sampled = np.asarray(code, np.float32)[
        np.clip(chips, 0, E1B_CODELEN - 1)]
    # BOC(1,1): one subcarrier half-cycle per half chip
    boc = np.where((np.arange(params.fft_len) * 2
                    * E1B_CODELEN // 16368) % 2 == 0, 1.0, -1.0)
    return np.conj(np.fft.fft(sampled * boc)).astype(np.complex64)


# ---------------------------------------------------------------------------
# Viterbi K=7 r=1/2
# ---------------------------------------------------------------------------

def conv_encode_k7(bits: np.ndarray) -> np.ndarray:
    """Encode with G1/G2 (MSB-first shift register), 2 bits/input."""
    g1 = int(G1_OCT)
    g2 = int(G2_OCT)
    state = 0
    out = np.zeros(2 * len(bits), np.uint8)
    for i, b in enumerate(bits):
        state = ((state << 1) | int(b)) & 0x7F
        out[2 * i] = bin(state & g1).count("1") & 1
        out[2 * i + 1] = bin(state & g2).count("1") & 1
    return out


def viterbi_decode_k7(soft: np.ndarray, tail: bool = True) -> np.ndarray:
    """Soft-decision Viterbi for the K=7 code.

    soft: (2n,) values, positive = coded bit 1.  Returns n decoded
    bits (including the K-1 tail if ``tail``).
    """
    soft = np.asarray(soft, np.float64)
    n = len(soft) // 2
    nstates = 64
    # branch tables: for state s and input b, next state and outputs
    nxt = np.zeros((nstates, 2), np.int64)
    outs = np.zeros((nstates, 2, 2), np.int8)
    for s in range(nstates):
        for b in (0, 1):
            reg = ((s << 1) | b) & 0x7F
            nxt[s, b] = reg & 0x3F
            outs[s, b, 0] = bin(reg & int(G1_OCT)).count("1") & 1
            outs[s, b, 1] = bin(reg & int(G2_OCT)).count("1") & 1
    metric = np.full(nstates, -1e18)
    metric[0] = 0.0
    back = np.zeros((n, nstates), np.int8)
    prev_state = np.zeros((n, nstates), np.int64)
    for t in range(n):
        s0, s1 = soft[2 * t], soft[2 * t + 1]
        new = np.full(nstates, -1e18)
        nb = np.zeros(nstates, np.int8)
        ps = np.zeros(nstates, np.int64)
        for s in range(nstates):
            if metric[s] <= -1e17:
                continue
            for b in (0, 1):
                ns = nxt[s, b]
                bm = ((s0 if outs[s, b, 0] else -s0)
                      + (s1 if outs[s, b, 1] else -s1))
                m = metric[s] + bm
                if m > new[ns]:
                    new[ns] = m
                    nb[ns] = b
                    ps[ns] = s
        metric = new
        back[t] = nb
        prev_state[t] = ps
    # traceback from state 0 when tail-terminated, else best state
    s = 0 if tail else int(np.argmax(metric))
    bits = np.zeros(n, np.uint8)
    for t in range(n - 1, -1, -1):
        bits[t] = back[t, s]
        s = int(prev_state[t, s])
    return bits


# ---------------------------------------------------------------------------
# I/NAV page structure
# ---------------------------------------------------------------------------

def inav_deinterleave(symbols240: np.ndarray) -> np.ndarray:
    """8x30 block deinterleaver (written by columns, read by rows)."""
    return np.asarray(symbols240).reshape(30, 8).T.reshape(-1)


def inav_interleave(symbols240: np.ndarray) -> np.ndarray:
    return np.asarray(symbols240).reshape(8, 30).T.reshape(-1)
