"""GPS L1 C/A PRN code generation (and the E1B code-loading hook).

Reference: `gps/cacode.h` — G1/G2 LFSR pair, G2 output tapped at two
stages selected per PRN (IS-GPS-200 table 3-Ia).  Codes are generated
host-side once (numpy) and shipped to the device as +-1 float tables;
the FPGA's bit-serial generator (`verilog/gps/cacode.v`) has no TPU
counterpart — table lookup wins on a machine with HBM.

Galileo E1B 4092-chip memory codes (`gps/e1bcode.h`) are *data* from
the Galileo OS SIS ICD; they load at runtime via :func:`load_e1b_codes`
from a hex file if present (not bundled).
"""

from __future__ import annotations

import functools

import numpy as np

from ...numerology import L1_CODELEN

# IS-GPS-200 G2 phase-select taps per PRN (1-based stages)
_G2_TAPS = {
    1: (2, 6), 2: (3, 7), 3: (4, 8), 4: (5, 9), 5: (1, 9), 6: (2, 10),
    7: (1, 8), 8: (2, 9), 9: (3, 10), 10: (2, 3), 11: (3, 4), 12: (5, 6),
    13: (6, 7), 14: (7, 8), 15: (8, 9), 16: (9, 10), 17: (1, 4),
    18: (2, 5), 19: (3, 6), 20: (4, 7), 21: (5, 8), 22: (6, 9),
    23: (1, 3), 24: (4, 6), 25: (5, 7), 26: (6, 8), 27: (7, 9),
    28: (8, 10), 29: (1, 6), 30: (2, 7), 31: (3, 8), 32: (4, 9),
}


@functools.lru_cache(maxsize=None)
def ca_code(prn: int) -> np.ndarray:
    """1023-chip C/A code for PRN 1..32 as int8 in {+1, -1}.

    (+1 = logical 0, -1 = logical 1, i.e. BPSK mapping.)
    """
    if prn not in _G2_TAPS:
        raise ValueError(f"PRN {prn} not supported (1..32)")
    t1, t2 = _G2_TAPS[prn]
    g1 = np.ones(10, np.int8)
    g2 = np.ones(10, np.int8)
    out = np.empty(L1_CODELEN, np.int8)
    for i in range(L1_CODELEN):
        chip = g1[9] ^ (g2[t1 - 1] ^ g2[t2 - 1])
        out[i] = 1 - 2 * chip
        fb1 = g1[2] ^ g1[9]
        fb2 = g2[1] ^ g2[2] ^ g2[5] ^ g2[7] ^ g2[8] ^ g2[9]
        g1[1:] = g1[:-1]; g1[0] = fb1
        g2[1:] = g2[:-1]; g2[0] = fb2
    return out


@functools.lru_cache(maxsize=None)
def ca_code_sampled(prn: int, fs: float, n: int,
                    chip_rate: float = 1.023e6,
                    code_phase_chips: float = 0.0) -> np.ndarray:
    """C/A code resampled to ``n`` samples at rate ``fs`` (float32 +-1).

    Sample k holds code[floor(phase + k*chip_rate/fs) mod 1023] — the
    same zero-order hold the FPGA code NCO performs
    (`verilog/gps/demod.v:72-107`).
    """
    code = ca_code(prn).astype(np.float32)
    idx = (code_phase_chips
           + np.arange(n, dtype=np.float64) * chip_rate / fs)
    return code[np.floor(idx).astype(np.int64) % L1_CODELEN]


def load_e1b_codes(path: str) -> dict[int, np.ndarray]:
    """Load Galileo E1B memory codes from a hex dump file.

    Format: one line per PRN: ``<prn> <1023-hex-digit string>`` (4092
    bits).  Returns {prn: int8 array of +-1}.  The codes are ICD data;
    ship your own copy (e.g. extracted from the Galileo OS SIS ICD
    annex) — they are not bundled with the framework.
    """
    out = {}
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) != 2:
                continue
            prn = int(parts[0])
            bits = bin(int(parts[1], 16))[2:].zfill(4092)
            out[prn] = np.asarray(
                [1 - 2 * int(b) for b in bits], np.int8)
    return out
