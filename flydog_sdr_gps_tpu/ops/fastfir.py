"""Overlap-save fast-convolution passband filter (batched over channels).

Reference: CuteSDR's ``CFastFIR`` (`rx/CuteSDR/fastfir.h:19-23`,
`fastfir.cpp:241`): 1024-point FFT, 513-tap complex bandpass built from
a Kaiser lowpass heterodyned to the passband center, overlap-save with
a 512-sample hop.  Every audio channel runs one of these (the user's
"passband"), so on TPU it becomes one batched matmul-FFT over the
channel axis (`ops/fft.py` — the axon backend has no FFT primitive or
complex dtype; signals are split re/im pairs, `ops/cplx.py`).

Latency/group-delay bookkeeping matches the reference: the bandpass is
linear-phase with (ntaps-1)/2 delay (`rx/rx_sound.cpp:604-651` tracks
this for GPS timestamping).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from . import cplx as cplx_ops
from . import fft as fft_ops
from .cplx import Cplx
from .filters import complex_bandpass

FFT_SIZE = 1024          # CONV_FFT_SIZE  (rx/CuteSDR/cuteSDR.h:12)
NTAPS = 513              # CONV_FIR_SIZE  (rx/CuteSDR/cuteSDR.h:14)
HOP = FFT_SIZE - (NTAPS - 1)   # = 512 samples of valid output per transform


@dataclasses.dataclass(frozen=True, eq=False)
class FastFIRPlan:
    fft_size: int = FFT_SIZE
    ntaps: int = NTAPS

    @property
    def hop(self) -> int:
        return self.fft_size - (self.ntaps - 1)

    @property
    def group_delay(self) -> int:
        return (self.ntaps - 1) // 2


def plan_for_block(audio_block: int) -> FastFIRPlan:
    """Overlap-save geometry for a given hop (= audio block) size.

    CuteSDR's fixed 1024/513 geometry is the audio_block=512 case; for
    other block sizes the FFT stays a power of two >= 2*hop and the tap
    budget absorbs the rest (ntaps = fft - hop + 1).
    """
    fft = 1024
    while fft < 2 * audio_block:
        fft *= 2
    return FastFIRPlan(fft_size=fft, ntaps=fft - audio_block + 1)


def passband_freq_coef(fs: float, f_lo: float, f_hi: float,
                       atten_db: float = 70.0,
                       plan: FastFIRPlan = FastFIRPlan()) -> np.ndarray:
    """Frequency-domain coefficients H (fft_size,) complex64 (host side).

    Same construction as CuteSDR `SetupParameters` (`fastfir.cpp:79-150`):
    complex Kaiser bandpass, zero-padded, FFT'd once at setup.
    """
    h = complex_bandpass(fs, f_lo, f_hi, atten_db, plan.ntaps)
    buf = np.zeros(plan.fft_size, np.complex128)
    buf[:plan.ntaps] = h
    return np.fft.fft(buf).astype(np.complex64)


def init_state(plan: FastFIRPlan, num_channels: int) -> Cplx:
    """Overlap carry: the last (ntaps-1) input samples per channel."""
    return cplx_ops.zeros((plan.ntaps - 1, num_channels))


def fastfir_block(plan: FastFIRPlan, x: Cplx, tail: Cplx,
                  coef: Cplx) -> tuple[Cplx, Cplx]:
    """Filter one hop of audio for all channels.

    x:    (hop, C) new input samples (split complex).
    tail: (ntaps-1, C) carry from previous block.
    coef: (fft_size, C) per-channel frequency response.

    Returns (y (hop, C), new_tail).

    Implementation detail: the matmul-FFT transforms along the LAST
    axis, so we flip to channel-major (C, fft) for the transform pair —
    two small transposes around MXU-heavy work.
    """
    buf = cplx_ops.concatenate([tail, x], axis=0)      # (fft_size, C)
    spec = fft_ops.fft(buf.T)                          # (C, fft_size)
    y = fft_ops.ifft(spec * coef.T)                    # (C, fft_size)
    yt = y.T                                           # (fft_size, C)
    new_tail = buf[plan.hop:]
    return yt[plan.ntaps - 1:], new_tail


def fastfir_block2(plan: FastFIRPlan, x: Cplx, tail: Cplx,
                   coef_a: Cplx, coef_b: Cplx
                   ) -> tuple[Cplx, Cplx, Cplx]:
    """Like :func:`fastfir_block` but applies TWO coefficient sets to
    the same input, sharing the forward FFT (1 FFT + 2 IFFTs).

    Used for sideband separation of the SAM-locked baseband (SAL/SAU/
    SAS): coef_a = lower-sideband mask, coef_b = upper-sideband mask
    (the reference does this with a +-45 deg allpass Hilbert pair,
    `rx/wdsp/SAM_demod.cpp:85-105`; an overlap-save one-sided filter is
    the frequency-domain equivalent with better rejection).

    coef_a/coef_b: (fft_size,) or (fft_size, C).
    Returns (y_a (hop, C), y_b (hop, C), new_tail).
    """
    buf = cplx_ops.concatenate([tail, x], axis=0)      # (fft_size, C)
    spec = fft_ops.fft(buf.T)                          # (C, fft_size)
    ca = coef_a if coef_a.re.ndim == 1 else coef_a.T
    cb = coef_b if coef_b.re.ndim == 1 else coef_b.T
    ya = fft_ops.ifft(spec * ca).T                     # (fft_size, C)
    yb = fft_ops.ifft(spec * cb).T
    new_tail = buf[plan.hop:]
    return ya[plan.ntaps - 1:], yb[plan.ntaps - 1:], new_tail
