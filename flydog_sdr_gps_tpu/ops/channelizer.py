"""Multi-channel digital down-converter (DDC) as a TPU filter-bank matmul.

Reference behavior being reproduced (`verilog/rx/rx.v:44-168`): per
channel, a 48-bit NCO + IQ mixer at the 125 MHz ADC rate, followed by
CIC1(R=1736, 3-stage) -> CIC2(R=3, 5-stage) -> compensation FIR (R=2),
producing 12 kHz complex baseband (`verilog/kiwi.gen.vh` RX_DECIM_*).

TPU-native design
-----------------
The mix + first decimation for channel ``c`` is

    y_c[k] = sum_n h[n] * x[k*D + n] * exp(-j*w_c*(k*D + n))
           = exp(-j*w_c*D*k) * sum_n (h[n]*exp(-j*w_c*n)) * x[k*D + n]

so a *frequency-shifted prototype filter* per channel turns the whole
front end into ONE dense matmul: frame the real ADC stream into
overlapping windows ``X[k, :] = x[k*D : k*D+L]`` (L = m*D taps) and
multiply by the bank matrix ``B[n, c] = 2*h[n]*exp(-j*w_c*n)`` —
`(K, L) @ (L, 2C)` lands exactly on the MXU, computing mixer + filter +
decimator for every channel simultaneously.  The residual per-output
phase ramp ``exp(-j*w_c*D*k)`` is applied exactly via the 48-bit limb
NCO (`ops/nco.py`), preserving the reference's 0.44 uHz tuning
resolution and zero long-term phase drift.

A second polyphase-FIR stage (shared taps, channels vectorized on the
VPU) completes the decimation: 10416 = 336 * 31 (12 kHz family) or
6172 = 1543 * 4 (20.25 kHz family).  Compared with the reference's CIC
chain this has a flat passband (no sinc droop, no +4.5 dB comp-FIR
fudge, `rx/data_pump.cpp:73`) and >= 90 dB alias rejection.

Streaming: infinite-length input is processed in blocks; the carries
(filter tails + NCO phases) form a pytree threaded through
jit-compiled block steps (see `DDCState`).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp

from . import nco
from .cplx import Cplx
from . import cplx as cplx_ops
from .filters import design_decimation_stages
from ..numerology import (ADC_CLOCK_NOM, AUDIO_BLOCK, DECIM_PLAN_12K,
                          DECIM_PLAN_20K, PHASE_BITS, SND_RATE_12K)


# ---------------------------------------------------------------------------
# plan
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True, eq=False)  # eq=False: id-hash for jit
class DDCPlan:
    """Static description of a two-stage DDC chain (shapes, taps)."""
    adc_clock: float
    decims: tuple[int, int]
    h1: np.ndarray                    # (L1,) float64, stage-1 prototype
    h2: np.ndarray                    # (L2,) float64, stage-2 lowpass
    audio_block: int                  # output samples per block (K2)

    @property
    def d1(self) -> int: return self.decims[0]

    @property
    def d2(self) -> int: return self.decims[1]

    @property
    def l1(self) -> int: return len(self.h1)

    @property
    def l2(self) -> int: return len(self.h2)

    @property
    def m1(self) -> int: return self.l1 // self.d1

    @property
    def m2(self) -> int: return self.l2 // self.d2

    @property
    def total_decim(self) -> int: return self.d1 * self.d2

    @property
    def fs1(self) -> float: return self.adc_clock / self.d1

    @property
    def fs_out(self) -> float: return self.adc_clock / self.total_decim

    @property
    def k1(self) -> int:              # stage-1 outputs per block
        return self.audio_block * self.d2

    @property
    def adc_block(self) -> int:       # ADC samples consumed per block
        return self.k1 * self.d1

    @property
    def tail1(self) -> int:           # stage-1 input carry, samples
        return self.l1 - self.d1

    @property
    def tail2(self) -> int:           # stage-2 input carry, stage-1 samples
        return self.l2 - self.d2


def make_ddc_plan(adc_clock: float = ADC_CLOCK_NOM,
                  snd_rate: int = SND_RATE_12K,
                  audio_block: int = AUDIO_BLOCK,
                  atten_db: float = 90.0,
                  f_protect: float | None = None) -> DDCPlan:
    """Build the decimation plan for one audio-rate family.

    ``f_protect`` defaults to 0.38 * fs_out (4.56 kHz at 12 kHz rate):
    fully alias-protected at ``atten_db``; the 4.56-6 kHz edge region
    passes with graceful droop, mirroring the reference CIC chain's
    behavior near its band edge.
    """
    decims = DECIM_PLAN_12K if snd_rate == SND_RATE_12K else DECIM_PLAN_20K
    fs_out = adc_clock / (decims[0] * decims[1])
    if f_protect is None:
        f_protect = 0.38 * fs_out
    h1, h2 = design_decimation_stages(adc_clock, decims, f_protect,
                                      atten_db=atten_db)
    return DDCPlan(adc_clock=adc_clock, decims=tuple(decims),
                   h1=h1, h2=h2, audio_block=audio_block)


# ---------------------------------------------------------------------------
# host-side filter-bank construction (exact, float64/int)
# ---------------------------------------------------------------------------

def build_filterbank(plan: DDCPlan, fcws: Sequence[int]
                     ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Bank matrix + rotator increments for a set of 48-bit tuning words.

    Returns ``(bank_r, bank_i, dphi1_limbs)``:
    - ``bank_r/bank_i``: float32 (L1, C) real/imag of
      ``B[n, c] = 2 * h1[n] * exp(-j*2*pi*(n*fcw_c / 2**48))``
      (factor 2: real->analytic, so a full-scale real cosine at the
      tuned frequency yields a unit-amplitude complex baseband tone).
    - ``dphi1_limbs``: int32 (C, 3) limb increment ``fcw*D1 mod 2**48``
      for the per-output-sample phase rotator.
    """
    h1 = np.asarray(plan.h1, np.float64)
    n = np.arange(plan.l1, dtype=object)
    cols_r, cols_i = [], []
    for fcw in fcws:
        fcw = int(fcw) % (1 << PHASE_BITS)
        ph = ((n * fcw) % (1 << PHASE_BITS)).astype(np.float64)
        ang = -2.0 * np.pi * ph * (2.0 ** -PHASE_BITS)
        cols_r.append(2.0 * h1 * np.cos(ang))
        cols_i.append(2.0 * h1 * np.sin(ang))
    bank_r = np.stack(cols_r, axis=-1).astype(np.float32)
    bank_i = np.stack(cols_i, axis=-1).astype(np.float32)
    dphi = nco.to_limbs([(int(f) * plan.d1) % (1 << PHASE_BITS)
                         for f in fcws])
    return bank_r, bank_i, dphi


def build_filterbank_column(plan: DDCPlan, fcw: int
                            ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Single-channel retune: one bank column + rotator increment.

    The control plane updates only the retuned channel's column
    (reference analogue: `CmdSetRXFreq`, `rx/rx_sound_cmd.cpp:80-90`).
    """
    br, bi, dp = build_filterbank(plan, [fcw])
    return br[:, 0], bi[:, 0], dp[0]


# ---------------------------------------------------------------------------
# streaming state
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DDCState:
    """Per-block carries for the streaming DDC (a jit-able pytree).

    This is the TPU analogue of the reference's persistent filter state:
    CIC integrator/comb registers (`verilog/rx/cic_integrator.v`) and the
    NCO phase accumulator — here: raw-sample tail, per-channel stage-1
    output tail, and exact 48-bit phase carries.  All complex data is
    split-real/imag (`ops.cplx`) — the TPU backend has no complex dtype.
    """
    x_tail: jax.Array                 # (tail1,) float32
    y_tail: Cplx                      # (tail2, C) split complex
    phi1: jax.Array                   # (C, 3) int32 rotator phase carry


def init_ddc_state(plan: DDCPlan, num_channels: int) -> DDCState:
    return DDCState(
        x_tail=jnp.zeros((plan.tail1,), jnp.float32),
        y_tail=cplx_ops.zeros((plan.tail2, num_channels)),
        phi1=jnp.zeros((num_channels, 3), jnp.int32),
    )


# ---------------------------------------------------------------------------
# device-side kernels
# ---------------------------------------------------------------------------

def frame(x: jax.Array, d: int, m: int) -> jax.Array:
    """Overlapping frames ``F[k, :] = x[k*d : k*d + m*d]`` without gather.

    ``x`` has length ``(K + m - 1) * d``; returns (K, m*d).  Built from
    ``m`` static slices of the (K+m-1, d) reshape — XLA fuses these into
    cheap strided reads feeding the matmul.
    """
    r = x.reshape(-1, d)
    k = r.shape[0] - (m - 1)
    return jnp.concatenate([r[i:i + k] for i in range(m)], axis=-1)


def stage1_matmul(plan: DDCPlan, x_ext: jax.Array,
                  bank_r: jax.Array, bank_i: jax.Array,
                  precision=jax.lax.Precision.HIGHEST) -> Cplx:
    """The stage-1 filter-bank matmul WITHOUT the NCO rotation.

    Used by the fused TPU path, where the rotation happens inside the
    stage-2 Pallas kernel (`pallas_kernels.stage2_rot_pallas`) as the
    data streams through VMEM — skipping a full HBM read+write of the
    (k1, C) baseband.
    """
    frames = frame(x_ext, plan.d1, plan.m1)            # (k1, L1)
    yr = jnp.dot(frames, bank_r, precision=precision)
    yi = jnp.dot(frames, bank_i, precision=precision)
    return Cplx(yr, yi)


def pack_bank(bank_r: jax.Array, bank_i: jax.Array,
              tc: int) -> jax.Array:
    """Permute bank columns into the tile-paired layout the fused
    stage-2 kernel consumes: [re tile 0 | im tile 0 | re tile 1 | ...]
    so the single (K, L1) x (L1, 2C) matmul writes both planes of each
    channel tile CONTIGUOUSLY (one DMA per kernel program)."""
    l1, c = bank_r.shape
    br = bank_r.reshape(l1, c // tc, tc)
    bi = bank_i.reshape(l1, c // tc, tc)
    return jnp.stack([br, bi], axis=2).reshape(l1, 2 * c)


def pack_cols(y: Cplx, tc: int) -> jax.Array:
    """(N, C) split complex -> (N, 2C) tile-paired packed layout."""
    n, c = y.re.shape
    return jnp.stack([y.re.reshape(n, c // tc, tc),
                      y.im.reshape(n, c // tc, tc)],
                     axis=2).reshape(n, 2 * c)


def unpack_cols(packed: jax.Array, tc: int) -> Cplx:
    """Inverse of :func:`pack_cols`."""
    n, c2 = packed.shape
    c = c2 // 2
    v = packed.reshape(n, c // tc, 2, tc)
    return Cplx(v[:, :, 0].reshape(n, c), v[:, :, 1].reshape(n, c))


def stage1_matmul_packed(plan: DDCPlan, x_ext: jax.Array,
                         bank_packed: jax.Array,
                         precision=jax.lax.Precision.HIGHEST
                         ) -> jax.Array:
    """Stage-1 matmul against a :func:`pack_bank` bank: one dot whose
    (k1, 2C) output IS the fused kernel's packed input layout."""
    frames = frame(x_ext, plan.d1, plan.m1)
    return jnp.dot(frames, bank_packed, precision=precision)


def stage1_apply(plan: DDCPlan, x_ext: jax.Array,
                 bank_r: jax.Array, bank_i: jax.Array,
                 phi1: jax.Array, dphi1: jax.Array,
                 precision=jax.lax.Precision.HIGHEST) -> Cplx:
    """Mix+filter+decimate all channels: the MXU matmul + exact rotator.

    x_ext: (k1*d1 + tail1,) float32 — block with carry prepended.
    Returns (k1, C) split-complex baseband at fs1.

    ``precision=HIGHEST`` keeps the f32 accumulate exact enough for the
    90 dB chain spec (DEFAULT bf16 matmul would cap SNR near 40 dB).
    """
    y = stage1_matmul(plan, x_ext, bank_r, bank_i, precision)
    yr, yi = y.re, y.im
    k1 = yr.shape[0]
    # Per-step channel rotation rot[k,c] = exp(-2pij*(phi_c + k*dphi_c)).
    # Materializing sin/cos over (k1, C) ~ 32M elements dominated the
    # whole stage; instead decompose k = a*T + b so the phase splits as
    # (phi + b*dphi) + a*(T*dphi) — two SMALL tables (exact limb math),
    # combined by one broadcast complex multiply per element.
    T = 128
    A = -(-k1 // T)
    phB = nco.phase_ramp(phi1, dphi1, T)               # (T, C)
    dphiT = nco.advance(jnp.zeros_like(dphi1), dphi1, T)
    phA = nco.phase_ramp(jnp.zeros_like(phi1), dphiT, A)   # (A, C)
    angB = (-2.0 * np.pi) * phB
    angA = (-2.0 * np.pi) * phA
    cB, sB = jnp.cos(angB), jnp.sin(angB)
    cA, sA = jnp.cos(angA), jnp.sin(angA)
    C = yr.shape[1]
    pad = A * T - k1
    if pad:
        yr = jnp.pad(yr, ((0, pad), (0, 0)))
        yi = jnp.pad(yi, ((0, pad), (0, 0)))
    yr = yr.reshape(A, T, C)
    yi = yi.reshape(A, T, C)
    # y * rotB  (broadcast over a)
    r1 = yr * cB - yi * sB
    i1 = yr * sB + yi * cB
    # * rotA  (broadcast over b)
    cA = cA[:, None, :]
    sA = sA[:, None, :]
    out_r = (r1 * cA - i1 * sA).reshape(A * T, C)
    out_i = (r1 * sA + i1 * cA).reshape(A * T, C)
    if pad:
        out_r = out_r[:k1]
        out_i = out_i[:k1]
    return Cplx(out_r, out_i)


def stage2_apply(plan: DDCPlan, y_ext: Cplx,
                 method: str = "auto") -> Cplx:
    """Shared-tap decimation over all channels.

    y_ext: (k1 + tail2, C) split complex.  Returns (k2, C) audio.

    Three equivalent implementations:
    - ``poly``: unrolled polyphase accumulate (XLA/VPU) — reads the
      input m2 (~24) times; fine for small C / CPU tests.
    - ``fft``: overlap-save correlation via the matmul-FFT — single
      read, but HIGHEST-precision transforms cost more than the
      bandwidth they save (kept for reference/験証).
    - ``pallas``: VMEM-resident tap reduction (ops/pallas_kernels) —
      input read exactly once.  DEFAULT on TPU: measured on a v5e
      (tools/kernel_bench.py, KERNELS.md) it beats the fused poly
      path 1.57x/1.76x/2.07x at C=1024/2048/4096 (30.9 vs 48.5 ms,
      38.9 vs 68.5 ms, 56.1 vs 116.3 ms end-to-end) and Mosaic
      compiles in ~4 s where XLA takes minutes at these shapes.
    """
    if method == "auto":
        from .pallas_kernels import stage2_pallas_supported
        if (jax.default_backend() == "tpu"
                and stage2_pallas_supported(
                    y_ext.shape[0], y_ext.shape[1],
                    plan.d2, plan.l2)):
            method = "pallas"
        else:
            method = "poly"
    if method == "pallas":
        from .pallas_kernels import stage2_pallas
        k2 = (y_ext.shape[0] - plan.tail2) // plan.d2
        return stage2_pallas(y_ext, plan.h2, plan.d2, k2)
    if method == "fft":
        return _stage2_fft(plan, y_ext)
    return _stage2_poly(plan, y_ext)


def _stage2_poly(plan: DDCPlan, y_ext: Cplx) -> Cplx:
    d2, m2 = plan.d2, plan.m2
    k2 = (y_ext.shape[0] - plan.tail2) // d2
    c = y_ext.shape[-1]
    h2p = jnp.asarray(plan.h2.reshape(m2, d2), jnp.float32)

    def decim(part):
        z = part.reshape(-1, d2, c)                    # (k2+m2-1, d2, C)
        acc = jnp.zeros((k2, c), jnp.float32)
        for i in range(m2):
            acc = acc + jnp.tensordot(z[i:i + k2], h2p[i],
                                      axes=[[1], [0]])
        return acc

    return Cplx(decim(y_ext.re), decim(y_ext.im))


@functools.lru_cache(maxsize=8)
def _stage2_h_fft(plan: DDCPlan, nfft: int):
    """conj(FFT(h2)) padded to nfft — correlation kernel (host)."""
    h = np.zeros(nfft, np.float64)
    h[:plan.l2] = plan.h2
    hf = np.conj(np.fft.fft(h))
    return (hf.real.astype(np.float32), hf.imag.astype(np.float32))


def _stage2_fft(plan: DDCPlan, y_ext: Cplx) -> Cplx:
    """out[k] = sum_l h2[l] * y_ext[k*d2 + l] via FFT correlation."""
    from . import fft as fft_ops
    kp, c = y_ext.shape
    k2 = (kp - plan.tail2) // plan.d2
    nfft = 1 << (kp - 1).bit_length()
    if nfft - plan.l2 < (k2 - 1) * plan.d2 + 1:
        nfft *= 2                      # ensure linear (not circular)
    hr, hi = _stage2_h_fft(plan, nfft)
    hf = Cplx(jnp.asarray(hr), jnp.asarray(hi))
    yt = y_ext.T                        # (C, kp)
    pad = nfft - kp
    yp = Cplx(jnp.pad(yt.re, ((0, 0), (0, pad))),
              jnp.pad(yt.im, ((0, 0), (0, pad))))
    spec = fft_ops.fft(yp)
    corr = fft_ops.ifft(spec * hf)      # (C, nfft) correlation
    out = corr[:, : k2 * plan.d2 : plan.d2]
    return out.T


@functools.partial(jax.jit, static_argnums=0)
def ddc_block(plan: DDCPlan, state: DDCState, x: jax.Array,
              bank_r: jax.Array, bank_i: jax.Array, dphi1: jax.Array
              ) -> tuple[DDCState, Cplx]:
    """Process one ADC block through the full DDC for all channels.

    x: (adc_block,) float32 (full scale = +-1.0).
    Returns (new_state, audio (audio_block, C) split complex at fs_out).
    """
    x_ext = jnp.concatenate([state.x_tail, x])
    y1 = stage1_apply(plan, x_ext, bank_r, bank_i, state.phi1, dphi1)
    y_ext = cplx_ops.concatenate([state.y_tail, y1], axis=0)
    audio = stage2_apply(plan, y_ext)
    new_state = DDCState(
        x_tail=x[-plan.tail1:],
        y_tail=y_ext[-plan.tail2:],
        phi1=nco.advance(state.phi1, dphi1, plan.k1),
    )
    return new_state, audio
