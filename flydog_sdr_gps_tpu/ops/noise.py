"""Noise blanking and noise reduction, channel-vectorized.

Reference processors (`rx/rx_sound.cpp:910-948` dispatch):

- NB_STD: CuteSDR ``CNoiseProc`` impulse blanker
  (`rx/CuteSDR/noiseproc.cpp:1-267`) — magnitude vs moving-average
  ratio test, blanks a widened window around impulses.
- NB_WILD: Teensy-ConvolutionSDR blanker (`rx/Teensy/NB_Wild.cpp`) —
  same idea, different detector; covered by NB_STD params here.
- NR_SPECTRAL: spectral-subtraction NR (`rx/Teensy/NR_spectral.cpp`) —
  FFT / noise-floor estimate / Wiener-ish gain / IFFT.
- NR_WDSP (ANR/EMNR) and NR_ORIG: LMS adaptive filters
  (`rx/wdsp/ANR.cpp`, `rx/kiwi/lms.cpp`) — denoise + autonotch.

TPU formulation: the blanker and spectral NR are pure vectorized block
ops (masks, batched FFTs).  LMS is sequential by nature; it runs as a
`lax.scan` over samples with the weight vectors as carry, vectorized
across channels (each step is (C, taps) VPU math).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from . import cplx as cplx_ops
from . import fft as fft_ops
from .cplx import Cplx


# ---------------------------------------------------------------------------
# impulse noise blanker (NB_STD)
# ---------------------------------------------------------------------------

def noise_blanker(x: Cplx, mavg: jax.Array,
                  gate_mult: float = 4.0, width: int = 7,
                  alpha: float = 0.02) -> tuple[Cplx, jax.Array]:
    """Blank impulses exceeding ``gate_mult`` x the running mean magnitude.

    x: (N, C) complex64 (pre-demod IQ — the reference taps the raw IQ
    before the passband filter, `rx/rx_sound.cpp:577-578`).
    mavg: (C,) float32 carried magnitude average.
    The blank window is widened by ``width`` samples either side via a
    boolean dilation (reference widens by its delay-line length).
    Returns (y, new_mavg).
    """
    mag = x.abs()
    block_mean = jnp.mean(mag, axis=0)
    new_mavg = (1.0 - alpha) * mavg + alpha * block_mean
    thresh = jnp.maximum(new_mavg, 1e-9) * gate_mult
    hit = mag > thresh[None, :]
    # dilate the hit mask +-width samples (separable max filter)
    pad = jnp.zeros((width, hit.shape[1]), bool)
    h = jnp.concatenate([pad, hit, pad], axis=0)
    dil = hit
    for k in range(1, width + 1):
        dil = dil | h[width - k:width - k + hit.shape[0]]
        dil = dil | h[width + k:width + k + hit.shape[0]]
    y = Cplx(jnp.where(dil, 0.0, x.re), jnp.where(dil, 0.0, x.im))
    return y, new_mavg


# ---------------------------------------------------------------------------
# spectral-subtraction noise reduction (NR_SPECTRAL)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True, eq=False)
class SpectralNRParams:
    fft_size: int = 256
    hop: int = 128                 # 50% overlap, Hann analysis window
    smooth_alpha: float = 0.3      # psd pre-smoothing (frames)
    min_window: int = 8            # blocks of windowed-minimum tracking
    floor_bias: float = 2.2        # min-of-smoothed-psd -> mean bias
    over_subtract: float = 1.4
    gain_floor: float = 0.1
    gain_rule: str = "subtract"    # "subtract" | "mmse" (wdsp EMNR's
    dd_alpha: float = 0.96         #  MMSE-LSA w/ decision-directed SNR)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SpectralNRState:
    in_tail: jax.Array            # (hop, C) input overlap
    out_tail: jax.Array           # (hop, C) overlap-add carry
    psd_smooth: jax.Array         # (fft/2+1, C) EMA-smoothed psd
    min_ring: jax.Array           # (min_window, fft/2+1, C) block minima
    xhat2: jax.Array              # (fft/2+1, C) prev clean-psd (MMSE)


def init_spectral_nr(params: SpectralNRParams, num_channels: int,
                     dtype=jnp.float32) -> SpectralNRState:
    hb = params.fft_size // 2 + 1
    return SpectralNRState(
        in_tail=jnp.zeros((params.hop, num_channels), dtype),
        out_tail=jnp.zeros((params.hop, num_channels), dtype),
        psd_smooth=jnp.full((hb, num_channels), 1e3, jnp.float32),
        min_ring=jnp.full((params.min_window, hb, num_channels), 1e3,
                          jnp.float32),
        xhat2=jnp.zeros((hb, num_channels), jnp.float32),
    )


def _expint_e1(v: jax.Array) -> jax.Array:
    """Exponential integral E1(v), Abramowitz-Stegun 5.1.53/5.1.56."""
    small = (-jnp.log(jnp.maximum(v, 1e-12)) - 0.57721566
             + v * (0.99999193
                    + v * (-0.24991055
                           + v * (0.05519968
                                  + v * (-0.00976004
                                         + v * 0.00107857)))))
    num = v * (v + 2.334733) + 0.250621
    den = v * (v + 3.330657) + 1.681534
    big = jnp.exp(-v) / jnp.maximum(v, 1e-12) * num / den
    return jnp.where(v <= 1.0, small, big)


def spectral_nr_block(params: SpectralNRParams, x: jax.Array,
                      state: SpectralNRState
                      ) -> tuple[jax.Array, SpectralNRState]:
    """Spectral subtraction over one block of real audio (N, C).

    N must be a multiple of ``hop``.  Output is delayed by one hop
    (overlap-add latency), matching the reference's processing delay.
    """
    n, c = x.shape
    hop, fft = params.hop, params.fft_size
    assert n % hop == 0 and fft == 2 * hop
    xin = jnp.concatenate([state.in_tail, x], axis=0)
    nfr = n // hop
    # frames (nfr, fft, C), 50% overlap
    frames = jnp.stack([xin[i * hop:i * hop + fft] for i in range(nfr)])
    win = jnp.asarray(np.hanning(fft + 1)[:fft].astype(np.float32))
    # matmul-FFT transforms the last axis -> go channel-major
    fr = (frames * win[None, :, None]).transpose(0, 2, 1)   # (nfr, C, fft)
    spec = fft_ops.fft(Cplx(fr, jnp.zeros_like(fr)))        # (nfr, C, fft)
    spec = spec.transpose(0, 2, 1)                          # (nfr, fft, C)
    spec = spec[:, :fft // 2 + 1]                           # one-sided
    psd = spec.abs2()
    # minimum statistics (Martin-style): smooth the psd over frames,
    # then track the minimum over a sliding window of block minima;
    # a steady noise floor survives the minimum, speech/CW bursts do
    # not (as long as the window spans a signal pause).
    def smooth(carry, p):
        sm = carry + params.smooth_alpha * (p - carry)
        return sm, sm
    psd_smooth, sm_seq = lax.scan(smooth, state.psd_smooth, psd)
    block_min = jnp.min(sm_seq, axis=0)
    min_ring = jnp.concatenate([state.min_ring[1:], block_min[None]],
                               axis=0)
    est_noise = params.floor_bias * jnp.min(min_ring, axis=0)
    if params.gain_rule == "mmse":
        # Ephraim-Malah MMSE-LSA with decision-directed a-priori SNR
        # (the wdsp EMNR gain rule, `rx/wdsp/ANR.cpp` family)
        lam = jnp.maximum(est_noise[None], 1e-12)
        gamma = jnp.maximum(psd / lam, 1e-6)         # a-posteriori SNR
        a = jnp.float32(params.dd_alpha)

        def gain_frame(prev_xhat2, fr):
            gam, lam_f = fr
            xi = (a * prev_xhat2 / lam_f[0]
                  + (1 - a) * jnp.maximum(gam - 1.0, 0.0))
            xi = jnp.maximum(xi, 1e-6)
            v = jnp.clip(gam * xi / (1.0 + xi), 1e-6, 50.0)
            G = xi / (1.0 + xi) * jnp.exp(0.5 * _expint_e1(v))
            G = jnp.clip(G, params.gain_floor, 1.0)
            xhat2 = (G ** 2) * gam * lam_f[0]
            return xhat2, G
        xhat2, g = lax.scan(
            gain_frame, state.xhat2,
            (gamma, jnp.broadcast_to(lam, (nfr,) + lam.shape[1:])[:,
                                     None]))
    else:
        gain = jnp.maximum(
            1.0 - params.over_subtract * est_noise[None] /
            jnp.maximum(sm_seq, 1e-12),
            params.gain_floor ** 2)
        g = jnp.sqrt(gain)
        xhat2 = state.xhat2
    shaped = Cplx(spec.re * g, spec.im * g)                 # (nfr, hb, C)
    # rebuild the full (conjugate-symmetric) spectrum and inverse-FFT
    mid = shaped[:, 1:fft // 2]
    full = cplx_ops.concatenate(
        [shaped, Cplx(mid.re[:, ::-1], -mid.im[:, ::-1])], axis=1)
    out_c = fft_ops.ifft(full.transpose(0, 2, 1))           # (nfr, C, fft)
    out_frames = out_c.re.transpose(0, 2, 1)                # (nfr, fft, C)
    out_frames = out_frames * win[None, :, None]
    # overlap-add (Hann^2 with 50% overlap sums to 1.5; normalize)
    y = jnp.zeros((n + hop, c), x.dtype)
    for i in range(nfr):
        y = y.at[i * hop:i * hop + fft].add(out_frames[i])
    y = y / 1.5
    out = y[:n].at[:hop].add(state.out_tail)
    new_state = SpectralNRState(
        in_tail=xin[-hop:],
        out_tail=y[n:],
        psd_smooth=psd_smooth,
        min_ring=min_ring,
        xhat2=xhat2,
    )
    return out.astype(x.dtype), new_state


# ---------------------------------------------------------------------------
# LMS denoiser / autonotch (NR_ORIG semantics, `rx/kiwi/lms.cpp`)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True, eq=False)
class LmsParams:
    taps: int = 64
    delay: int = 16
    mu: float = 0.01               # adaptation rate (normalized)
    decay: float = 0.9999          # leakage
    notch: bool = False            # False: denoise (output = prediction)
                                   # True: autonotch (output = error)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class LmsState:
    weights: jax.Array             # (taps, C)
    line: jax.Array                # (taps + delay, C) delay line


def init_lms(params: LmsParams, num_channels: int) -> LmsState:
    return LmsState(
        weights=jnp.zeros((params.taps, num_channels), jnp.float32),
        line=jnp.zeros((params.taps + params.delay, num_channels),
                       jnp.float32),
    )


def lms_block(params: LmsParams, x: jax.Array, state: LmsState
              ) -> tuple[jax.Array, LmsState]:
    """Adaptive line enhancer over (N, C) real audio.

    The predictor estimates x[n] from samples older than ``delay``;
    periodic (tonal/voice-correlated) content is predictable, noise is
    not.  Denoise mode outputs the prediction; notch mode outputs the
    prediction error (removing carriers/heterodynes) — exactly the two
    modes of `rx/kiwi/lms.cpp:30-123`.
    """
    mu = jnp.float32(params.mu)
    decay = jnp.float32(params.decay)

    def step(carry, xn):
        w, line = carry
        ref = line[:params.taps]                   # delayed reference
        pred = jnp.sum(w * ref, axis=0)
        err = xn - pred
        norm = jnp.sum(ref * ref, axis=0) + 1e-3
        w = decay * w + (mu / norm) * err[None, :] * ref
        line = jnp.concatenate([line[1:], xn[None, :]], axis=0)
        out = pred if not params.notch else err
        return (w, line), out

    (w, line), y = lax.scan(step, (state.weights, state.line), x)
    return y.astype(x.dtype), LmsState(weights=w, line=line)


def lms_chain_block(notch_p: LmsParams, den_p: LmsParams,
                    x: jax.Array, st_notch: LmsState, st_den: LmsState,
                    en_notch: jax.Array, en_den: jax.Array
                    ) -> tuple[jax.Array, LmsState, LmsState]:
    """Autonotch -> denoiser chain in ONE scan, per-channel gated.

    The reference orders them "so denoiser can cleanup residual noise
    from autonotch" (`rx/rx_sound.cpp:933-943`); both NR_WDSP's ANR
    and NR_ORIG's lms.cpp are this structure with different constants.
    en_notch/en_den: (C,) bool enables; disabled stages pass through
    and stop adapting.
    """
    mu_n, dc_n = jnp.float32(notch_p.mu), jnp.float32(notch_p.decay)
    mu_d, dc_d = jnp.float32(den_p.mu), jnp.float32(den_p.decay)

    def stage(w, line, xn, mu, decay, en, notch):
        ref = line[: w.shape[0]]
        pred = jnp.sum(w * ref, axis=0)
        err = xn - pred
        norm = jnp.sum(ref * ref, axis=0) + 1e-3
        w2 = decay * w + (mu / norm) * err[None, :] * ref
        w = jnp.where(en[None, :], w2, w)
        line = jnp.concatenate([line[1:], xn[None, :]], axis=0)
        out = err if notch else pred
        return w, line, jnp.where(en, out, xn)

    def step(carry, xn):
        wn, ln, wd, ld = carry
        wn, ln, y1 = stage(wn, ln, xn, mu_n, dc_n, en_notch, True)
        wd, ld, y2 = stage(wd, ld, y1, mu_d, dc_d, en_den, False)
        return (wn, ln, wd, ld), y2

    (wn, ln, wd, ld), y = lax.scan(
        step, (st_notch.weights, st_notch.line,
               st_den.weights, st_den.line), x)
    return (y.astype(x.dtype), LmsState(weights=wn, line=ln),
            LmsState(weights=wd, line=ld))


# ---------------------------------------------------------------------------
# NB_WILD — interpolating impulse blanker (`rx/Teensy/NB_Wild.cpp`)
# ---------------------------------------------------------------------------

def noise_blanker_wild(x: Cplx, mavg: jax.Array,
                       gate_mult: float = 4.0, width: int = 7,
                       alpha: float = 0.02) -> tuple[Cplx, jax.Array]:
    """Impulse blanker that INTERPOLATES across the blanked span
    instead of zeroing it (the Teensy-ConvolutionSDR "wild" blanker) —
    zeroing leaves an audible hole, bridging doesn't.

    Fully vectorized: for every sample, the index of the previous and
    next good sample is found with running max/reversed running max,
    then the gap is filled by linear interpolation between them.
    Shapes as :func:`noise_blanker`.
    """
    mag = x.abs()
    block_mean = jnp.mean(mag, axis=0)
    new_mavg = (1.0 - alpha) * mavg + alpha * block_mean
    thresh = jnp.maximum(new_mavg, 1e-9) * gate_mult
    hit = mag > thresh[None, :]
    pad = jnp.zeros((width, hit.shape[1]), bool)
    h = jnp.concatenate([pad, hit, pad], axis=0)
    dil = hit
    for k in range(1, width + 1):
        dil = dil | h[width - k:width - k + hit.shape[0]]
        dil = dil | h[width + k:width + k + hit.shape[0]]
    n = x.re.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)[:, None]
    good = ~dil
    # previous good index (or 0), next good index (or n-1)
    prev_i = lax.cummax(jnp.where(good, idx, -1), axis=0)
    next_i = -lax.cummax(jnp.where(good, -idx, -(n + 1))[::-1],
                         axis=0)[::-1]
    prev_i = jnp.clip(prev_i, 0, n - 1)
    next_i = jnp.clip(next_i, 0, n - 1)
    span = jnp.maximum(next_i - prev_i, 1).astype(jnp.float32)
    frac = (idx - prev_i).astype(jnp.float32) / span

    def bridge(v):
        vp = jnp.take_along_axis(v, prev_i, axis=0)
        vn = jnp.take_along_axis(v, next_i, axis=0)
        fill = vp + (vn - vp) * frac
        return jnp.where(dil, fill, v)

    return Cplx(bridge(x.re), bridge(x.im)), new_mavg
