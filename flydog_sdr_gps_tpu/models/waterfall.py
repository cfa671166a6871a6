"""Waterfall pipeline: zoomable wideband spectrum rows.

Reference (`rx/rx_waterfall.cpp:246-1651` + `verilog/rx/waterfall_1cic.v`):
per WF channel, a separate DDC with zoom-programmable decimation
R = 2^(z-1) (z0-z14), an 8192-sample IQ capture, then per frame:
window -> 8192-pt FFT -> |X|^2 -> dB -> map to 1024 pixels
(drop-sample or averaging/CMA maps, `:896-926`) -> u8 row (+ADPCM),
1-23 fps, with auto-aperture estimation (`aperture_auto() :1176-1270`).

TPU design
----------
Continuous streaming decimation (the reference's "overlapped sampling"
mode, generalized to every zoom): an exact-NCO mix + decimate-by-4
framing matmul brings 125 Msps down to 31.25 Msps complex, then
``zoom`` halfband decim-2 stages (flat passband — no CIC droop, so the
reference's software sinc^5 compensation table `:175-186` has no TPU
counterpart) feed a ring of the most recent WF_FFT samples.  A frame
request windows the ring, runs the matmul-FFT (`ops/fft.py`), and maps
bins to pixels with a precomputed (8192, 1024) averaging or
drop-sample matrix — one small matmul per row.

Chosen rate plan: rate(z) = adc_clock / 2^(z+2) (31.25 MHz at z0 for a
125 MHz clock), covering the 30 MHz UI span with a 4% guard band; the
pixel map scales bins to the exact displayed span, mirroring how the
reference displays ui_srate through its half-used FFT.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..numerology import (ADC_CLOCK_NOM, MAX_ZOOM, PHASE_BITS, UI_SRATE_30M,
                          WF_FFT, WF_OUT_PX)
from ..ops import cplx as cplx_ops
from ..ops import fft as fft_ops
from ..ops import filters
from ..ops import nco
from ..ops import windows
from ..ops.channelizer import frame
from ..ops.cplx import Cplx


@functools.lru_cache(maxsize=None)
def make_wf_params(zoom: int, adc_clock: float = ADC_CLOCK_NOM,
                   ui_srate: float = UI_SRATE_30M) -> "WfParams":
    """Shared per-zoom build (filters + pixel maps are identical for
    every connection at a zoom — build them once per process)."""
    return WfParams(zoom=zoom, adc_clock=adc_clock, ui_srate=ui_srate)


@functools.lru_cache(maxsize=None)
def jit_ingest(params: "WfParams"):
    """Process-wide compiled ingest per zoom: a connection changing
    zoom reuses the existing trace (the round-1 build recompiled per
    (connection, zoom) — the single heaviest avoidable cost)."""
    return jax.jit(lambda st, x, br, bi, dp:
                   wf_ingest(params, st, x, br, bi, dp))


@functools.lru_cache(maxsize=None)
def jit_frame(params: "WfParams", window_kind: str, mode: str):
    return jax.jit(lambda st, mask: wf_frame(params, st, window_kind,
                                             mode, mask=mask))


@dataclasses.dataclass(frozen=True, eq=False)
class WfParams:
    """Static build of one waterfall channel at a given zoom."""
    zoom: int
    adc_clock: float = ADC_CLOCK_NOM
    ui_srate: float = UI_SRATE_30M
    fft_size: int = WF_FFT
    out_px: int = WF_OUT_PX
    base_decim: int = 4            # stage-A decimation (125 -> 31.25 M)
    base_taps_mult: int = 8

    def __post_init__(self):
        if not 0 <= self.zoom <= MAX_ZOOM:
            raise ValueError(f"zoom {self.zoom} out of range")
        h = filters.kaiser_lowpass(
            self.adc_clock,
            0.40 * self.adc_clock / self.base_decim,
            0.50 * self.adc_clock / self.base_decim,
            80.0, numtaps=self.base_taps_mult * self.base_decim)
        object.__setattr__(self, "h_base", h)
        object.__setattr__(self, "h_half", filters.halfband(80.0))

    h_base: np.ndarray = dataclasses.field(init=False)
    h_half: np.ndarray = dataclasses.field(init=False)

    @property
    def total_decim(self) -> int:
        return self.base_decim << self.zoom

    @property
    def wf_rate(self) -> float:
        return self.adc_clock / self.total_decim

    @property
    def span(self) -> float:
        """Displayed span (Hz) — ui_srate / 2^zoom."""
        return self.ui_srate / (1 << self.zoom)

    def ingest_blocks(self, adc_block: int) -> int:
        """How many raw ADC blocks to accumulate per ingest call.

        Every halfband stage halves the sample count, so the ingest
        length must be divisible by 2^zoom * base_decim; deep zooms
        accumulate multiple blocks (the runtime stitches them) —
        the TPU analogue of the reference's continuous/overlapped
        sampling mode for slow frame fill (`rx_waterfall.cpp:980-1005`).
        """
        need = self.base_decim << self.zoom
        n = 1
        while (n * adc_block) % need:
            n += 1
        return n


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class WfState:
    """Streaming carries for one waterfall channel."""
    phi: jax.Array                # (3,) int32 NCO phase carry
    base_tail: jax.Array          # (taps-D,) float32 raw-sample tail
    hb_tails: Cplx                # (zoom, hb_tail) halfband tails
    ring: Cplx                    # (fft_size,) most recent WF samples


def _hb_padded_len(h: np.ndarray) -> int:
    return 2 * ((len(h) + 1) // 2)


def init_state(params: WfParams) -> WfState:
    hb_tail = _hb_padded_len(params.h_half) - 2
    return WfState(
        phi=jnp.zeros((3,), jnp.int32),
        base_tail=jnp.zeros((len(params.h_base) - params.base_decim,),
                            jnp.float32),
        hb_tails=cplx_ops.zeros((max(params.zoom, 1), hb_tail)),
        ring=cplx_ops.zeros((params.fft_size,)),
    )


def tune(params: WfParams, center_freq_hz: float
         ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Host-side: (bank_r, bank_i, dphi_limbs) for the stage-A mix.

    The mix bank bakes exp(-j*w*n) into the stage-A taps exactly like
    the audio channelizer (one column).
    """
    fcw = nco.freq_to_fcw(center_freq_hz, params.adc_clock)
    h = np.asarray(params.h_base, np.float64)
    n = np.arange(len(h), dtype=object)
    ph = ((n * fcw) % (1 << PHASE_BITS)).astype(np.float64)
    ang = -2.0 * np.pi * ph * (2.0 ** -PHASE_BITS)
    dphi = nco.to_limbs([(fcw * params.base_decim) % (1 << PHASE_BITS)])[0]
    return ((h * np.cos(ang)).astype(np.float32),
            (h * np.sin(ang)).astype(np.float32), dphi)


# ---------------------------------------------------------------------------
# streaming decimator
# ---------------------------------------------------------------------------

def _halfband_decim2(h: np.ndarray, x: Cplx, tail: Cplx
                     ) -> tuple[Cplx, Cplx]:
    """Decimate-by-2 with a halfband FIR; streaming tail.

    Taps are zero-padded to an even length Lp so the framing matmul
    tiles exactly: ext = tail(Lp-2) + x(N) -> (N/2, Lp) frames @ h.
    """
    lp = _hb_padded_len(h)
    hh = jnp.asarray(np.pad(np.asarray(h, np.float32),
                            (0, lp - len(h))), jnp.float32)
    t = lp - 2

    def run(part, ptail):
        ext = jnp.concatenate([ptail, part])
        fr = frame(ext, 2, lp // 2)
        return fr @ hh, ext[-t:]

    yr, tr = run(x.re, tail.re)
    yi, ti = run(x.im, tail.im)
    return Cplx(yr, yi), Cplx(tr, ti)


def wf_ingest(params: WfParams, state: WfState, x: jax.Array,
              bank_r: jax.Array, bank_i: jax.Array, dphi: jax.Array
              ) -> WfState:
    """Consume one raw ADC block, advance the WF stream + ring."""
    d = params.base_decim
    taps = len(params.h_base)
    m = taps // d
    x_ext = jnp.concatenate([state.base_tail, x])
    frames = frame(x_ext, d, m)                       # (k, taps)
    yr = frames @ bank_r
    yi = frames @ bank_i
    k = frames.shape[0]
    # exact per-output phase rotator (48-bit limbs), chunked to MAX_RAMP
    ph = nco.phase_ramp_long(state.phi, dphi, k)
    ang = (-2.0 * np.pi) * ph
    c, s = jnp.cos(ang), jnp.sin(ang)
    y = Cplx(yr * c - yi * s, yr * s + yi * c)

    hb_tails = []
    for z in range(params.zoom):
        y, t_new = _halfband_decim2(params.h_half, y, state.hb_tails[z])
        hb_tails.append(t_new)
    if params.zoom == 0:
        hb_tails.append(state.hb_tails[0])
    new_tails = cplx_ops.stack(hb_tails, axis=0)

    # roll the ring: keep the latest fft_size samples
    nfft = params.fft_size
    ns = y.shape[0]
    if ns >= nfft:
        ring = y[-nfft:]
    else:
        ring = cplx_ops.concatenate([state.ring[ns:], y], axis=0)
    return WfState(
        phi=nco.advance(state.phi, dphi, k),
        base_tail=x[-(taps - d):],
        hb_tails=new_tails,
        ring=ring,
    )


# ---------------------------------------------------------------------------
# frame computation
# ---------------------------------------------------------------------------

# Bin -> pixel reduction modes, matching the reference's interp
# selector (`rx/rx_waterfall.cpp:74` {max, min, last, drop, cma},
# "SET interp=", applied in its per-pixel plot loop `:896-926`).
WF_MODES = ("max", "min", "last", "drop", "cma")


@functools.lru_cache(maxsize=256)
def _pixel_segments(fft_size: int, out_px: int, frac: float
                    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Segment ids (fft_size,) mapping each (fftshifted) bin to its
    pixel (out_px = out-of-span sentinel), plus per-pixel 'drop'
    (center) and 'last' bin gather indices."""
    used = fft_size * frac
    b0 = (fft_size - used) / 2.0
    seg = np.full((fft_size,), out_px, np.int32)
    drop_idx = np.zeros((out_px,), np.int32)
    last_idx = np.zeros((out_px,), np.int32)
    for p in range(out_px):
        lo = b0 + used * p / out_px
        hi = b0 + used * (p + 1) / out_px
        ilo, ihi = int(np.ceil(lo - 1e-9)), int(np.ceil(hi - 1e-9))
        seg[max(ilo, 0):min(max(ihi, ilo + 1), fft_size)] = p
        drop_idx[p] = int((lo + hi) / 2) % fft_size
        last_idx[p] = min(max(ihi - 1, 0), fft_size - 1)
    return seg, drop_idx, last_idx


def wf_frame(params: WfParams, state: WfState,
             window_kind: str = windows.HANNING,
             mode: str = "cma", mask: jax.Array | None = None
             ) -> jax.Array:
    """Compute one waterfall row: (out_px,) float32 dBFS.

    ``mode``: bin->pixel reduction (see WF_MODES).  ``mask``: optional
    (out_px,) multiplier applied to linear pixel power — masked
    frequencies go to 0 exactly like the reference zeroing fft_scale
    for DX-masked bands (`rx_waterfall.cpp:905-918`).
    """
    w = jnp.asarray(windows.window(window_kind, params.fft_size))
    wn = w / np.sum(windows.window(window_kind, params.fft_size),
                    dtype=np.float64)
    z = state.ring * wn
    spec = fft_ops.fft(z.reshape(1, -1))[0]
    spec = fft_ops.fftshift_axis(spec)
    power = spec.abs2()
    frac = params.span / (params.adc_clock / params.total_decim)
    seg, drop_idx, last_idx = _pixel_segments(
        params.fft_size, params.out_px, float(frac))
    segj = jnp.asarray(seg)
    npx = params.out_px
    if mode == "cma":
        s = jax.ops.segment_sum(power, segj, num_segments=npx + 1)
        n = jax.ops.segment_sum(jnp.ones_like(power), segj,
                                num_segments=npx + 1)
        px = (s / jnp.maximum(n, 1.0))[:npx]
    elif mode == "max":
        px = jax.ops.segment_max(power, segj, num_segments=npx + 1)[:npx]
    elif mode == "min":
        px = jax.ops.segment_min(power, segj, num_segments=npx + 1)[:npx]
    elif mode == "last":
        px = power[jnp.asarray(last_idx)]
    elif mode == "drop":
        px = power[jnp.asarray(drop_idx)]
    else:
        raise ValueError(f"unknown wf mode {mode!r}")
    if mask is not None:
        px = px * mask
    return 10.0 * jnp.log10(px + 1e-30)


class ApertureAuto:
    """Auto-aperture estimation (`rx_waterfall.cpp:1176-1270`
    aperture_auto): per-pixel averaged power (IIR / MMA / EMA
    selectable), then a 5 dB-resolution histogram — the most common
    band is the noise floor (mindb), the highest occupied band the
    signal ceiling (maxdb).  Reported every ``report_s`` while on, or
    once when used single-shot (algo OFF), as "MSG maxdb/mindb".
    """
    OFF, IIR, MMA, EMA = range(4)
    RESOLUTION_DB = 5.0

    def __init__(self, algo: int = MMA, param: float = 8.0,
                 report_s: float = 3.0):
        self.algo = algo
        self.param = param
        self.report_s = report_s if algo != self.OFF else 1.0
        self.avg_pwr: np.ndarray | None = None
        self.last_report = 0.0
        self.pending = True

    def accumulate(self, row_dbm: np.ndarray) -> None:
        row_dbm = np.asarray(row_dbm, np.float64)
        if self.avg_pwr is None:
            self.avg_pwr = row_dbm.copy()
            return
        algo = self.MMA if self.algo == self.OFF else self.algo
        param = 8.0 if self.algo == self.OFF else self.param
        if algo == self.IIR:
            gain = np.maximum(1.0 - np.exp(-param * row_dbm / 255.0),
                              0.01)
            self.avg_pwr += (row_dbm - self.avg_pwr) * gain
        elif algo == self.MMA:
            self.avg_pwr = (self.avg_pwr * (param - 1) + row_dbm) / param
        else:                                   # EMA
            self.avg_pwr += (row_dbm - self.avg_pwr) / param

    def report(self, now: float) -> tuple[int, int] | None:
        """(maxdb, mindb) when due, else None."""
        if self.avg_pwr is None or now < self.last_report + self.report_s:
            return None
        if self.algo == self.OFF and not self.pending:
            return None
        self.last_report = now
        self.pending = False
        r = self.RESOLUTION_DB
        bands = np.floor(self.avg_pwr / r) * r
        bands = bands[bands > -190.0]           # disregard masked areas
        if len(bands) == 0:
            return -110, -120
        vals, counts = np.unique(bands, return_counts=True)
        mindb = int(vals[np.argmax(counts)])    # modal band = noise
        maxdb = int(max(vals.max(), -80.0))     # reference floor at -80
        return maxdb, mindb


def wf_row_u8(row_db: jax.Array) -> jax.Array:
    """Quantize a dB row to the reference's wire format: u8 = 255 + dB
    (dB <= 0, clamped), `rx/rx_waterfall.cpp compute_frame`."""
    return jnp.clip(jnp.round(255.0 + row_db), 0, 255).astype(jnp.uint8)
