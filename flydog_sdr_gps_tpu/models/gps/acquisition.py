"""GPS acquisition: FFT code-Doppler search, batched on the MXU.

Reference (`gps/search.cpp:140-498`): 16.368 Msps 1-bit IF samples are
quadrature-mixed by the 4.092 MHz LO, decimated x4 to 4.092 Msps,
forward-FFT'd once (16384 pt = 4 ms); then per satellite the
precomputed conjugate code FFT is multiplied at 41 Doppler shifts
(+-5 kHz in ~250 Hz bins = one FFT bin per step) and inverse-FFT'd;
the peak magnitude vs average gives SNR, the peak index the code
phase.  `SearchTask` round-robins satellites one IFFT at a time on the
ARM; here the whole (satellite x Doppler) plane is one batched
matmul-FFT — the textbook TPU win.

All complex math is split re/im (`ops/cplx.py`).
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp

from ...numerology import (GPS_ACQ_FFT, GPS_ACQ_FS, GPS_DOPPLER_MAX,
                           GPS_DOPPLER_STEP, GPS_FC, GPS_FS, L1_CODELEN)
from ...ops import cplx as cplx_ops
from ...ops import fft as fft_ops
from ...ops.cplx import Cplx
from . import cacode


@dataclasses.dataclass(frozen=True, eq=False)
class AcqParams:
    fs_if: float = GPS_FS            # raw IF sample rate
    fc: float = GPS_FC               # IF center frequency
    fs: float = GPS_ACQ_FS           # decimated rate (fs_if / decim)
    fft_len: int = GPS_ACQ_FFT       # 16384 (4 ms @ 4.092 Msps)
    doppler_max: float = GPS_DOPPLER_MAX
    doppler_step: float = GPS_DOPPLER_STEP

    @property
    def decim(self) -> int:
        return int(round(self.fs_if / self.fs))

    @property
    def n_raw(self) -> int:
        return self.fft_len * self.decim

    @property
    def n_doppler(self) -> int:
        return 2 * int(self.doppler_max / self.doppler_step) + 1


def downsample_if(params: AcqParams, raw: jax.Array) -> Cplx:
    """1-bit (+-1) IF samples -> baseband complex at fs.

    Mix by exp(-j*2*pi*fc*t) and box-average by ``decim`` — float
    version of the reference's XOR quadrature mix + binary decimator
    (`gps/search.cpp:140-180`).
    """
    n = params.n_raw
    t = jnp.arange(n, dtype=jnp.float32)
    # fc / fs_if = 4.092/16.368 = exactly 1/4: the LO cycles through
    # (1, -j, -1, j) — phase is exact with a mod-4 index
    q = jnp.mod(t, 4.0)
    lo_re = jnp.where(q == 0, 1.0, jnp.where(q == 2, -1.0, 0.0))
    lo_im = jnp.where(q == 1, -1.0, jnp.where(q == 3, 1.0, 0.0))
    z = Cplx(raw * lo_re, raw * lo_im)
    zr = z.re.reshape(params.fft_len, params.decim).sum(axis=1)
    zi = z.im.reshape(params.fft_len, params.decim).sum(axis=1)
    return Cplx(zr, zi)


@functools.lru_cache(maxsize=8)
def code_ffts(params: AcqParams, prns: tuple[int, ...]) -> np.ndarray:
    """Host-precomputed conjugated code FFTs, complex64 (nsat, fft_len).

    Mirrors `gps/search.cpp:239-357` (one FFT per PRN at startup).
    """
    out = np.zeros((len(prns), params.fft_len), np.complex64)
    for i, prn in enumerate(prns):
        code = cacode.ca_code_sampled(prn, params.fs, params.fft_len)
        out[i] = np.conj(np.fft.fft(code))
    return out


def acquire_power(params: AcqParams, baseband: Cplx, code_fft: Cplx
                  ) -> jax.Array:
    """Correlation power plane (nsat, n_doppler, fft_len) for one
    4 ms window (the inner loop of `gps/search.cpp:453-498`)."""
    nd = params.n_doppler
    half = nd // 2
    x = fft_ops.fft(baseband.reshape(1, -1))[0]        # (fft_len,)
    nsat = code_fft.shape[0]
    # Doppler shift = circular roll of the DATA spectrum by d bins
    # (bin width fs/fft_len ~= 249.8 Hz ~= doppler_step)
    rolls = [d - half for d in range(nd)]
    xs = cplx_ops.stack(
        [Cplx(jnp.roll(x.re, -d), jnp.roll(x.im, -d)) for d in rolls],
        axis=0)                                        # (nd, fft_len)
    prod = Cplx(
        xs.re[None, :, :] * code_fft.re[:, None, :]
        - xs.im[None, :, :] * code_fft.im[:, None, :],
        xs.re[None, :, :] * code_fft.im[:, None, :]
        + xs.im[None, :, :] * code_fft.re[:, None, :])  # (nsat, nd, N)
    corr = fft_ops.ifft(prod.reshape(nsat * nd, params.fft_len))
    return corr.abs2().reshape(nsat, nd, params.fft_len)


def peak_from_power(params: AcqParams, power: jax.Array,
                    code_period_samples: int | None = None,
                    chips_per_period: int = L1_CODELEN
                    ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Reduce a (summed) power plane to per-sat (snr, cp, doppler)."""
    nd = params.n_doppler
    half = nd // 2
    nsat = power.shape[0]
    # only one code period of lags is distinct; the peak repeats
    samps_per_code = code_period_samples or \
        int(round(params.fs / 1.023e6 * L1_CODELEN))
    p1 = power[:, :, :samps_per_code]
    peak = jnp.max(p1, axis=(1, 2))
    mean = jnp.mean(power, axis=(1, 2))
    flat = p1.reshape(nsat, -1)
    arg = jnp.argmax(flat, axis=1)
    dop_idx = arg // samps_per_code
    phase_idx = arg % samps_per_code
    snr = peak / jnp.maximum(mean, 1e-20)
    doppler_hz = (dop_idx.astype(jnp.float32) - half) * \
        jnp.float32(params.fs / params.fft_len)
    # peak lag tau satisfies data[n] ~ code[n - tau]; the tracking
    # handoff wants cp with data[n] ~ code[cp + n], i.e. cp = -tau
    code_phase = jnp.mod(
        (samps_per_code - phase_idx).astype(jnp.float32),
        samps_per_code) * jnp.float32(chips_per_period / samps_per_code)
    return snr, code_phase, doppler_hz


def acquire(params: AcqParams, baseband: Cplx, code_fft: Cplx,
            code_period_samples: int | None = None,
            chips_per_period: int = L1_CODELEN
            ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Search the (sat, Doppler) plane for one window.

    baseband: (fft_len,) decimated IF block.
    code_fft: (nsat, fft_len) conjugated code spectra.
    code_period_samples: lag-search span (one code period); defaults
    to the C/A 1 ms period (4092 samples at 4.092 Msps).  Galileo E1B
    passes its 4 ms period (= the whole window).

    Returns (snr, code_phase, doppler_hz) per satellite, where SNR is
    peak power / mean power (the reference's test statistic,
    `gps/search.cpp:453-498`).
    """
    power = acquire_power(params, baseband, code_fft)
    return peak_from_power(params, power, code_period_samples,
                           chips_per_period)


def acquire_all(params: AcqParams, raw: np.ndarray,
                prns: tuple[int, ...], batch: int = 8):
    """Host convenience: full cold search over ``prns``.

    Returns list of dicts sorted by SNR.  Batches satellites to bound
    device memory ((nsat*41, 16384) correlation planes).
    """
    bb = downsample_if(params, jnp.asarray(np.asarray(raw, np.float32)))
    cf_all = code_ffts(params, tuple(prns))
    results = []
    for i in range(0, len(prns), batch):
        cf = cf_all[i:i + batch]
        snr, cp, dop = acquire(params, bb, cplx_ops.from_numpy(cf))
        for j in range(cf.shape[0]):
            results.append(dict(
                prn=prns[i + j], snr=float(snr[j]),
                code_phase=float(cp[j]), doppler=float(dop[j])))
    results.sort(key=lambda r: -r["snr"])
    return results
