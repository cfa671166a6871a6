"""Demodulators: AM / SAM / SSB / CW / NBFM / IQ, channel-vectorized.

Reference signal path (`rx/rx_sound.cpp:707-896`): after the passband
FastFIR and AGC, each channel demodulates per its mode:

- AM    envelope + DC-block IIR              (`rx_sound.cpp:762-789`)
- SAM*  synchronous AM via PLL               (`rx/wdsp/SAM_demod.cpp`)
- NBFM  quadri-correlator discriminator      (`rx_sound.cpp:808-879`,
        csdr-derived) + noise squelch
- SSB/CW  real part of the analytic passband (`rx_sound.cpp:885-892`)
- IQ/DRM  complex passthrough

TPU formulation: everything is vectorized over (N, C) blocks with
split-complex IQ (`ops.cplx` — no complex dtype on the TPU backend).
The only truly sequential element is the SAM PLL, which runs as a
`lax.scan` with all channels advanced per step; AM's DC block uses the
parallel associative scan in `ops.iir`; FM is a pure shifted
elementwise op.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from . import cplx as cplx_ops
from . import iir
from .cplx import Cplx

# mode ids (wire-compatible naming with the reference's mode strings,
# `rx/rx_cmd.cpp` "SET mod=")
MODE_AM, MODE_AMN, MODE_USB, MODE_LSB, MODE_CW, MODE_CWN = range(6)
MODE_NBFM, MODE_IQ, MODE_DRM, MODE_SAM, MODE_SAL, MODE_SAU, MODE_SAS = \
    range(6, 13)

SSB_LIKE = (MODE_USB, MODE_LSB, MODE_CW, MODE_CWN)

MODE_NAMES = {
    "am": MODE_AM, "amn": MODE_AMN, "usb": MODE_USB, "lsb": MODE_LSB,
    "cw": MODE_CW, "cwn": MODE_CWN, "nbfm": MODE_NBFM, "iq": MODE_IQ,
    "drm": MODE_DRM, "sam": MODE_SAM, "sal": MODE_SAL, "sau": MODE_SAU,
    "sas": MODE_SAS,
}
MODE_IDS = {v: k for k, v in MODE_NAMES.items()}


# ---------------------------------------------------------------------------
# AM
# ---------------------------------------------------------------------------

def am_demod(z: Cplx, dc_state: jax.Array
             ) -> tuple[jax.Array, jax.Array]:
    """Envelope detector + DC removal.  z: (N, C) split complex."""
    mag = z.abs()
    audio, dc_state = iir.dc_blocker(mag, dc_state)
    return audio, dc_state


# ---------------------------------------------------------------------------
# SSB / CW
# ---------------------------------------------------------------------------

def ssb_demod(z: Cplx) -> jax.Array:
    """Sideband selection happened in the complex passband filter; the
    demod is just the real part (`rx_sound.cpp:885-892`)."""
    return z.re


# ---------------------------------------------------------------------------
# NBFM
# ---------------------------------------------------------------------------

def fm_demod(z: Cplx, last: Cplx, fs: float,
             deviation=2500.0) -> tuple[jax.Array, Cplx]:
    """Quadri-correlator discriminator (csdr-style, `rx_sound.cpp:846-871`).

    audio[n] = angle(z[n] * conj(z[n-1])) * fs / (2*pi*deviation)
    ``last``: (C,) carry of the previous block's final sample.
    """
    zprev = cplx_ops.concatenate([last[None], z[:-1]], axis=0)
    d = z * zprev.conj()
    ang = d.angle()
    scale = fs / (2.0 * np.pi) / deviation
    return (ang * scale).astype(jnp.float32), z[-1]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SquelchState:
    noise: jax.Array   # (C,) float32 smoothed ultrasonic noise power
    open_: jax.Array   # (C,) bool gate state
    tail: jax.Array    # (C,) int32 tail countdown (blocks)


def init_squelch_state(num_channels: int) -> SquelchState:
    return SquelchState(
        noise=jnp.ones((num_channels,), jnp.float32),
        open_=jnp.zeros((num_channels,), bool),
        tail=jnp.zeros((num_channels,), jnp.int32),
    )


def fm_squelch(audio: jax.Array, state: SquelchState,
               threshold: jax.Array, tail_blocks: int = 12
               ) -> tuple[jax.Array, SquelchState]:
    """FM noise squelch (CuteSDR-style, `rx/CuteSDR/squelch.cpp`).

    Measures out-of-voice-band discriminator noise (first difference of
    the demod output kills voice, keeps wideband noise), smooths it, and
    gates with hysteresis + tail.  ``threshold``: (C,) in [0, 1]-ish
    noise units; 0 disables (always open).
    """
    hf = audio[1:] - audio[:-1]
    noise_pow = jnp.mean(hf * hf, axis=0)
    noise = 0.8 * state.noise + 0.2 * noise_pow
    quiet = noise < threshold
    disabled = threshold <= 0.0
    opening = quiet | disabled
    tail = jnp.where(opening, tail_blocks,
                     jnp.maximum(state.tail - 1, 0))
    open_now = opening | (tail > 0)
    y = jnp.where(open_now[None, :], audio, 0.0)
    return y, SquelchState(noise=noise, open_=open_now, tail=tail)


# ---------------------------------------------------------------------------
# SAM (synchronous AM) — PLL carrier recovery
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True, eq=False)
class SamParams:
    """2nd-order PLL loop constants (wdsp `SAM_demod.cpp` zeta/omegaN)."""
    fs: float = 12_000.0
    bandwidth_hz: float = 100.0     # loop natural frequency
    zeta: float = 0.707
    fmax_hz: float = 1_000.0        # carrier pull-in limit

    @property
    def g1(self) -> float:
        wn = 2 * np.pi * self.bandwidth_hz
        return float(2 * self.zeta * wn / self.fs)

    @property
    def g2(self) -> float:
        wn = 2 * np.pi * self.bandwidth_hz
        return float(wn * wn / (self.fs * self.fs))


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SamState:
    phase: jax.Array   # (C,) float32 radians
    freq: jax.Array    # (C,) float32 rad/sample
    dc: jax.Array      # (2, C) float32 dc-blocker state


def init_sam_state(num_channels: int) -> SamState:
    return SamState(
        phase=jnp.zeros((num_channels,), jnp.float32),
        freq=jnp.zeros((num_channels,), jnp.float32),
        dc=jnp.zeros((2, num_channels), jnp.float32),
    )


def sam_demod(params: SamParams, z: Cplx, state: SamState
              ) -> tuple[jax.Array, Cplx, SamState]:
    """Carrier-locked AM demod.

    Returns (audio (N, C) float32 — the DC-blocked in-phase envelope,
    the plain SAM output), the carrier-locked baseband ``v`` (N, C)
    for downstream sideband selection (SAL/SAU/SAS), and new state.

    Per-sample PLL advanced by `lax.scan`; all channels per step.
    """
    g1 = jnp.float32(params.g1)
    g2 = jnp.float32(params.g2)
    fmax = jnp.float32(2 * np.pi * params.fmax_hz / params.fs)

    def step(carry, zn):
        phase, freq = carry
        rot = Cplx(jnp.cos(phase), -jnp.sin(phase))
        v = zn * rot
        err = v.angle()
        freq2 = jnp.clip(freq + g2 * err, -fmax, fmax)
        phase2 = phase + freq2 + g1 * err
        phase2 = jnp.where(phase2 > np.pi, phase2 - 2 * np.pi,
                           jnp.where(phase2 < -np.pi, phase2 + 2 * np.pi,
                                     phase2))
        return (phase2, freq2), v

    (phase, freq), v = lax.scan(step, (state.phase, state.freq), z)
    audio, new_dc = iir.dc_blocker(v.re, state.dc)
    return (audio.astype(jnp.float32), v,
            SamState(phase=phase, freq=freq, dc=new_dc))


# ---------------------------------------------------------------------------
# all-mode RSSI squelch (`rx/rx_sound.cpp:951-987`)
# ---------------------------------------------------------------------------

N_RSSI = 65                     # rx/rx_sound.cpp:291


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class RssiSquelchState:
    ring: jax.Array    # (N_RSSI, C) float32 RSSI noise-floor samples
    count: jax.Array   # () int32 samples collected
    open_: jax.Array   # (C,) bool gate state
    tail: jax.Array    # (C,) int32 tail countdown (blocks)


def init_rssi_squelch(num_channels: int) -> RssiSquelchState:
    return RssiSquelchState(
        ring=jnp.zeros((N_RSSI, num_channels), jnp.float32),
        count=jnp.int32(0),
        open_=jnp.zeros((num_channels,), bool),
        tail=jnp.zeros((num_channels,), jnp.int32),
    )


def rssi_squelch(audio: jax.Array, smeter_dbm: jax.Array,
                 state: RssiSquelchState, squelch_db: jax.Array,
                 tail_blocks: int = 12
                 ) -> tuple[jax.Array, RssiSquelchState]:
    """Non-NBFM squelch: the noise floor is the median of recent
    block RSSI values (collected while the gate is closed); the gate
    opens at median + squelch_db with 6 dB hysteresis and a tail
    (`rx/rx_sound.cpp:951-987`).  squelch_db <= 0 disables (open).
    """
    active = squelch_db > 0.0
    # collect the floor only while closed (the reference freezes the
    # ring while the squelch is open so signal doesn't pollute it)
    idx = state.count % N_RSSI
    newrow = jnp.where(state.open_ & active, state.ring[idx],
                       smeter_dbm)
    ring = state.ring.at[idx].set(newrow)
    count = state.count + 1
    filled = count >= N_RSSI
    med = jnp.median(ring, axis=0)
    thresh = med + squelch_db - jnp.where(state.open_, 6.0, 0.0)
    green = smeter_dbm >= thresh
    tail = jnp.where(green, tail_blocks,
                     jnp.maximum(state.tail - 1, 0))
    open_now = filled & (green | (tail > 0))
    pass_ = ~active | open_now
    y = jnp.where(pass_[None, :], audio, 0.0)
    return y, RssiSquelchState(ring=ring, count=count,
                               open_=open_now & active, tail=tail)
