"""AGC — CuteSDR ``CAgc`` behavior, TPU-native formulation.

Reference (`rx/CuteSDR/agc.cpp:1-292`): a look-ahead delay line, a
log-domain envelope follower with separate attack/decay time constants
and a hang timer, and a knee/slope gain law; parameters come from the
client UI ("SET agc=" `rx/rx_sound_cmd.cpp`): manual gain, threshold
(knee, dBm-ish), slope (dB), decay (ms), hang on/off.

TPU design: the only sequential part is the envelope follower (max-hold
with decay and hang), which runs as one `lax.scan` over the block with
all channels vectorized per step; the look-ahead delay is a static
shift (concatenate with carried tail), and the gain law is pure
element-wise math.  This keeps per-sample work to a handful of VPU ops
on (C,)-vectors.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from . import cplx as cplx_ops
from .cplx import Cplx


@dataclasses.dataclass(frozen=True, eq=False)
class AgcParams:
    """Static AGC configuration (per firmware defaults, adjustable)."""
    fs: float = 12_000.0
    delay_samples: int = 48        # ~4 ms look-ahead (ref SetParameters)
    attack_ms: float = 2.0
    decay_ms: float = 200.0
    hang_ms: float = 0.0           # 0 = hang off
    threshold_db: float = -100.0   # knee
    slope_db: float = 6.0          # gain reduction above knee
    max_gain_db: float = 84.0      # AGC_MAX_GAIN-ish ceiling
    out_target: float = 0.5        # output level at/above knee

    @property
    def attack_alpha(self) -> float:
        return 1.0 - float(np.exp(-1.0 / (self.fs * self.attack_ms * 1e-3)))

    @property
    def decay_alpha(self) -> float:
        return 1.0 - float(np.exp(-1.0 / (self.fs * self.decay_ms * 1e-3)))

    @property
    def hang_samples(self) -> int:
        return int(self.fs * self.hang_ms * 1e-3)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class AgcState:
    delay: Cplx             # (delay_samples, C) look-ahead line
    env_db: jax.Array       # (C,) float32 envelope, dB
    hang: jax.Array         # (C,) int32 hang countdown


def init_state(params: AgcParams, num_channels: int) -> AgcState:
    return AgcState(
        delay=cplx_ops.zeros((params.delay_samples, num_channels)),
        env_db=jnp.full((num_channels,), -160.0, jnp.float32),
        hang=jnp.zeros((num_channels,), jnp.int32),
    )


def _envelope_scan(params: AgcParams, mag_db: jax.Array,
                   env0: jax.Array, hang0: jax.Array):
    """Sequential envelope follower: fast attack, hang-then-decay."""
    atk = jnp.float32(params.attack_alpha)
    dec = jnp.float32(params.decay_alpha)
    hang_n = jnp.int32(params.hang_samples)

    def step(carry, m):
        env, hang = carry
        rising = m > env
        env_up = env + atk * (m - env)
        in_hang = hang > 0
        env_dn = jnp.where(in_hang, env, env + dec * (m - env))
        new_env = jnp.where(rising, env_up, env_dn)
        new_hang = jnp.where(rising, hang_n,
                             jnp.maximum(hang - 1, 0))
        return (new_env, new_hang), new_env

    (env, hang), env_seq = lax.scan(step, (env0, hang0), mag_db)
    return env_seq, env, hang


def agc_block(params: AgcParams, x: Cplx, state: AgcState,
              manual_gain_db: jax.Array | None = None,
              ) -> tuple[Cplx, AgcState]:
    """Apply AGC to one block (N, C) split complex; returns (y, new_state).

    If ``manual_gain_db`` is given per channel (C,), channels with a
    non-NaN entry use fixed manual gain (reference: AGC off = manual
    gain slider, `rx/CuteSDR/agc.cpp` m_AgcOn false path).
    """
    eps = jnp.float32(1e-12)
    mag_db = 20.0 * jnp.log10(x.abs() + eps)
    env_seq, env, hang = _envelope_scan(params, mag_db,
                                        state.env_db, state.hang)
    # knee/slope gain law (log domain), clamped to max gain
    knee = jnp.float32(params.threshold_db)
    slope = jnp.float32(params.slope_db)
    target_db = 20.0 * jnp.log10(jnp.float32(params.out_target))
    above = env_seq >= knee
    gain_db = jnp.where(
        above,
        target_db - env_seq + slope * (env_seq - knee) / 100.0,
        target_db - knee,
    )
    gain_db = jnp.minimum(gain_db, jnp.float32(params.max_gain_db))
    if manual_gain_db is not None:
        manual = jnp.broadcast_to(manual_gain_db, gain_db.shape)
        gain_db = jnp.where(jnp.isnan(manual), gain_db, manual)
    gain = jnp.power(10.0, gain_db / 20.0).astype(jnp.float32)
    # look-ahead: gain derived from x[n], applied to x[n - delay]
    buf = cplx_ops.concatenate([state.delay, x], axis=0)
    delayed = buf[:x.shape[0]]
    y = delayed * gain
    new_state = AgcState(delay=buf[x.shape[0]:], env_db=env, hang=hang)
    return y, new_state
