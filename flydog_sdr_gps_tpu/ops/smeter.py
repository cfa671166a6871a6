"""S-meter: attack/decay-filtered signal level in dB.

Reference (`rx/rx_sound.cpp:677-696`): per-sample power of the
post-passband IQ is attack-filtered (one-pole) and reported in dBm
(with a calibration offset, default -13 dBm full scale,
`rx/rx_init.cpp` "S_meter_cal").  The wire format sends
``(dBm + 127) * 10`` as a 16-bit value in every SND packet header
(`rx/rx_sound.cpp:1269-1280`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import iir
from .cplx import Cplx

DEFAULT_CAL_DBM = -13.0


def smeter_block(z: Cplx, level: jax.Array,
                 attack_alpha: float = 0.2,
                 ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Track filtered power of (N, C) IQ; returns (dBm_seq, peak_dBm, new).

    ``level``: (C,) float32 carried linear power.  The per-packet value
    the server reports is the block max of the filtered level, matching
    the reference's per-buffer max scan.
    """
    p = z.abs2()
    filt = iir.one_pole_smoother(p, attack_alpha, level)
    dbm = 10.0 * jnp.log10(filt + 1e-30) + DEFAULT_CAL_DBM
    return dbm, jnp.max(dbm, axis=0), filt[-1]


def smeter_wire(dbm: jax.Array) -> jax.Array:
    """Encode dBm to the SND-header 16-bit format ((dBm+127)*10)."""
    v = jnp.round((dbm + 127.0) * 10.0)
    return jnp.clip(v, 0, 65535).astype(jnp.int32)
