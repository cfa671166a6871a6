"""Linear recurrences (IIR) as parallel associative scans.

The reference's per-sample IIR loops (DC blocker `rx/rx_sound.cpp:
770-780`, biquad de-emphasis `rx/CuteSDR/iir.cpp`, S-meter attack
filter `rx/rx_sound.cpp:679-696`) are sequential C code.  A linear
recurrence is associative, so on TPU we evaluate it in O(log N) depth
with `lax.associative_scan`, vectorized over the channel axis — no
per-sample loop ever reaches the device.

Conventions: signals are (N, C) arrays (time major, channels vectorized).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def linear_recurrence(a: jax.Array, u: jax.Array, y0: jax.Array
                      ) -> jax.Array:
    """Solve ``y[n] = a[n]*y[n-1] + u[n]`` with ``y[-1] = y0``.

    ``a`` broadcasts against ``u`` (N, C); returns y (N, C).
    """
    a = jnp.broadcast_to(a, u.shape).astype(u.dtype)
    u = u.at[0].add(a[0] * y0)

    def comb(left, right):
        al, bl = left
        ar, br = right
        return (al * ar, ar * bl + br)

    _, y = lax.associative_scan(comb, (a, u), axis=0)
    return y


def linear_recurrence_2(a1, a2, v: jax.Array, y1_0, y2_0) -> jax.Array:
    """Second-order: ``y[n] = a1*y[n-1] + a2*y[n-2] + v[n]``.

    Initial conditions y[-1]=y1_0, y[-2]=y2_0.  Implemented as a 2x2
    matrix associative scan kept in unpacked component form so it stays
    pure VPU element-wise math.
    """
    shape = v.shape
    dt = v.dtype
    a1 = jnp.broadcast_to(jnp.asarray(a1, dt), shape)
    a2 = jnp.broadcast_to(jnp.asarray(a2, dt), shape)
    # element maps: s[n] = M_n s[n-1] + w_n,  s = [y[n], y[n-1]]
    m11, m12 = a1, a2
    m21 = jnp.ones(shape, dt)
    m22 = jnp.zeros(shape, dt)
    w1 = v
    w2 = jnp.zeros(shape, dt)

    def comb(l, r):
        l11, l12, l21, l22, lw1, lw2 = l
        r11, r12, r21, r22, rw1, rw2 = r
        return (r11 * l11 + r12 * l21,
                r11 * l12 + r12 * l22,
                r21 * l11 + r22 * l21,
                r21 * l12 + r22 * l22,
                r11 * lw1 + r12 * lw2 + rw1,
                r21 * lw1 + r22 * lw2 + rw2)

    out = lax.associative_scan(comb, (m11, m12, m21, m22, w1, w2), axis=0)
    # s[n] = A_cum s[-1] + B_cum ; first state row is y[n]
    return out[0] * y1_0 + out[1] * y2_0 + out[4]


def biquad(x: jax.Array, b, a, state: jax.Array
           ) -> tuple[jax.Array, jax.Array]:
    """Direct-form-I biquad over (N, C) signal, channel-vectorized.

    ``b = (b0, b1, b2)``, ``a = (1, a1, a2)`` in scipy sign convention:
    ``y[n] = b0 x[n]+b1 x[n-1]+b2 x[n-2] - a1 y[n-1] - a2 y[n-2]``.
    ``state``: (4, C) carrying [x[-1], x[-2], y[-1], y[-2]].
    Returns (y, new_state).
    """
    b0, b1, b2 = [jnp.asarray(v, x.dtype) for v in b]
    a1, a2 = [jnp.asarray(v, x.dtype) for v in a[1:]]
    xm1, xm2, ym1, ym2 = state[0], state[1], state[2], state[3]
    xd1 = jnp.concatenate([xm1[None], x[:-1]], axis=0)
    xd2 = jnp.concatenate([xm2[None], xm1[None], x[:-2]], axis=0)
    v = b0 * x + b1 * xd1 + b2 * xd2
    y = linear_recurrence_2(-a1, -a2, v, ym1, ym2)
    new_state = jnp.stack([x[-1], x[-2], y[-1], y[-2]], axis=0)
    return y, new_state


def dc_blocker(x: jax.Array, state: jax.Array, r: float = 0.999
               ) -> tuple[jax.Array, jax.Array]:
    """DC-removal IIR: ``y[n] = x[n] - x[n-1] + r*y[n-1]``.

    Matches the AM-demod DC block of the reference
    (`rx/rx_sound.cpp:770-780`).  state: (2, C) = [x[-1], y[-1]].
    """
    xm1, ym1 = state[0], state[1]
    xd1 = jnp.concatenate([xm1[None], x[:-1]], axis=0)
    u = x - xd1
    y = linear_recurrence(jnp.asarray(r, x.dtype), u, ym1)
    return y, jnp.stack([x[-1], y[-1]], axis=0)


def one_pole_smoother(x: jax.Array, alpha, y0: jax.Array) -> jax.Array:
    """``y[n] = (1-alpha)*y[n-1] + alpha*x[n]`` — attack/decay filter."""
    alpha = jnp.asarray(alpha, x.dtype)
    return linear_recurrence(1.0 - alpha, alpha * x, y0)


def design_biquad_lowpass(fs: float, fc: float, q: float = 0.7071
                          ) -> tuple[tuple, tuple]:
    """RBJ cookbook lowpass biquad (same math as `tools/biquad.MZT.m`
    usage for de-emphasis-style filters)."""
    w0 = 2 * np.pi * fc / fs
    alpha = np.sin(w0) / (2 * q)
    cw = np.cos(w0)
    b = ((1 - cw) / 2, 1 - cw, (1 - cw) / 2)
    a = (1 + alpha, -2 * cw, 1 - alpha)
    a0 = a[0]
    return tuple(v / a0 for v in b), (1.0, a[1] / a0, a[2] / a0)
