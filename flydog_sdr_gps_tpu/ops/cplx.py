"""Split-complex arithmetic: complex signals as (re, im) float32 pairs.

TPUs have no native complex ALU, and the axon JAX backend exposes no
complex64 at all — so the framework's device-side convention is a
``Cplx`` NamedTuple of two float32 arrays.  This is also the faster
layout on TPU: real/imag planes tile cleanly into (8, 128) VREGs,
and complex multiplies become fused VPU mul/adds.

Host boundaries (tests, file I/O, network) convert to/from numpy
complex64 with :func:`to_numpy` / :func:`from_numpy`.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp


class Cplx(NamedTuple):
    re: jax.Array
    im: jax.Array

    # -- arithmetic ----------------------------------------------------
    def __add__(self, o):
        if isinstance(o, Cplx):
            return Cplx(self.re + o.re, self.im + o.im)
        return Cplx(self.re + o, self.im)

    def __sub__(self, o):
        if isinstance(o, Cplx):
            return Cplx(self.re - o.re, self.im - o.im)
        return Cplx(self.re - o, self.im)

    def __mul__(self, o):
        if isinstance(o, Cplx):
            return Cplx(self.re * o.re - self.im * o.im,
                        self.re * o.im + self.im * o.re)
        return Cplx(self.re * o, self.im * o)

    __radd__ = __add__
    __rmul__ = __mul__

    def conj(self) -> "Cplx":
        return Cplx(self.re, -self.im)

    def abs2(self) -> jax.Array:
        return self.re * self.re + self.im * self.im

    def abs(self) -> jax.Array:
        return jnp.sqrt(self.abs2())

    def angle(self) -> jax.Array:
        return jnp.arctan2(self.im, self.re)

    # -- shape plumbing ------------------------------------------------
    @property
    def shape(self):
        return self.re.shape

    @property
    def ndim(self):
        return self.re.ndim

    def reshape(self, *s) -> "Cplx":
        return Cplx(self.re.reshape(*s), self.im.reshape(*s))

    def transpose(self, *axes) -> "Cplx":
        return Cplx(self.re.transpose(*axes), self.im.transpose(*axes))

    @property
    def T(self) -> "Cplx":
        return Cplx(self.re.T, self.im.T)

    def __getitem__(self, idx) -> "Cplx":
        return Cplx(self.re[idx], self.im[idx])

    def astype(self, dt) -> "Cplx":
        return Cplx(self.re.astype(dt), self.im.astype(dt))


def zeros(shape, dtype=jnp.float32) -> Cplx:
    return Cplx(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


def full_like_scalar(shape, val: complex, dtype=jnp.float32) -> Cplx:
    return Cplx(jnp.full(shape, np.real(val), dtype),
                jnp.full(shape, np.imag(val), dtype))


def expi(theta: jax.Array) -> Cplx:
    """exp(1j * theta) for real theta."""
    return Cplx(jnp.cos(theta), jnp.sin(theta))


def concatenate(parts, axis=0) -> Cplx:
    return Cplx(jnp.concatenate([p.re for p in parts], axis=axis),
                jnp.concatenate([p.im for p in parts], axis=axis))


def stack(parts, axis=0) -> Cplx:
    return Cplx(jnp.stack([p.re for p in parts], axis=axis),
                jnp.stack([p.im for p in parts], axis=axis))


def where(cond, a: Cplx, b: Cplx) -> Cplx:
    return Cplx(jnp.where(cond, a.re, b.re), jnp.where(cond, a.im, b.im))


def from_numpy(z: np.ndarray) -> Cplx:
    z = np.asarray(z)
    return Cplx(jnp.asarray(np.real(z).astype(np.float32)),
                jnp.asarray(np.imag(z).astype(np.float32)))


def to_numpy(z: Cplx) -> np.ndarray:
    return np.asarray(z.re).astype(np.complex64) + \
        1j * np.asarray(z.im).astype(np.complex64)
