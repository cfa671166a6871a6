"""48-bit numerically-controlled oscillator (NCO), TPU-native.

The reference tunes each DDC with a 48-bit phase accumulator clocked at
the ADC rate (`verilog/rx/rx.v:44-65`); the host computes the frequency
control word as ``round(freq / adc_clock * 2**48)``
(`rx/rx_sound_cmd.cpp:80-90`).  48-bit phase gives ~0.44 uHz resolution
at 125 MHz and, critically, NO long-term phase drift: integer phase
wraps exactly.

TPUs have no native int64, and float32 phase accumulation would drift
after ~2**24 samples.  We therefore represent phase as three 16-bit
limbs held in int32 lanes and do exact modular arithmetic; phases are
materialized as float32 *cycles in [0, 1)* only at the point of use,
where the ~2**-24 conversion rounding is far below the -120 dBc floor
of float32 sin/cos.

Limb layout: ``phase = l0 + l1*2**16 + l2*2**32 (mod 2**48)``.

All functions are jit-safe (static shapes, int32 only).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..numerology import PHASE_BITS

_MASK16 = 0xFFFF
# Largest per-call ramp length such that k * limb + limb fits in int32:
# 16384 * 65535 + 65535 < 2**30 + 2**16.
MAX_RAMP = 16384


def freq_to_fcw(freq_hz: float, adc_clock_hz: float) -> int:
    """Frequency -> 48-bit frequency control word (exact Python int).

    Mirrors `rx/rx_sound_cmd.cpp:86-87`.  Negative frequencies wrap
    modulo 2**48 (two's-complement style), matching accumulator behavior.
    """
    fcw = round(freq_hz / adc_clock_hz * (1 << PHASE_BITS))
    return fcw % (1 << PHASE_BITS)


def fcw_to_freq(fcw: int, adc_clock_hz: float) -> float:
    """Inverse of :func:`freq_to_fcw` (principal value in [-fs/2, fs/2))."""
    fcw = fcw % (1 << PHASE_BITS)
    if fcw >= 1 << (PHASE_BITS - 1):
        fcw -= 1 << PHASE_BITS
    return fcw / (1 << PHASE_BITS) * adc_clock_hz


def to_limbs(words) -> np.ndarray:
    """48-bit int(s) -> int32 array [..., 3] of 16-bit limbs (host side)."""
    w = np.asarray(words, dtype=object)
    l0 = (w & _MASK16).astype(np.int64)
    l1 = ((w >> 16) & _MASK16).astype(np.int64)
    l2 = ((w >> 32) & _MASK16).astype(np.int64)
    return np.stack([l0, l1, l2], axis=-1).astype(np.int32)


def from_limbs(limbs: np.ndarray):
    """int32 limbs [..., 3] -> python ints (host side, for tests)."""
    limbs = np.asarray(limbs, dtype=np.int64)
    val = (limbs[..., 0].astype(object)
           + (limbs[..., 1].astype(object) << 16)
           + (limbs[..., 2].astype(object) << 32))
    return val % (1 << PHASE_BITS)


def limb_add(a, b):
    """Exact (a + b) mod 2**48 on limb arrays; jit-safe."""
    a = jnp.asarray(a, jnp.int32)
    b = jnp.asarray(b, jnp.int32)
    s0 = a[..., 0] + b[..., 0]
    c0 = s0 >> 16
    s1 = a[..., 1] + b[..., 1] + c0
    c1 = s1 >> 16
    s2 = (a[..., 2] + b[..., 2] + c1) & _MASK16
    return jnp.stack([s0 & _MASK16, s1 & _MASK16, s2], axis=-1)


def limb_scale(d, k):
    """Exact (k * d) mod 2**48 for scalar/array int32 ``k`` in [0, 2**14].

    ``d`` is a limb array [..., 3]; ``k`` broadcasts against d[..., 0].
    """
    d = jnp.asarray(d, jnp.int32)
    k = jnp.asarray(k, jnp.int32)
    p0 = k * d[..., 0]
    p1 = k * d[..., 1] + (p0 >> 16)
    p2 = (k * d[..., 2] + (p1 >> 16)) & _MASK16
    return jnp.stack([p0 & _MASK16, p1 & _MASK16, p2], axis=-1)


def limb_neg(b):
    """Exact (-b) mod 2**48 on limb arrays; jit-safe."""
    b = jnp.asarray(b, jnp.int32)
    comp = jnp.stack([(~b[..., 0]) & _MASK16,
                      (~b[..., 1]) & _MASK16,
                      (~b[..., 2]) & _MASK16], axis=-1)
    one = jnp.concatenate(
        [jnp.ones_like(comp[..., :1]), jnp.zeros_like(comp[..., :2])],
        axis=-1)
    return limb_add(comp, one)


def limbs_to_cycles_f32(limbs) -> jnp.ndarray:
    """Limb phase -> float32 cycles in [0, 1)."""
    limbs = jnp.asarray(limbs)
    return (limbs[..., 2].astype(jnp.float32) * jnp.float32(2.0 ** -16)
            + limbs[..., 1].astype(jnp.float32) * jnp.float32(2.0 ** -32)
            + limbs[..., 0].astype(jnp.float32) * jnp.float32(2.0 ** -48))


def phase_ramp(phi0_limbs, dphi_limbs, num: int) -> jnp.ndarray:
    """Exact phase ramp ``(phi0 + k*dphi) mod 2**48`` for k in [0, num).

    Returns float32 cycles, shape ``(num,) + batch_shape`` where
    batch_shape is the (broadcast) batch shape of the limb inputs.
    ``num`` must be <= MAX_RAMP (16384); longer ramps should advance the
    carry with :func:`advance` between calls (the streaming model does
    exactly this per block).
    """
    if num > MAX_RAMP:
        raise ValueError(f"phase_ramp num={num} > MAX_RAMP={MAX_RAMP}")
    k = jnp.arange(num, dtype=jnp.int32)
    # broadcast k against batch dims of the limbs
    batch_ndim = jnp.asarray(dphi_limbs).ndim - 1
    k = k.reshape((num,) + (1,) * batch_ndim)
    kd = limb_scale(jnp.asarray(dphi_limbs)[None], k)
    ph = limb_add(jnp.asarray(phi0_limbs)[None], kd)
    return limbs_to_cycles_f32(ph)


def phase_ramp_long(phi0_limbs, dphi_limbs, num: int) -> jnp.ndarray:
    """Exact phase ramp of arbitrary static length: chunks of MAX_RAMP
    advanced with exact limb carries between chunks."""
    outs = []
    p = jnp.asarray(phi0_limbs, jnp.int32)
    d = jnp.asarray(dphi_limbs, jnp.int32)
    off = 0
    while off < num:
        step = min(MAX_RAMP, num - off)
        outs.append(phase_ramp(p, d, step))
        p = advance(p, d, step)
        off += step
    return jnp.concatenate(outs) if len(outs) > 1 else outs[0]


def advance(phi_limbs, dphi_limbs, num):
    """Advance a phase carry by ``num`` steps: (phi + num*dphi) mod 2**48.

    ``num`` may exceed MAX_RAMP; it is decomposed into 14-bit digits
    (static Python int) or handled via two-level scaling (traced int32).
    """
    if isinstance(num, int):
        acc = jnp.asarray(phi_limbs, jnp.int32)
        d = jnp.asarray(dphi_limbs, jnp.int32)
        shift = 0
        n = num
        while n > 0:
            digit = n & 0x3FFF
            if digit:
                acc = limb_add(acc, limb_scale(_limb_shl(d, shift), digit))
            n >>= 14
            shift += 14
        return acc
    # traced: assume num < 2**28; split into low/high 14-bit parts
    num = jnp.asarray(num, jnp.int32)
    lo = num & 0x3FFF
    hi = num >> 14
    d = jnp.asarray(dphi_limbs, jnp.int32)
    acc = limb_add(jnp.asarray(phi_limbs, jnp.int32), limb_scale(d, lo))
    return limb_add(acc, limb_scale(_limb_shl(d, 14), hi))


def _limb_shl(d, shift_bits: int):
    """Exact (d << shift_bits) mod 2**48 on limbs (static shift)."""
    if shift_bits == 0:
        return jnp.asarray(d, jnp.int32)
    d = jnp.asarray(d, jnp.int32)
    q, r = divmod(shift_bits, 16)
    limbs = [d[..., 0], d[..., 1], d[..., 2]]
    # shift by q whole limbs
    shifted = [jnp.zeros_like(limbs[0])] * 3
    for i in range(3):
        if i - q >= 0:
            shifted[i] = limbs[i - q]
    if r:
        carry = jnp.zeros_like(shifted[0])
        out = []
        for i in range(3):
            v = ((shifted[i] << r) | carry) & _MASK16
            carry = shifted[i] >> (16 - r)
            out.append(v)
        shifted = out
    return jnp.stack(shifted, axis=-1)


def tone(phi0_limbs, dphi_limbs, num: int) -> jnp.ndarray:
    """Complex exponential exp(+j*2*pi*phase_ramp), float32 complex."""
    ph = phase_ramp(phi0_limbs, dphi_limbs, num)
    ang = (2.0 * np.pi) * ph
    return jax.lax.complex(jnp.cos(ang), jnp.sin(ang))
