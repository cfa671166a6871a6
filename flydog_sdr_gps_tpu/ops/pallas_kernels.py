"""Pallas TPU kernels for the hot signal-chain inner loops.

First resident: the stage-2 polyphase decimator.  The XLA formulation
(`channelizer._stage2_poly`) re-reads the stage-1 output m2 (~24)
times (~3 GB of HBM traffic per block at C=1024); this kernel streams
each input tile into VMEM once and does the whole tap reduction
on-chip — input is read exactly once (~130 MB), the arithmetic is
pure VPU FMA.

Layout: the input y (Kp, C) is pre-reshaped host-side to
(Kp/d2, d2, C) so the overlapping grid windows slice the UNTILED
leading axis (Mosaic requires tiled-axis DMA slices to align to the
(8, 128) tile, which the overlap of tail2 rows would violate).
Each program DMAs its (tk + m2 - 1, d2, TC) window and accumulates
``out[k] = sum_i sum_d h2p[i, d] * z[k + i, d]``.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .cplx import Cplx


def _pick_tiles(k2: int, c: int, d2: int, m2: int,
                vmem_budget: int = 8 * 1024 * 1024
                ) -> tuple[int, int] | None:
    """Choose (TK, TC) that divide (k2, C) and fit the VMEM budget.

    VMEM cost ~= (TK + m2 - 1) * round_up(d2, 8) * TC * 4 bytes.
    """
    d2p = ((d2 + 7) // 8) * 8
    for tc in (128, 256, 64):
        if c % tc:
            continue
        for tk in (256, 128, 512, 64):
            if k2 % tk:
                continue
            if (tk + m2 - 1) * d2p * tc * 4 <= vmem_budget:
                return tk, tc
    return None


def stage2_pallas_part(part: jax.Array, h2: np.ndarray, d2: int,
                       k2: int, interpret: bool = False) -> jax.Array:
    """One real plane: (Kp, C) -> (k2, C); Kp must divide by d2."""
    kp, c = part.shape
    m2 = len(h2) // d2
    assert kp % d2 == 0, (kp, d2)
    rows = kp // d2                     # = k2 + m2 - 1
    tiles = _pick_tiles(k2, c, d2, m2)
    if tiles is None:
        raise ValueError("no valid tiling")
    tk, tc = tiles
    span = tk + m2 - 1                  # window rows per program
    # Mosaic requires every tiled-axis slice (even a full-dim one) to
    # align to the (8, 128) tile: pad d2 (31 -> 32) with zero taps
    d2p = ((d2 + 7) // 8) * 8
    y3 = part.reshape(rows, d2, c)
    if d2p != d2:
        y3 = jnp.pad(y3, ((0, 0), (0, d2p - d2), (0, 0)))
    h2pad = np.zeros((m2, d2p), np.float32)
    h2pad[:, :d2] = np.asarray(h2, np.float32).reshape(m2, d2)
    h2p = jnp.asarray(h2pad)

    def kernel(y_hbm, h_ref, out_ref):
        k = pl.program_id(0)
        ci = pl.program_id(1)

        def body(scratch, sem):
            dma = pltpu.make_async_copy(
                y_hbm.at[pl.ds(k * tk, span), :,
                         pl.ds(ci * tc, tc)],
                scratch, sem)
            dma.start()
            dma.wait()
            z = scratch[:]
            # accumulate in (tk, d2p, tc) and reduce ONCE at the end —
            # per-iteration cross-sublane reduces were the bottleneck
            acc = z[0:tk] * h_ref[0][None, :, None]
            for i in range(1, m2):
                acc = acc + z[i:i + tk] * h_ref[i][None, :, None]
            out_ref[:] = jnp.sum(acc, axis=1)

        pl.run_scoped(
            body,
            scratch=pltpu.VMEM((span, d2p, tc), jnp.float32),
            sem=pltpu.SemaphoreType.DMA(()),
        )

    grid = (k2 // tk, c // tc)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((m2, d2p), lambda k, ci: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tk, tc), lambda k, ci: (k, ci),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k2, c), jnp.float32),
        interpret=interpret,
    )(y3, h2p)


def stage2_pallas(y_ext: Cplx, h2: np.ndarray, d2: int, k2: int,
                  interpret: bool = False) -> Cplx:
    return Cplx(
        stage2_pallas_part(y_ext.re, h2, d2, k2, interpret),
        stage2_pallas_part(y_ext.im, h2, d2, k2, interpret))


def stage2_pallas_supported(kp: int, c: int, d2: int, l2: int) -> bool:
    m2 = l2 // d2
    k2 = (kp - (l2 - d2)) // d2
    if kp % d2:
        return False
    return _pick_tiles(k2, c, d2, m2) is not None


# ---------------------------------------------------------------------------
# fused NCO-rotator + stage-2 decimator
# ---------------------------------------------------------------------------
# The separate rotator pass costs a full read+write of the ~2 GB
# stage-1 output at C=4096 (measured 29 ms of the 123 ms block).
# Decomposing the per-sample rotation phase as
#     phase[n, c] = base[n // (tk*d2), c] + step[(n // d2) % tk', c]
#                   + D[n % d2, c]
# aligns every factor with the kernel's (grid row, window row, in-row,
# channel) axes, so all three tables arrive as SMALL auto-pipelined
# VMEM blocks; the kernel takes cos/sin of the small tables only and
# rotates each input element in VMEM right before the tap reduction —
# the rotator becomes pure VPU work on data that was already resident.
#
# Toolchain constraint (measured on this axon build): a kernel may
# issue only ONE manual async copy — two DMAs in any arrangement
# crash the remote Mosaic compile.  The re/im planes therefore ride
# ONE buffer in a tile-paired column layout (re tile j, im tile j,
# re tile j+1, ...), produced for free by permuting the stage-1 BANK
# columns (`channelizer.pack_bank`) so the single (K, L1) x (L1, 2C)
# matmul writes the packed layout directly.

def _pick_tiles_rot(k2: int, c: int, d2: int, m2: int,
                    vmem_budget: int = 7 * 1024 * 1024
                    ) -> tuple[int, int] | None:
    """Tiling for the fused kernel: packed planes + rot tables.

    The budget is deliberately under 8 MB: larger manual-DMA
    scratches crash this toolchain's Mosaic build (measured: a 9.1 MB
    scratch fails, 5.5 MB compiles)."""
    d2p = ((d2 + 7) // 8) * 8
    for tc in (128, 256, 64):
        if c % tc:
            continue
        for tk in (256, 128, 512, 64):
            if k2 % tk:
                continue
            span = tk + m2 - 1
            cost = span * d2p * 2 * tc * 4        # packed z
            cost += 2 * span * tc * 4             # rot tables
            if cost <= vmem_budget:
                return tk, tc
    return None


def stage2_rot_tiles(k2: int, c: int, d2: int,
                     l2: int) -> tuple[int, int] | None:
    """Public tiling query: (tk, tc) or None.  The caller needs ``tc``
    to pack the bank columns (`channelizer.pack_bank`)."""
    return _pick_tiles_rot(k2, c, d2, l2 // d2)


def stage2_rot_pallas(y_packed: jax.Array, phi0_limbs: jax.Array,
                      dphi_limbs: jax.Array, h2: np.ndarray, d2: int,
                      k2: int, interpret: bool = False) -> Cplx:
    """Rotate-and-decimate the PACKED stage-1 output.

    ``y_packed``: (Kp, 2C) float32 in tile-paired column layout (see
    `channelizer.pack_bank`); ``phi0_limbs``/``dphi_limbs``: (C, 3)
    48-bit limb phase of sample 0 and per-sample increment.  Each
    element is rotated by exp(-2j*pi*(phi0 + n*dphi)) before the
    shared-tap reduction — identical math to
    `channelizer.stage1_apply`'s rotator + `_stage2_poly`.
    """
    from . import nco
    kp, c2 = y_packed.shape
    c = c2 // 2
    m2 = len(h2) // d2
    assert kp % d2 == 0, (kp, d2)
    rows = kp // d2
    tiles = _pick_tiles_rot(k2, c, d2, m2)
    if tiles is None:
        raise ValueError("no valid tiling (fused)")
    tk, tc = tiles
    span = tk + m2 - 1
    span_pad = ((span + 7) // 8) * 8
    d2p = ((d2 + 7) // 8) * 8
    grid_k = k2 // tk

    # rotation tables (all small; exact limb math):
    #   phase[n, c] = rowph[n // (tk*d2), (n // d2) % span-window]
    #                 + dd[n % d2]
    # rowph: per grid window, the phase of each of its span rows
    # (grid_k x span_pad x C ~ 37 MB at C=4096 — tiny next to the
    # 2 GB data); dd: in-row sample ramp.
    dphi_row = nco.limb_scale(dphi_limbs, d2)
    base = nco.phase_ramp(phi0_limbs,
                          nco.limb_scale(dphi_row, tk), grid_k)
    step = nco.phase_ramp(jnp.zeros_like(dphi_limbs), dphi_row,
                          span_pad)
    rowph = base[:, None, :] + step[None, :, :]   # (grid_k, span_pad, C)
    dd = nco.phase_ramp(jnp.zeros_like(dphi_limbs), dphi_limbs, d2)
    if d2p != d2:
        dd = jnp.pad(dd, ((0, d2p - d2), (0, 0)))

    y3 = y_packed.reshape(rows, d2, 2 * c)
    if d2p != d2:
        y3 = jnp.pad(y3, ((0, 0), (0, d2p - d2), (0, 0)))
    h2pad = np.zeros((m2, d2p), np.float32)
    h2pad[:, :d2] = np.asarray(h2, np.float32).reshape(m2, d2)
    h2p = jnp.asarray(h2pad)
    two_pi = np.float32(-2.0 * np.pi)

    def kernel(y_hbm, u_ref, d_ref, h_ref, or_ref, oi_ref):
        k = pl.program_id(0)
        ci = pl.program_id(1)

        def body(z, sem):
            dma = pltpu.make_async_copy(
                y_hbm.at[pl.ds(k * tk, span), :,
                         pl.ds(ci * (2 * tc), 2 * tc)],
                z, sem)
            dma.start()
            dma.wait()
            ang_u = two_pi * u_ref[0, 0:span]          # (span, tc)
            ang_d = two_pi * d_ref[:]                  # (d2p, tc)
            c_u, s_u = jnp.cos(ang_u), jnp.sin(ang_u)
            c_d, s_d = jnp.cos(ang_d), jnp.sin(ang_d)
            cc = c_u[:, None, :] * c_d[None] - s_u[:, None, :] * s_d[None]
            ss = c_u[:, None, :] * s_d[None] + s_u[:, None, :] * c_d[None]
            zr = z[:, :, 0:tc]
            zi = z[:, :, tc:2 * tc]
            vr = zr * cc - zi * ss
            vi = zr * ss + zi * cc
            acc_r = vr[0:tk] * h_ref[0][None, :, None]
            acc_i = vi[0:tk] * h_ref[0][None, :, None]
            for i in range(1, m2):
                acc_r = acc_r + vr[i:i + tk] * h_ref[i][None, :, None]
                acc_i = acc_i + vi[i:i + tk] * h_ref[i][None, :, None]
            or_ref[:] = jnp.sum(acc_r, axis=1)
            oi_ref[:] = jnp.sum(acc_i, axis=1)

        pl.run_scoped(
            body,
            z=pltpu.VMEM((span, d2p, 2 * tc), jnp.float32),
            sem=pltpu.SemaphoreType.DMA(()),
        )

    out_r, out_i = pl.pallas_call(
        kernel,
        grid=(grid_k, c // tc),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, span_pad, tc), lambda k, ci: (k, 0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d2p, tc), lambda k, ci: (0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m2, d2p), lambda k, ci: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tk, tc), lambda k, ci: (k, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, tc), lambda k, ci: (k, ci),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((k2, c), jnp.float32),
                   jax.ShapeDtypeStruct((k2, c), jnp.float32)],
        interpret=interpret,
    )(y3, rowph, dd, h2p)
    return Cplx(out_r, out_i)


def stage2_rot_supported(kp: int, c: int, d2: int, l2: int) -> bool:
    m2 = l2 // d2
    k2 = (kp - (l2 - d2)) // d2
    if kp % d2:
        return False
    return _pick_tiles_rot(k2, c, d2, m2) is not None
