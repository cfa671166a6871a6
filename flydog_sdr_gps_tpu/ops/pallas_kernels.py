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
