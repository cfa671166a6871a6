"""Pallas stage-2 kernel vs the XLA polyphase reference (interpret)."""

import numpy as np
import jax.numpy as jnp
import pytest

from flydog_sdr_gps_tpu.ops import channelizer as chz
from flydog_sdr_gps_tpu.ops import cplx as cplx_ops
from flydog_sdr_gps_tpu.ops import pallas_kernels as pk


def test_stage2_pallas_matches_poly_interpret():
    plan = chz.make_ddc_plan(audio_block=512)
    c = 128
    rng = np.random.default_rng(0)
    kp = plan.k1 + plan.tail2
    y = cplx_ops.Cplx(
        jnp.asarray(rng.standard_normal((kp, c)).astype(np.float32)),
        jnp.asarray(rng.standard_normal((kp, c)).astype(np.float32)))
    ref = chz.stage2_apply(plan, y, method="poly")
    assert pk.stage2_pallas_supported(kp, c, plan.d2, plan.l2)
    k2 = (kp - plan.tail2) // plan.d2
    got = pk.stage2_pallas(y, plan.h2, plan.d2, k2, interpret=True)
    np.testing.assert_allclose(np.asarray(got.re), np.asarray(ref.re),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(got.im), np.asarray(ref.im),
                               atol=1e-4)


def test_tiling_picker():
    # k2=512, C=1024, d2=31, m2=24 must have a tiling
    assert pk._pick_tiles(512, 1024, 31, 24) is not None
    # odd channel count: no tiling -> unsupported
    assert pk._pick_tiles(512, 100, 31, 24) is None
