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


def test_stage2_rot_pallas_matches_rotate_then_poly():
    """The fused rotator+decimator == stage-1 rotator followed by the
    poly reference, for non-trivial per-channel phases."""
    from flydog_sdr_gps_tpu.ops import nco
    plan = chz.make_ddc_plan(audio_block=512)
    c = 128
    rng = np.random.default_rng(1)
    kp = plan.k1 + plan.tail2
    assert plan.tail2 % plan.d2 == 0
    y = cplx_ops.Cplx(
        jnp.asarray(rng.standard_normal((kp, c)).astype(np.float32)),
        jnp.asarray(rng.standard_normal((kp, c)).astype(np.float32)))
    phi0 = nco.to_limbs(rng.integers(0, 1 << 48, c, dtype=np.uint64)
                        .astype(object))
    dphi = nco.to_limbs(rng.integers(0, 1 << 48, c, dtype=np.uint64)
                        .astype(object))
    # reference: rotate every sample by exp(-2j*pi*(phi0 + n*dphi))
    # with the exact limb ramp, then the poly decimator
    cyc = nco.phase_ramp_long(jnp.asarray(phi0), jnp.asarray(dphi), kp)
    ang = -2.0 * np.pi * np.asarray(cyc)
    cr, sr = np.cos(ang), np.sin(ang)
    yr = np.asarray(y.re)
    yi = np.asarray(y.im)
    rot = cplx_ops.Cplx(jnp.asarray(yr * cr - yi * sr),
                        jnp.asarray(yr * sr + yi * cr))
    ref = chz.stage2_apply(plan, rot, method="poly")
    assert pk.stage2_rot_supported(kp, c, plan.d2, plan.l2)
    k2 = (kp - plan.tail2) // plan.d2
    _, tc = pk.stage2_rot_tiles(k2, c, plan.d2, plan.l2)
    y_packed = chz.pack_cols(y, tc)
    # round-trip of the packed layout
    back = chz.unpack_cols(y_packed, tc)
    np.testing.assert_array_equal(np.asarray(back.re), yr)
    np.testing.assert_array_equal(np.asarray(back.im), yi)
    got = pk.stage2_rot_pallas(y_packed, jnp.asarray(phi0),
                               jnp.asarray(dphi), plan.h2, plan.d2,
                               k2, interpret=True)
    scale = float(np.abs(np.asarray(ref.re)).max())
    np.testing.assert_allclose(np.asarray(got.re), np.asarray(ref.re),
                               atol=2e-4 * scale)
    np.testing.assert_allclose(np.asarray(got.im), np.asarray(ref.im),
                               atol=2e-4 * scale)


def test_rx_block_fused_stage2_matches_default():
    """rx_block with stage2='pallas_rot' (interpret on CPU) equals the
    default path over multiple blocks (carry semantics included)."""
    import jax
    from flydog_sdr_gps_tpu.models import rx_channel as rx
    from flydog_sdr_gps_tpu.ops import demod
    rng = np.random.default_rng(2)
    kw = dict(num_channels=64, audio_block=128)
    pa = rx.RxParams(**kw)
    pb = rx.RxParams(stage2="pallas_rot", **kw)
    freqs = [7.1e6 + 13e3 * i for i in range(64)]
    ta = rx.default_tuning(pa, freqs_hz=freqs,
                           modes=[demod.MODE_USB] * 64)
    tb = rx.default_tuning(pb, freqs_hz=freqs,
                           modes=[demod.MODE_USB] * 64)
    sa = rx.init_state(pa)
    sb = rx.init_state(pb)
    assert rx._use_fused_stage2(pb)
    step_a = jax.jit(lambda s, x: rx.rx_block(pa, s, ta, x))
    step_b = jax.jit(lambda s, x: rx.rx_block(pb, s, tb, x))
    for blk in range(3):
        x = jnp.asarray(0.3 * rng.standard_normal(pa.ddc.adc_block)
                        .astype(np.float32))
        sa, taps_a = step_a(sa, x)
        sb, taps_b = step_b(sb, x)
        aa = np.asarray(taps_a.audio)
        ab = np.asarray(taps_b.audio)
        # the two paths use different rotator decompositions, so tiny
        # float32 rounding differences are expected (and pass through
        # the demod nonlinearity); bound them absolutely
        tol = 2e-4 * max(np.abs(aa).max(), 1e-6) + 5e-5
        np.testing.assert_allclose(ab, aa, atol=tol,
                                   err_msg=f"block {blk}")
