"""Per-stage device-time breakdown of the C=4096 receiver block.

Times each pipeline stage as its own jitted program on the real chip
(best-of-N, fully synced, null-dispatch latency subtracted):

  stage1  — (K, L1) x (L1, 2C) filter-bank matmul + limb-NCO rotator
  stage1_matmul — the matmul alone (no rotator)
  stage2  — fs1 -> 12 kHz decimator (Pallas on TPU)
  backhalf — FastFIR passband + demod + AGC + NR + taps
  full    — the complete rx_block (cross-check: ~ sum of stages)

Writes the table to stderr and a JSON line to stdout.

Env: PROF_C (default 4096), PROF_BLOCK (2048), PROF_ITERS (6).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
from flydog_sdr_gps_tpu.utils.jax_cache import \
    enable_persistent_cache  # noqa: E402
enable_persistent_cache()

import numpy as np

C = int(os.environ.get("PROF_C", "4096"))
BLOCK = int(os.environ.get("PROF_BLOCK", "2048"))
ITERS = int(os.environ.get("PROF_ITERS", "6"))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed(fn, sync, iters=ITERS):
    sync(fn())                    # compile + warm
    best = float("inf")
    for _ in range(iters):
        t0 = time.time()
        sync(fn())
        best = min(best, time.time() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp
    from flydog_sdr_gps_tpu.models import rx_channel as rx
    from flydog_sdr_gps_tpu.ops import channelizer as chz
    from flydog_sdr_gps_tpu.ops import cplx as cplx_ops
    from flydog_sdr_gps_tpu.ops import demod
    from flydog_sdr_gps_tpu.numerology import ADC_CLOCK_NOM

    dev = jax.devices()[0]
    log(f"device: {dev} kind={dev.device_kind} C={C} block={BLOCK}")
    params = rx.RxParams(num_channels=C, audio_block=BLOCK)
    plan = params.ddc
    modes = ([demod.MODE_USB, demod.MODE_AM, demod.MODE_LSB,
              demod.MODE_NBFM] * C)[:C]
    tuning = rx.default_tuning(params, modes=modes)
    state = rx.init_state(params)
    rng = np.random.default_rng(1)
    nb = plan.adc_block
    x = jax.device_put(jnp.asarray(
        (0.1 * rng.standard_normal(nb)).astype(np.float32)))

    prec = jax.lax.Precision.HIGH

    # ---- inputs for isolated stages (device-resident) ----
    x_ext = jnp.concatenate([state.ddc.x_tail, x])
    s1 = jax.jit(lambda xe: chz.stage1_apply(
        plan, xe, tuning.bank_r, tuning.bank_i,
        state.ddc.phi1, tuning.dphi1, precision=prec))
    s1_mm = jax.jit(lambda xe: (
        lambda f: (jnp.dot(f, tuning.bank_r, precision=prec),
                   jnp.dot(f, tuning.bank_i, precision=prec)))(
        chz.frame(xe, plan.d1, plan.m1)))
    y1 = s1(x_ext)
    y_ext = cplx_ops.concatenate([state.ddc.y_tail, y1], axis=0)
    y_ext = jax.device_put(y_ext)
    s2 = jax.jit(lambda ye: chz.stage2_apply(
        plan, ye, method=params.stage2))
    iq = s2(y_ext)
    iq = jax.device_put(iq)
    bh = jax.jit(lambda i: rx.audio_back_half(
        params, state, tuning, i)[1].smeter_dbm)
    full = jax.jit(lambda s, xb: rx.rx_block(params, s, tuning, xb))

    def sync_cplx(v):
        np.asarray(v.re[0, :8] if hasattr(v, "re") else v[0])

    # null dispatch
    tiny = jax.jit(lambda v: jnp.sum(v) * 1.000001)
    buf = jnp.ones((8,), jnp.float32)
    float(tiny(buf))
    lat = min(timed(lambda: tiny(buf), lambda r: float(r), 10), 1.0)
    log(f"null dispatch: {lat*1e3:.1f} ms")

    res = {}

    def run(name, fn, sync):
        log(f"timing {name} ...")
        try:
            res[name] = timed(fn, sync)
            log(f"  {name}: {res[name]*1e3:.2f} ms wall")
        except Exception as e:                    # noqa: BLE001
            log(f"  {name} FAILED: {type(e).__name__}: {e}")

    run("stage1_matmul", lambda: s1_mm(x_ext),
        lambda r: np.asarray(r[0][0, :8]))
    run("stage1", lambda: s1(x_ext), sync_cplx)
    run("stage2", lambda: s2(y_ext), sync_cplx)
    # fused rotator+stage2 (what the auto path uses on TPU): packed
    # layout + single-DMA kernel
    from flydog_sdr_gps_tpu.ops import pallas_kernels as pk
    from flydog_sdr_gps_tpu.ops import nco
    phi_ext0 = nco.limb_add(
        state.ddc.phi1,
        nco.limb_neg(nco.advance(jnp.zeros_like(tuning.dphi1),
                                 tuning.dphi1, plan.tail2)))
    k2 = (y_ext.shape[0] - plan.tail2) // plan.d2
    _, tcr = pk.stage2_rot_tiles(k2, C, plan.d2, plan.l2)
    y_packed = jax.device_put(jax.jit(
        lambda v: chz.pack_cols(v, tcr))(y_ext))
    s2f = jax.jit(lambda yp, phi: pk.stage2_rot_pallas(
        yp, phi, tuning.dphi1, plan.h2, plan.d2, k2))
    run("stage2_fused_rot", lambda: s2f(y_packed, phi_ext0), sync_cplx)
    run("backhalf", lambda: bh(iq), lambda r: np.asarray(r[:8]))
    run("full", lambda: full(state, x)[1].smeter_dbm,
        lambda r: np.asarray(r[:8]))

    rf_ms = BLOCK * plan.total_decim / ADC_CLOCK_NOM * 1e3
    out = {"C": C, "block": BLOCK, "rf_ms": round(rf_ms, 2),
           "dispatch_ms": round(lat * 1e3, 2)}
    tot = 0.0
    for k, v in res.items():
        dev_ms = max((v - lat) * 1e3, 0.0)
        out[k + "_ms"] = round(dev_ms, 2)
        if k in ("stage1", "stage2", "backhalf"):
            tot += dev_ms
    out["sum_stages_ms"] = round(tot, 2)
    if "stage1_ms" in out and "stage1_matmul_ms" in out:
        out["rotator_ms"] = round(out["stage1_ms"]
                                  - out["stage1_matmul_ms"], 2)
    for k, v in out.items():
        log(f"  {k}: {v}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
