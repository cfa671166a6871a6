"""Stage-2 decimator shootout: XLA poly vs Pallas vs FFT on the
real chip.

Decides the `RxParams.stage2` default with measured numbers (VERDICT
r1 item 10: "either make the kernel win and default, or record the
XLA-wins conclusion with numbers").  Results are recorded in
KERNELS.md.

Usage: python tools/kernel_bench.py [C ...]   (default 1024 2048 4096)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

from flydog_sdr_gps_tpu.utils.jax_cache import \
    enable_persistent_cache  # noqa: E402
enable_persistent_cache()

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from flydog_sdr_gps_tpu.ops import channelizer as chz
from flydog_sdr_gps_tpu.ops.cplx import Cplx
from flydog_sdr_gps_tpu.numerology import ADC_CLOCK_NOM, SND_RATE_12K

AUDIO_BLOCK = 2048
ITERS = 8


def log(*a):
    print(*a, flush=True)


def bench_method(plan, y_ext, method: str) -> float:
    fn = jax.jit(lambda y: chz.stage2_apply(plan, y, method=method))
    t0 = time.time()
    out = fn(y_ext)
    np.asarray(out.re[0, :4])
    compile_s = time.time() - t0
    best = float("inf")
    for _ in range(ITERS):
        t0 = time.time()
        out = fn(y_ext)
        np.asarray(out.re[0, :4])
        best = min(best, time.time() - t0)
    log(f"    {method:7s}: {best*1e3:8.2f} ms   (compile {compile_s:.1f}s)")
    return best


def main():
    cs = [int(a) for a in sys.argv[1:]] or [1024, 2048, 4096]
    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.device_kind})")
    plan = chz.make_ddc_plan(ADC_CLOCK_NOM, SND_RATE_12K, AUDIO_BLOCK)
    kp = plan.k1 + plan.tail2
    log(f"plan: d1={plan.d1} d2={plan.d2} l2={plan.l2} m2={plan.m2} "
        f"k1={plan.k1} kp={kp} k2={AUDIO_BLOCK}")
    rows = []
    for c in cs:
        rng = np.random.default_rng(0)
        y = Cplx(
            jnp.asarray(rng.standard_normal((kp, c)), jnp.float32),
            jnp.asarray(rng.standard_normal((kp, c)), jnp.float32))
        y = jax.device_put(y)
        # HBM traffic: poly reads the input ~m2 times; pallas once
        nbytes = 2 * kp * c * 4
        log(f"  C={c}: input {nbytes/1e6:.0f} MB "
            f"(poly rereads ~{plan.m2}x)")
        t_poly = bench_method(plan, y, "poly")
        try:
            t_pal = bench_method(plan, y, "pallas")
        except Exception as e:
            log(f"    pallas: FAILED ({e})")
            t_pal = float("nan")
        t_fft = bench_method(plan, y, "fft")
        rows.append((c, t_poly, t_pal, t_fft))
    log("\nC      poly ms   pallas ms   fft ms   pallas speedup")
    for c, tp, tl, tf in rows:
        log(f"{c:<6d} {tp*1e3:8.2f} {tl*1e3:10.2f} {tf*1e3:8.2f}"
            f"   {tp/tl:6.2f}x" if tl == tl else
            f"{c:<6d} {tp*1e3:8.2f}        n/a {tf*1e3:8.2f}")


if __name__ == "__main__":
    main()
