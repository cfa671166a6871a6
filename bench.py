"""Benchmark: realtime 12 kHz DDC+demod channels per TPU chip.

Headline metric of BASELINE.md: how many simultaneous full receiver
channels (125 Msps -> DDC -> passband -> AGC -> demod -> 12 kHz audio)
one chip sustains in real time.  The reference hardware (BeagleBone +
Artix-7) tops out at 14 channels (rx14 firmware, `main.cpp:346-395`);
the north star is >= 1000/chip on TPU v5e.

Method (round 3 -- MEASURED, not extrapolated): run the full jitted
receiver block program at C=4096 channels end-to-end with a
device-resident ADC block (the production ingest path generates or
replays samples on-device -- the axon host tunnel is ~1.4 GB/s, far
below the 500 MB/s-per-stream the wideband input needs, see
SURVEY.md section 7 "125 Msps ingest").  Two realtime factors are
measured: SYNCED (one block dispatched and fetched at a time --
includes the full per-dispatch tunnel latency) and STREAMING (8
blocks chained via state donation, synced once -- dispatch overlaps
compute, exactly how the serving block_loop runs).  The headline is
C * streaming factor.  A separately measured null-dispatch latency
gives the device-time view, and XLA's compiled cost analysis gives
FLOPs for an MFU figure.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} plus
a "detail" sub-object (wall times, dispatch latency, TFLOP/s, MFU).

Env knobs: BENCH_C (default 4096), BENCH_BLOCK (audio samples per
block, default 2048), BENCH_ITERS (default 8), BENCH_STAGE2
(poly|pallas|fft, default from RxParams).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REFERENCE_CHANNELS = 14.0      # rx14: most channels/device the ref runs
C = int(os.environ.get("BENCH_C", "4096"))
BLOCK = int(os.environ.get("BENCH_BLOCK", "2048"))
ITERS = int(os.environ.get("BENCH_ITERS", "8"))

# persistent compile cache: first compile of the C=4096 program through
# the axon remote-compile helper is minutes; reruns should be seconds.
from flydog_sdr_gps_tpu.utils.jax_cache import \
    enable_persistent_cache  # noqa: E402
enable_persistent_cache()

# chip peak dense-matmul throughput (bf16, FLOP/s) by device kind --
# public numbers; used only for the MFU denominator.
PEAK_BF16 = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v5p": 459e12,
    "TPU v5": 459e12,
    "TPU v6 lite": 918e12,
    "TPU v6e": 918e12,
}


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build(audio_block: int):
    import jax
    import jax.numpy as jnp
    from flydog_sdr_gps_tpu.models import rx_channel as rx
    from flydog_sdr_gps_tpu.ops import demod
    from flydog_sdr_gps_tpu.numerology import ADC_CLOCK_NOM

    kwargs = {}
    s2 = os.environ.get("BENCH_STAGE2")
    if s2:
        kwargs["stage2"] = s2
    params = rx.RxParams(num_channels=C, audio_block=audio_block,
                         **kwargs)
    modes = ([demod.MODE_USB, demod.MODE_AM, demod.MODE_LSB,
              demod.MODE_NBFM] * C)[:C]
    tuning = rx.default_tuning(params, modes=modes)
    state = rx.init_state(params)
    rng = np.random.default_rng(1)
    nb = params.ddc.adc_block
    t = np.arange(nb) / ADC_CLOCK_NOM
    x_np = (0.2 * np.cos(2 * np.pi * ((7.1e6 * t) % 1.0))
            + 0.05 * rng.standard_normal(nb)).astype(np.float32)
    x = jax.device_put(jnp.asarray(x_np))
    step = jax.jit(lambda s, tun, xb: rx.rx_block(params, s, tun, xb),
                   donate_argnums=(0,))
    return params, state, tuning, x, step


def null_dispatch_latency(iters: int = 12) -> float:
    """Round-trip wall time of a trivial jitted op: the per-dispatch
    overhead of the (possibly tunneled) runtime, measured -- used to
    derive the device-time view, NOT the headline."""
    import jax
    import jax.numpy as jnp
    tiny = jax.jit(lambda v: jnp.sum(v) * 1.000001)
    buf = jnp.ones((8,), jnp.float32)
    float(tiny(buf))                     # compile
    best = float("inf")
    for _ in range(iters):
        t0 = time.time()
        float(tiny(buf))
        best = min(best, time.time() - t0)
    return best


def main():
    import jax
    from flydog_sdr_gps_tpu.numerology import ADC_CLOCK_NOM

    dev = jax.devices()[0]
    log(f"bench device: {dev} ({dev.device_kind})")
    params, state, tuning, x, step = build(BLOCK)

    log(f"C={C} audio_block={BLOCK}: compiling ...")
    t0 = time.time()
    lowered = step.lower(state, tuning, x)
    compiled = lowered.compile()
    compile_s = time.time() - t0
    log(f"  compile: {compile_s:.1f}s")
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", 0.0))
    except Exception as e:                    # pragma: no cover
        log(f"  cost_analysis unavailable: {e}")
        flops = 0.0

    state, taps = step(state, tuning, x)
    np.asarray(taps.smeter_dbm)               # true round-trip sync
    assert np.all(np.isfinite(np.asarray(taps.audio))), "non-finite"

    walls = []
    for i in range(ITERS):
        t0 = time.time()
        state, taps = step(state, tuning, x)
        np.asarray(taps.smeter_dbm)
        dt = time.time() - t0
        walls.append(dt)
        log(f"  iter {i}: {dt*1e3:.1f} ms")
    wall = min(walls)
    wall_med = float(np.median(walls))

    # STREAMING throughput: chain PIPE steps (state donation) and
    # sync once — the production block_loop dispatches the next block
    # while the previous runs, so per-dispatch latency overlaps
    # compute; this is the serving-rate number.
    PIPE = int(os.environ.get("BENCH_PIPE", "8"))
    t0 = time.time()
    for _ in range(PIPE):
        state, taps = step(state, tuning, x)
    np.asarray(taps.smeter_dbm)
    wall_stream = (time.time() - t0) / PIPE
    log(f"  streaming: {wall_stream*1e3:.1f} ms/block over {PIPE}")

    latency = null_dispatch_latency()
    device_t = max(wall - latency, 1e-6)

    rf_sec = BLOCK * params.ddc.total_decim / ADC_CLOCK_NOM
    factor = rf_sec / wall                     # dispatch INCLUDED
    factor_stream = rf_sec / wall_stream       # dispatch OVERLAPPED
    factor_dev = rf_sec / device_t
    channels_rt = C * factor_stream            # headline: streaming

    tflops_e2e = flops / wall / 1e12 if flops else 0.0
    tflops_dev = flops / device_t / 1e12 if flops else 0.0
    peak = next((v for k, v in PEAK_BF16.items()
                 if k.lower() in dev.device_kind.lower()), None)
    mfu = (flops / device_t / peak) if (flops and peak) else None

    log(f"measured: {wall*1e3:.1f} ms wall synced (median "
        f"{wall_med*1e3:.1f}), {wall_stream*1e3:.1f} ms streaming per "
        f"{rf_sec*1e3:.1f} ms RF -> {factor_stream:.2f}x realtime "
        f"streaming ({factor:.2f}x synced) at C={C} -> "
        f"{channels_rt:.0f} channels/chip")
    log(f"null-dispatch latency {latency*1e3:.1f} ms -> device-time "
        f"{device_t*1e3:.1f} ms, {factor_dev:.2f}x, "
        f"{C*factor_dev:.0f} channels device-limit")
    log(f"flops/block {flops:.3e} -> {tflops_e2e:.1f} TFLOP/s e2e, "
        f"{tflops_dev:.1f} TFLOP/s device"
        + (f", MFU {mfu*100:.1f}% of {peak/1e12:.0f} TF bf16 peak"
           if mfu is not None else ""))

    # serving bench: the SERVER path with live websocket clients and
    # autorun decoders (channels SERVED, not just computed); shares
    # the compiled engine program via the persistent jit cache
    serve = None
    serve128 = None
    mixed = None
    if os.environ.get("BENCH_SERVE", "1") != "0":
        del state, tuning, x, step, compiled, lowered, taps
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "tools"))
        from bench_serve import run_mixed_bench, run_serve_bench
        log("serve bench ...")
        serve = run_serve_bench()
        log(f"serve: {serve}")
        # high-listener-count leg (r4 verdict next-step #1: the
        # serving story must not stop at 32/64 listeners)
        if os.environ.get("BENCH_SERVE_128", "1") != "0":
            os.environ["BENCH_SERVE_CLIENTS"] = "128"
            os.environ["BENCH_SERVE_PORT"] = "18979"
            log("serve bench (128 clients) ...")
            serve128 = run_serve_bench()
            log(f"serve128: {serve128}")
        if os.environ.get("BENCH_MIXED", "1") != "0":
            # BASELINE config 5: audio + WF + GPS + autorun sharing
            # the chip concurrently
            log("mixed bench ...")
            mixed = run_mixed_bench()
            log(f"mixed: {mixed}")

    print(json.dumps({
        "metric": "realtime_ddc_demod_channels_per_chip",
        "value": round(float(channels_rt), 1),
        "unit": "channels@12kHz",
        "vs_baseline": round(float(channels_rt) / REFERENCE_CHANNELS, 2),
        "detail": {
            "C": C, "audio_block": BLOCK,
            "wall_ms_best": round(wall * 1e3, 2),
            "wall_ms_median": round(wall_med * 1e3, 2),
            "wall_ms_streaming": round(wall_stream * 1e3, 2),
            "rf_ms": round(rf_sec * 1e3, 2),
            "realtime_factor_measured": round(factor, 3),
            "realtime_factor_streaming": round(factor_stream, 3),
            "dispatch_latency_ms": round(latency * 1e3, 2),
            "channels_device_limit": round(C * factor_dev, 1),
            "compile_s": round(compile_s, 1),
            "flops_per_block": flops,
            "tflops_e2e": round(tflops_e2e, 2),
            "tflops_device": round(tflops_dev, 2),
            "mfu_vs_bf16_peak": (round(mfu, 4)
                                 if mfu is not None else None),
            "device_kind": dev.device_kind,
            "stage2": os.environ.get("BENCH_STAGE2", "default"),
            "serve": serve,
            "serve_128": serve128,
            "mixed": mixed,
        },
    }))


if __name__ == "__main__":
    main()
