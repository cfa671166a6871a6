"""Benchmark: realtime 12 kHz DDC+demod channels per TPU chip.

Headline metric of BASELINE.md: how many simultaneous full receiver
channels (125 Msps -> DDC -> passband -> AGC -> demod -> 12 kHz audio)
one chip sustains in real time.  The reference hardware (BeagleBone +
Artix-7) tops out at 14 channels (rx14 firmware, `main.cpp:346-395`);
the north star is >= 1000/chip on TPU v5e.

Method: run the full jitted receiver block program at C channels with
a device-resident ADC block (the production ingest path generates or
replays samples on-device — the axon host tunnel is ~1.4 GB/s, far
below the 500 MB/s-per-stream the wideband input needs, see
SURVEY.md section 7 "125 Msps ingest").

Timing on the axon dev tunnel is hostile: per-dispatch latency is tens
of ms and varies, deep async queues can wedge the link, and every
fresh jit goes through a remote compile helper that can take minutes
when loaded.  So the measurement is a TWO-POINT fit: the same pipeline
is timed (fully synced, depth-1) at audio_block=512 and 2048; compute
scales 4x with block size while the per-dispatch latency L is
constant, so

    wall_512  = c + L
    wall_2048 = 4c + L   =>   c = (wall_2048 - wall_512) / 3

which recovers the pure device time per 42.7 ms of RF.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REFERENCE_CHANNELS = 14.0      # rx14: most channels/device the ref runs
C = int(os.environ.get("BENCH_C", "2048"))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build(audio_block: int):
    import jax
    import jax.numpy as jnp
    from flydog_sdr_gps_tpu.models import rx_channel as rx
    from flydog_sdr_gps_tpu.ops import demod
    from flydog_sdr_gps_tpu.numerology import ADC_CLOCK_NOM

    params = rx.RxParams(num_channels=C, audio_block=audio_block)
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


def measure(audio_block: int, iters: int = 6) -> float:
    """Best-of fully-synced wall time per block (seconds)."""
    import jax
    params, state, tuning, x, step = build(audio_block)
    log(f"audio_block={audio_block}: compiling ...")
    t0 = time.time()
    state, taps = step(state, tuning, x)
    sm = np.asarray(taps.smeter_dbm)        # true round-trip sync
    log(f"  compile+first block: {time.time()-t0:.1f}s")
    assert np.all(np.isfinite(np.asarray(taps.audio))), "non-finite"
    best = float("inf")
    for i in range(iters):
        t0 = time.time()
        state, taps = step(state, tuning, x)
        np.asarray(taps.smeter_dbm)
        dt = time.time() - t0
        best = min(best, dt)
        log(f"  iter {i}: {dt*1e3:.1f} ms")
    return best


def main():
    import jax
    from flydog_sdr_gps_tpu.numerology import ADC_CLOCK_NOM

    log(f"bench device: {jax.devices()[0]}")
    wall_512 = measure(512)
    wall_2048 = measure(2048)
    compute_512 = max((wall_2048 - wall_512) / 3.0, 1e-4)
    latency = max(wall_512 - compute_512, 0.0)
    rf_sec = 512 * 10416 / ADC_CLOCK_NOM
    factor = rf_sec / compute_512
    channels_rt = C * factor
    log(f"two-point fit: compute {compute_512*1e3:.2f} ms / "
        f"{rf_sec*1e3:.1f} ms RF block, dispatch latency "
        f"{latency*1e3:.1f} ms -> {factor:.2f}x realtime at C={C} "
        f"-> {channels_rt:.0f} realtime channels/chip")

    print(json.dumps({
        "metric": "realtime_ddc_demod_channels_per_chip",
        "value": round(float(channels_rt), 1),
        "unit": "channels@12kHz",
        "vs_baseline": round(float(channels_rt) / REFERENCE_CHANNELS, 2),
    }))


if __name__ == "__main__":
    main()
