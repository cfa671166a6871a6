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
SURVEY.md section 7 "125 Msps ingest").  Steady-state wall time per
42.7 ms RF block gives the realtime factor; channels_rt = C * factor.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

REFERENCE_CHANNELS = 14.0      # rx14: most channels/device the ref runs


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from flydog_sdr_gps_tpu.models import rx_channel as rx
    from flydog_sdr_gps_tpu.ops import demod
    from flydog_sdr_gps_tpu.numerology import ADC_CLOCK_NOM

    dev = jax.devices()[0]
    log(f"bench device: {dev}")

    C = 1024
    params = rx.RxParams(num_channels=C, audio_block=512)
    modes = ([demod.MODE_USB, demod.MODE_AM, demod.MODE_LSB,
              demod.MODE_NBFM] * C)[:C]
    log(f"building tuning for {C} channels ...")
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
    log("compiling ...")
    t0 = time.time()
    state, taps = step(state, tuning, x)
    jax.block_until_ready(taps.audio)
    log(f"compile+first block: {time.time()-t0:.1f}s")

    def hard_sync(arr):
        # block_until_ready on the axon tunnel can return before the
        # computation finishes; a scalar fetch is a true round-trip
        return float(jnp.sum(arr))

    # warmup + measure
    for _ in range(2):
        state, taps = step(state, tuning, x)
    hard_sync(taps.smeter_dbm)
    n_iter = 10
    t0 = time.time()
    for _ in range(n_iter):
        state, taps = step(state, tuning, x)
    hard_sync(taps.smeter_dbm)
    wall = (time.time() - t0) / n_iter

    rf_sec = nb / ADC_CLOCK_NOM
    factor = rf_sec / wall
    channels_rt = C * factor
    log(f"steady state: {wall*1e3:.2f} ms / {rf_sec*1e3:.1f} ms RF "
        f"block at C={C} -> {factor:.2f}x realtime "
        f"-> {channels_rt:.0f} realtime channels/chip")
    # sanity: audio must be finite
    assert bool(jnp.all(jnp.isfinite(taps.audio))), "non-finite audio"

    print(json.dumps({
        "metric": "realtime_ddc_demod_channels_per_chip",
        "value": round(float(channels_rt), 1),
        "unit": "channels@12kHz",
        "vs_baseline": round(float(channels_rt) / REFERENCE_CHANNELS, 2),
    }))


if __name__ == "__main__":
    main()
