"""Full-step channels-vs-C sweep on the real chip.

For each C the FULL jitted receiver block (DDC + passband + demod +
taps) runs with device-resident input; reports synced and streaming
(8-deep state-donated chain) wall per block and the realtime factor.
This is the single-chip curve SCALING.md combines with the
sharding-overhead measurement (tools/scaling_cpu.py) to project
multi-chip throughput.

Run: python tools/scaling_tpu.py           (C sweep 512..4096)
Env: SCALE_CS="512,1024" SCALE_BLOCK=2048 SCALE_PIPE=8
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


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run_one(C: int, block: int, pipe: int) -> dict:
    import jax
    import jax.numpy as jnp
    from flydog_sdr_gps_tpu.models import rx_channel as rx
    from flydog_sdr_gps_tpu.ops import demod
    from flydog_sdr_gps_tpu.numerology import ADC_CLOCK_NOM

    params = rx.RxParams(num_channels=C, audio_block=block)
    modes = ([demod.MODE_USB, demod.MODE_AM, demod.MODE_LSB,
              demod.MODE_NBFM] * C)[:C]
    tuning = rx.default_tuning(params, modes=modes)
    state = rx.init_state(params)
    rng = np.random.default_rng(1)
    nb = params.ddc.adc_block
    t = np.arange(nb) / ADC_CLOCK_NOM
    x = jax.device_put(jnp.asarray(
        (0.2 * np.cos(2 * np.pi * ((7.1e6 * t) % 1.0))
         + 0.05 * rng.standard_normal(nb)).astype(np.float32)))
    step = jax.jit(lambda s, tun, xb: rx.rx_block(params, s, tun, xb),
                   donate_argnums=(0,))
    t0 = time.time()
    state, taps = step(state, tuning, x)
    np.asarray(taps.smeter_dbm)
    compile_s = time.time() - t0
    walls = []
    for _ in range(5):
        t0 = time.time()
        state, taps = step(state, tuning, x)
        np.asarray(taps.smeter_dbm)
        walls.append(time.time() - t0)
    wall = min(walls)
    t0 = time.time()
    for _ in range(pipe):
        state, taps = step(state, tuning, x)
    np.asarray(taps.smeter_dbm)
    wall_stream = (time.time() - t0) / pipe
    rf = block * params.ddc.total_decim / ADC_CLOCK_NOM
    row = dict(C=C, block=block,
               wall_ms=round(wall * 1e3, 1),
               wall_stream_ms=round(wall_stream * 1e3, 1),
               rf_ms=round(rf * 1e3, 1),
               rt_factor=round(rf / wall_stream, 3),
               channels=round(C * rf / wall_stream, 1),
               compile_s=round(compile_s, 1))
    log(row)
    return row


def main():
    cs = [int(c) for c in os.environ.get(
        "SCALE_CS", "512,1024,2048,4096").split(",")]
    block = int(os.environ.get("SCALE_BLOCK", "2048"))
    pipe = int(os.environ.get("SCALE_PIPE", "8"))
    rows = [run_one(C, block, pipe) for C in cs]
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
