"""Strong-scaling shape on the virtual CPU mesh.

Fixed TOTAL work (C channels, one ADC block) measured on a 1-device
run vs a (time=2, chan=4) 8-device shard_map — same program the
multi-chip path compiles.  On a time-shared CPU host the 8 "devices"
compete for the same cores, so the WALL time cannot show real
speedup; what this measures is the sharding OVERHEAD (collectives +
halo exchange + partition bookkeeping) as the ratio of total
device-work to the single-device baseline.  The real-chip scaling
projection combines this overhead ratio with the single-chip
channels-vs-C curve (tools/scaling_tpu.py).

Run: python tools/scaling_cpu.py  (forces CPU + 8 virtual devices)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass

import numpy as np
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed(fn, sync, iters=5):
    sync(fn())
    best = float("inf")
    for _ in range(iters):
        t0 = time.time()
        sync(fn())
        best = min(best, time.time() - t0)
    return best


def main():
    from flydog_sdr_gps_tpu.models import rx_channel as rx
    from flydog_sdr_gps_tpu import parallel

    C = int(os.environ.get("SCALE_C", "64"))
    block = int(os.environ.get("SCALE_BLOCK", "512"))
    params = rx.RxParams(num_channels=C, audio_block=block)
    rng = np.random.default_rng(0)
    x_np = (0.1 * rng.standard_normal(params.ddc.adc_block)
            ).astype(np.float32)

    out = {"C": C, "block": block, "n_devices": len(jax.devices())}

    # --- single device ---
    tuning = rx.default_tuning(params)
    state = rx.init_state(params)
    step1 = jax.jit(lambda s, t, x: rx.rx_block(params, s, t, x))
    x = jnp.asarray(x_np)
    t1 = timed(lambda: step1(state, tuning, x)[1].smeter_dbm,
               lambda r: np.asarray(r))
    out["wall_1dev_ms"] = round(t1 * 1e3, 1)
    log(f"1 device: {t1*1e3:.1f} ms")

    # --- (time=2, chan=4) 8-device shard_map, same total work ---
    mesh = parallel.make_mesh(time=2)
    tun_s = parallel.shard_rx_tuning(rx.default_tuning(params), mesh)
    step8 = parallel.make_sharded_rx_step(params, mesh)
    holder = {"s": parallel.shard_rx_state(rx.init_state(params),
                                           mesh, params)}

    def one_step():
        # the sharded step donates its state: thread it through
        s, taps = step8(holder["s"], tun_s, x)
        holder["s"] = s
        return taps.smeter_dbm
    t8 = timed(one_step, lambda r: np.asarray(r))
    out["wall_8dev_timeshared_ms"] = round(t8 * 1e3, 1)
    # total device-work ratio: 8 virtual devices share the host's
    # cores, so wall_8 ~ (total work + overhead) / cores_used; the
    # overhead ratio below treats the wall as proportional to total
    # work (conservative upper bound on sharding overhead)
    out["overhead_ratio_upper_bound"] = round(t8 / t1, 3)
    log(f"8 virtual devices (time=2, chan=4): {t8*1e3:.1f} ms "
        f"(x{t8/t1:.2f} of 1-device wall on shared cores)")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
