"""Per-stage timing of the serving block loop on the real device.

Times each piece the KiwiServer block loop does per block — source
dispatch, engine step dispatch, subscriber-column gather dispatch,
host fetch, ADPCM fan-out — to locate the serving wall (r4 work on
VERDICT Weak #1/#3).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
from flydog_sdr_gps_tpu.utils.jax_cache import \
    enable_persistent_cache  # noqa: E402
enable_persistent_cache()

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from flydog_sdr_gps_tpu.models import rx_channel as rx
    from flydog_sdr_gps_tpu.runtime import DeviceSceneSource, StreamEngine

    C = int(os.environ.get("BENCH_C", "4096"))
    BLOCK = int(os.environ.get("BENCH_BLOCK", "2048"))
    K = int(os.environ.get("BENCH_CLIENTS", "32"))

    params = rx.RxParams(num_channels=C, audio_block=BLOCK)
    src = DeviceSceneSource(tones=((7.1e6, 0.2), (14.074e6, 0.1)),
                            noise_rms=1e-3, block=params.ddc.adc_block)
    eng = StreamEngine(params, src)

    gather = jax.jit(lambda a, b, c, d, i: tuple(
        jnp.take(x, i, axis=1) for x in (a, b, c, d)))
    idx = jnp.asarray(np.arange(K, dtype=np.int32))

    from flydog_sdr_gps_tpu.ops import adpcm
    states = [adpcm.AdpcmState() for _ in range(K)]

    print("compiling ...", file=sys.stderr, flush=True)
    taps = eng.run_block()
    cols = gather(taps.audio, taps.audio2, taps.iq_post_agc.re,
                  taps.iq_post_agc.im, idx)
    jax.device_get(cols)

    t_src = t_step = t_gath = t_fetch = t_adpcm = t_sync = 0.0
    N = 12
    prev = None
    walls = []
    for it in range(N):
        t0 = time.time()
        x = src.next_block()
        t1 = time.time()
        eng._last_x = x
        eng.state, taps = eng._step(eng.state, eng.tuning, x)
        t2 = time.time()
        peak = jnp.max(jnp.abs(x))
        cols = gather(taps.audio, taps.audio2, taps.iq_post_agc.re,
                      taps.iq_post_agc.im, idx)
        fetch = cols + (taps.smeter_dbm, peak)
        t3 = time.time()
        if prev is not None:
            got = jax.device_get(prev)
            t4 = time.time()
            audio = got[0]
            for k in range(K):
                s16 = np.clip(audio[:, k] * 32767.0, -32768,
                              32767).astype(np.int16)
                adpcm.encode(s16, states[k])
            t5 = time.time()
        else:
            t4 = t5 = t3
        prev = fetch
        t_src += t1 - t0
        t_step += t2 - t1
        t_gath += t3 - t2
        t_fetch += t4 - t3
        t_adpcm += t5 - t4
        walls.append(t5 - t0)
    n = N
    print(f"per-block (ms, avg of {n}; K={K} C={C} block={BLOCK}):")
    print(f"  source dispatch : {t_src/n*1e3:8.1f}")
    print(f"  step dispatch   : {t_step/n*1e3:8.1f}")
    print(f"  gather dispatch : {t_gath/n*1e3:8.1f}")
    print(f"  fetch (prev)    : {t_fetch/n*1e3:8.1f}")
    print(f"  adpcm x{K:3d}     : {t_adpcm/n*1e3:8.1f}")
    rf = BLOCK / params.fs_out * 1e3
    w = float(np.median(walls)) * 1e3
    print(f"  wall/block      : {w:8.1f}  (rf {rf:.1f} ms "
          f"-> {rf/w:.2f}x realtime)")


if __name__ == "__main__":
    main()
