"""Live-soak artifact: the COMPOSED system decoding while serving.

Runs the real server on the real device with a WSPR-modulated scene
(4-FSK transmitter on a 120 s cycle via DeviceSceneSource's exact-
integer FSK NCO), a synthetic GPS sky with assisted ephemerides, WSPR
autorun on an idle channel, live SND listeners and shared-WF clients —
then requires the whole thing to hold realtime WHILE producing at
least one decoded WSPR spot and at least one GPS position fix
(r4 verdict next-step #3: every piece was proven in isolation; no
committed artifact showed the composition).

Writes SOAK_r05.json: {"serve_realtime_factor", "autorun_spots",
"spot_texts", "gps_fixes", "gps_tracking", "wf_rows", ...}.

Duration: one WSPR capture needs ~120 s of stream audio; the soak runs
~2.3 cycles (~4.5 min wall at >=1x realtime).
"""

from __future__ import annotations

import asyncio
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
from flydog_sdr_gps_tpu.utils.jax_cache import \
    enable_persistent_cache  # noqa: E402
enable_persistent_cache()

import numpy as np  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


async def _run(C: int, block: int, n_snd: int, n_wf: int,
               duration_s: float) -> dict:
    from flydog_sdr_gps_tpu.extensions import wspr_decode
    from flydog_sdr_gps_tpu.models import rx_channel as rx
    from flydog_sdr_gps_tpu.models.gps import manager as gps_manager
    from flydog_sdr_gps_tpu.models.gps import scene as gps_scene
    from flydog_sdr_gps_tpu.runtime import (DeviceSceneSource,
                                            GpsReceiver, StreamEngine)
    from flydog_sdr_gps_tpu.server import KiwiServer
    from tools.bench_serve import _client, _prewarm, _wf_client

    params = rx.RxParams(num_channels=C, audio_block=block)
    # WSPR transmitter: repo encoder supplies the channel symbols (the
    # DECODER's correctness is proven against wsjt/ft8_lib oracles and
    # the off-air capture; the soak proves the live composition)
    msg = wspr_decode.WsprMessage("K1ABC", "FN42", 37)
    tones = wspr_decode.encode_to_tones(msg)
    dial_khz = 7038.6
    src = DeviceSceneSource(
        tones=(
            (14.074e6, 0.1),                      # plain carrier
            (7.1e6, 0.2, ("am", 1000.0, 0.5)),    # AM for listeners
            (dial_khz * 1e3 + 1500.0, 0.15,
             ("fsk", 8192, 12000.0 / 8192.0, tuple(int(t) for t in
                                                   tones), 176)),
        ),
        noise_rms=2e-4, block=params.ddc.adc_block)
    eng = StreamEngine(params, src)

    rx_pos = gps_scene.ecef_from_lla(47.37, 8.54, 450.0)
    t0_gps = 345600.0 + 3.0
    ephs = gps_scene.visible_constellation(rx_pos, t0_gps, n_sats=8)
    sky = gps_scene.GpsScene(rx_pos, ephs, t0_gps, duration=3600.0,
                             clock_ppm=0.4, noise=0.9, amplitude=0.5,
                             device=True)
    mgr = gps_manager.GpsManager(prns=tuple(ephs))
    # 0.4 s GPS IF chunks: the default 0.1 s costs ~10 device round
    # trips/s over the tunnel (~50 ms latency each), which alone eats
    # half the serving budget; tracking is chunk-size-agnostic
    gps = GpsReceiver(sky, mgr, engine=eng, search_interval=10.0,
                      assist_ephemerides=ephs, chunk_seconds=0.4,
                      realtime=True)

    port = int(os.environ.get("SOAK_PORT", "18977"))
    server = KiwiServer(eng, port=port, realtime=False,
                        wf_enabled=True, wf_chans=4, gps=gps,
                        autorun=[f"wspr:{dial_khz}"])
    # the soak triggers first-time GPS jit compiles mid-flight; those
    # tunnel stalls recover — don't let the watchdog restart the run
    server.stall_restart_blocks = 60
    await server.start()
    try:
        log(f"soak: C={C} block={block} snd={n_snd} wf={n_wf} "
            f"duration={duration_s:.0f}s (compiling ...)")
        t0 = time.time()
        while eng.seq == 0 and time.time() - t0 < 900:
            await asyncio.sleep(0.5)
        log(f"  first block after {time.time()-t0:.1f}s")
        await _prewarm(server, n_snd + 1 + 1)
        rf_block = block / params.fs_out
        n_blocks = int(duration_s / rf_block)
        timeout_s = duration_s * 3 + 300
        snd_stats = [dict() for _ in range(n_snd)]
        wf_stats = [dict() for _ in range(n_wf)]
        tasks = [asyncio.create_task(
            _client(port, f"soak{i}", 7100.0 + i, n_blocks,
                    snd_stats[i], timeout_s))
            for i in range(n_snd)]
        tasks += [asyncio.create_task(
            _wf_client(port, f"soakwf{i}", i * 2, n_blocks // 8,
                       wf_stats[i], timeout_s))
            for i in range(n_wf)]
        t_start = time.time()
        await asyncio.gather(*tasks)
        wall = time.time() - t_start
        ok = [s for s in snd_stats if s.get("pkts", 0) >= 8]
        sus = []
        for s_ in ok:
            ts_ = s_.get("times", [])
            if len(ts_) >= 8:
                gaps = np.diff(ts_[len(ts_) // 2:])
                if len(gaps):
                    sus.append(rf_block / float(np.median(gaps)))
        gst = gps.status()
        spots = list(server.autorun.spots) if server.autorun else []
        return dict(
            C=C, audio_block=block, snd_clients=n_snd,
            wf_clients=n_wf,
            soak_wall_s=round(wall, 1),
            stream_audio_s=round(eng.seq * rf_block, 1),
            serve_realtime_factor=round(
                float(np.median(sus)) if sus else 0.0, 3),
            autorun_spots=len(spots),
            spot_texts=[s["text"] for s in spots][:5],
            gps_tracking=gst["tracking"],
            gps_fixes=gst["fixes"],
            gps_fix=gst.get("fix"),
            wf_rows=sum(s.get("rows", 0) for s in wf_stats),
            send_drops=sum(c.send_drops
                           for c in server.conns.values()),
        )
    finally:
        await server.stop()


def main() -> dict:
    C = int(os.environ.get("SOAK_C", "1024"))
    block = int(os.environ.get("SOAK_BLOCK", "2048"))
    n_snd = int(os.environ.get("SOAK_SND", "8"))
    n_wf = int(os.environ.get("SOAK_WF", "2"))
    dur = float(os.environ.get("SOAK_DURATION_S", "280"))
    try:
        return asyncio.run(asyncio.wait_for(
            _run(C, block, n_snd, n_wf, dur), timeout=dur * 4 + 900))
    except Exception as e:                    # noqa: BLE001
        import traceback
        traceback.print_exc()
        return dict(error=f"{type(e).__name__}: {e}")


if __name__ == "__main__":
    out = main()
    log("soak result:", out)
    print(json.dumps(out))
    if "error" not in out:
        with open(os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "SOAK_r05.json"),
                "w") as f:
            json.dump(out, f, indent=1)
