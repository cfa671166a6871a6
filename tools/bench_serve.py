"""Serving benchmark: the SERVER path, not just the engine.

Measures what the north star actually asks for — channels *served*:
the full `KiwiServer.block_loop` (engine step + on-device subscriber
gather + host fetch + per-connection demod fan-out + websocket framing
+ ADPCM + autorun decoders on idle channels) with K live SND websocket
clients, unpaced, on the real device.  The sustained realtime factor
is audio-seconds delivered per wall-second per client.

Run standalone (`python tools/bench_serve.py`) or via `bench.py`
(BENCH_SERVE=1, the default) which merges the result into the bench
JSON detail.

Env knobs: BENCH_SERVE_C (channels, default = BENCH_C or 4096),
BENCH_SERVE_CLIENTS (default 8), BENCH_SERVE_BLOCKS (default 12).
"""

from __future__ import annotations

import asyncio
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/repo/.jax_cache")

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


async def _client(port: int, ts: str, freq_khz: float, n_blocks: int,
                  stats: dict, timeout_s: float):
    import aiohttp
    t_end = time.time() + timeout_s
    async with aiohttp.ClientSession() as sess:
        async with sess.ws_connect(
                f"ws://127.0.0.1:{port}/{ts}/SND") as ws:
            await ws.send_str("SET auth t=kiwi p=")
            await ws.send_str(
                f"SET mod=usb low_cut=300 high_cut=2700 "
                f"freq={freq_khz}")
            await ws.send_str("SET compression=1")
            pkts = 0
            samples = 0
            t0 = None
            while pkts < n_blocks and time.time() < t_end:
                try:
                    m = await ws.receive(timeout=max(
                        0.5, t_end - time.time()))
                except asyncio.TimeoutError:
                    break
                if m.type != aiohttp.WSMsgType.BINARY:
                    continue
                if not m.data.startswith(b"SND"):
                    continue
                if t0 is None:
                    t0 = time.time()     # first packet starts the clock
                    continue             # (skip warm-up packet)
                pkts += 1
                # hdr: SND(3) flags(1) seq(4) smeter(2); ADPCM = 2
                # samples/byte, s16 = 1 sample / 2 bytes
                flags = m.data[3]
                body = len(m.data) - 10
                samples += body * 2 if (flags & 0x08) else body // 2
            stats["pkts"] = pkts
            stats["samples"] = samples
            stats["wall"] = (time.time() - t0) if t0 else 0.0


async def _run(C: int, block: int, n_clients: int, n_blocks: int,
               autorun: bool) -> dict:
    from flydog_sdr_gps_tpu.models import rx_channel as rx
    from flydog_sdr_gps_tpu.runtime import StreamEngine, SyntheticSource
    from flydog_sdr_gps_tpu.server import KiwiServer

    params = rx.RxParams(num_channels=C, audio_block=block)
    src = SyntheticSource(tones=((7.1e6, 0.2), (14.074e6, 0.1)),
                          noise_rms=1e-3)
    eng = StreamEngine(params, src)
    port = int(os.environ.get("BENCH_SERVE_PORT", "18973"))
    server = KiwiServer(
        eng, port=port, realtime=False, wf_enabled=False,
        autorun=(["wspr:7038.6", "ft8/ft4:14074/14080"]
                 if autorun else None))
    await server.start()
    try:
        log(f"serve bench: C={C} block={block} clients={n_clients} "
            f"blocks={n_blocks} (compiling on first block ...)")
        # wait for the first block to complete (compile)
        t0 = time.time()
        while eng.seq == 0 and time.time() - t0 < 600:
            await asyncio.sleep(0.5)
        log(f"  first block after {time.time()-t0:.1f}s")

        stats = [dict() for _ in range(n_clients)]
        timeout_s = 120.0
        tasks = [asyncio.create_task(
            _client(port, f"bench{i}", 7100.0 + i, n_blocks,
                    stats[i], timeout_s))
            for i in range(n_clients)]
        await asyncio.gather(*tasks)
        rf_block = block / params.fs_out        # audio s per block
        ok = [s for s in stats if s.get("pkts", 0) >= 2]
        if not ok:
            return dict(error="no client received packets")
        factors = [s["samples"] / params.fs_out / s["wall"]
                   for s in ok if s["wall"] > 0]
        factor = float(np.median(factors))
        spots = len(server.autorun.spots) if server.autorun else 0
        return dict(
            C=C, audio_block=block, clients=n_clients,
            blocks_per_client=int(np.median([s["pkts"] for s in ok])),
            serve_realtime_factor=round(factor, 3),
            served_channels=round(C * factor, 1),
            rf_s_per_block=round(rf_block, 4),
            autorun_spots=spots,
        )
    finally:
        await server.stop()


def run_serve_bench() -> dict:
    C = int(os.environ.get("BENCH_SERVE_C",
                           os.environ.get("BENCH_C", "4096")))
    block = int(os.environ.get("BENCH_BLOCK", "2048"))
    n_clients = int(os.environ.get("BENCH_SERVE_CLIENTS", "8"))
    n_blocks = int(os.environ.get("BENCH_SERVE_BLOCKS", "12"))
    autorun = os.environ.get("BENCH_SERVE_AUTORUN", "1") != "0"
    try:
        return asyncio.run(asyncio.wait_for(
            _run(C, block, n_clients, n_blocks, autorun),
            timeout=900.0))
    except Exception as e:                    # noqa: BLE001
        return dict(error=f"{type(e).__name__}: {e}")


if __name__ == "__main__":
    import json
    out = run_serve_bench()
    log("serve result:", out)
    print(json.dumps(out))
