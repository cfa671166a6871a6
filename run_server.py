"""Run a live KiwiSDR-protocol server with a synthetic RF scene.

Usage: python run_server.py [--port 8073] [--cpu] [--channels N]

Scene: AM broadcast at 7.100 MHz (1 kHz music-ish tone), USB at
14.201 MHz, carrier at 10.000 MHz — enough to explore with the web UI.
"""
import argparse
import asyncio
import os
import sys

p = argparse.ArgumentParser()
p.add_argument("--port", type=int, default=8073)
p.add_argument("--cpu", action="store_true")
p.add_argument("--channels", type=int, default=4)
p.add_argument("--gps", action="store_true",
               help="run the GPS subsystem on a synthetic sky scene")
p.add_argument("--gps-ppm", type=float, default=0.4,
               help="simulated oscillator error the GPS loop recovers")
p.add_argument("--no-realtime", dest="realtime",
               action="store_false", default=True)
p.add_argument("--cfg", default=None,
               help="kiwi.json-style config file (passwords, policy)")
p.add_argument("--password", default=None,
               help="user password (overrides cfg)")
p.add_argument("--admin-password", default=None,
               help="admin password (overrides cfg)")
p.add_argument("--dx", default=None,
               help="dx.json label database path")
p.add_argument("--inactivity-min", type=float, default=0,
               help="kick idle listeners after N minutes (0=off)")
p.add_argument("--tlimit-min", type=float, default=0,
               help="per-connection time limit in minutes (0=off)")
p.add_argument("--max-per-ip", type=int, default=0,
               help="max rx channels one IP may hold (0=unlimited)")
p.add_argument("--autorun", action="append", default=[],
               help="background decoder on an idle channel, e.g. "
                    "--autorun wspr:7038.6 --autorun FT8:14074 "
                    "(repeatable)")
p.add_argument("--mesh", default=None,
               help="run the multi-chip engine over a device mesh, "
                    "e.g. --mesh time=2,chan=4 (device count must "
                    "equal time*chan; with --cpu a virtual CPU mesh "
                    "of that size is created)")
p.add_argument("--max-listeners", type=int, default=16,
               help="prewarm fused serve programs for subscriber "
                    "buckets up to this count at boot (persistent "
                    "compile cache makes later boots fast); a bucket "
                    "beyond it compiles off the serving path on "
                    "first use")
p.add_argument("--block", type=int, default=None,
               help="audio samples per block (default: 2048 on TPU "
                    "so the tunnel round trip fits the block period, "
                    "128 on CPU for low latency)")
p.add_argument("--host-scene", action="store_true",
               help="generate the RF scene on the host (numpy) "
                    "instead of on-device; caps throughput at the "
                    "host->device link, only useful for debugging")
p.add_argument("--file", default=None,
               help="replay a raw int16 capture instead of the "
                    "synthetic scene (host-side, double-buffered "
                    "through the native ring)")
args = p.parse_args()

mesh_spec = None
if args.mesh:
    mesh_spec = dict(kv.split("=") for kv in args.mesh.split(","))
    mesh_spec = {k: int(v) for k, v in mesh_spec.items()}

import os  # noqa: E402
if not args.cpu:
    # persistent compile cache, TPU only (see utils/jax_cache.py)
    from flydog_sdr_gps_tpu.utils.jax_cache import \
        enable_persistent_cache
    enable_persistent_cache()
if args.cpu:
    if mesh_spec:
        n = mesh_spec.get("time", 1) * mesh_spec.get("chan", 1)
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "") +
            f" --xla_force_host_platform_device_count={n}").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
from flydog_sdr_gps_tpu.models import rx_channel as rx  # noqa: E402
from flydog_sdr_gps_tpu.runtime import (  # noqa: E402
    DeviceSceneSource, GpsReceiver, ShardedStreamEngine, StreamEngine,
    SyntheticSource)
from flydog_sdr_gps_tpu.server import KiwiServer  # noqa: E402


def am_mod(t):
    return 1.0 + 0.6 * np.sin(2 * np.pi * 1000.0 * t) \
        * np.sin(2 * np.pi * 2.1 * t)


nchan = args.channels
if mesh_spec:
    # the sharded step needs channels divisible by time*chan shards
    n_dev = mesh_spec.get("time", 1) * mesh_spec.get("chan", 1)
    if nchan % n_dev:
        nchan = ((nchan + n_dev - 1) // n_dev) * n_dev
        print(f"rounding channels {args.channels} -> {nchan} "
              f"(multiple of {n_dev} mesh devices)", flush=True)
block = args.block or (128 if args.cpu else 2048)
params = rx.RxParams(num_channels=nchan, audio_block=block)
if args.file:
    # raw capture replay, host-side but double-buffered off the
    # dispatch path through the native SPSC ring (data_pump split)
    from flydog_sdr_gps_tpu.runtime import FileSource, ThreadedSource
    src = ThreadedSource(FileSource(args.file),
                         block=params.ddc.adc_block)
elif args.host_scene or mesh_spec:
    # mesh engine splits the block across time shards host-side
    src = SyntheticSource(
        tones=[(7.100e6, 0.30, am_mod),
               (14.2018e6, 0.15),      # USB voice-ish tone @ 14.201
               (10.000e6, 0.20)],
        noise_rms=3e-4)
else:
    # PRODUCTION DEFAULT: the scene is generated on-device by a
    # jitted program — no sample data crosses the host link, so
    # large C holds realtime regardless of tunnel bandwidth (the
    # r3 verdict's Weak #3; SURVEY.md section 7 "125 Msps ingest")
    src = DeviceSceneSource(
        tones=[(7.100e6, 0.30, ("am", 1000.0, 0.6)),
               (14.2018e6, 0.15),
               (10.000e6, 0.20)],
        noise_rms=3e-4, block=params.ddc.adc_block)
if mesh_spec:
    from flydog_sdr_gps_tpu import parallel
    mesh = parallel.make_mesh(**mesh_spec)
    eng = ShardedStreamEngine(params, src, mesh=mesh)
    print(f"multi-chip engine on mesh {dict(mesh.shape)}", flush=True)
else:
    eng = StreamEngine(params, src)

gps = None
if args.gps:
    from flydog_sdr_gps_tpu.models.gps import manager as gps_manager
    from flydog_sdr_gps_tpu.models.gps import scene as gps_scene
    rx_pos = gps_scene.ecef_from_lla(47.37, 8.54, 450.0)
    t0 = 345600.0 + 3.0
    ephs = gps_scene.visible_constellation(rx_pos, t0, n_sats=8)
    gal_ephs = gps_scene.visible_galileo(rx_pos, t0, n_sats=4)
    sky = gps_scene.GpsScene(rx_pos, ephs, t0, duration=3600.0,
                             clock_ppm=args.gps_ppm, noise=0.9,
                             amplitude=0.5,
                             galileo_ephemerides=gal_ephs,
                             device=not args.cpu)
    mgr = gps_manager.GpsManager(
        prns=tuple(ephs) + (3, 7, 30),      # scene PRNs + decoys
        galileo_prns=tuple(gal_ephs))
    gps = GpsReceiver(sky, mgr, engine=eng,
                      chunk_seconds=0.4 if not args.cpu else 0.1,
                      realtime=True)

cfg = None
if args.cfg or args.password or args.admin_password:
    from flydog_sdr_gps_tpu.utils.cfg import Config
    cfg = Config(args.cfg)
    if args.password is not None:
        cfg.set("user_password", args.password)
    if args.admin_password is not None:
        cfg.set("admin_password", args.admin_password)

server = KiwiServer(eng, cfg=cfg, port=args.port,
                    realtime=args.realtime, gps=gps, dx_path=args.dx,
                    autorun=args.autorun or None)
if args.inactivity_min:
    server.inactivity_min = args.inactivity_min
if args.tlimit_min:
    server.tlimit_min = args.tlimit_min
if args.max_per_ip:
    server.max_conns_per_ip = args.max_per_ip
if not server.dx.labels:
    # built-in EiBi shortwave schedule (the reference ships
    # pkgs/EiBi merged by init/dx.cpp:768) + synthetic-scene labels
    from flydog_sdr_gps_tpu.utils import eibi
    from flydog_sdr_gps_tpu.utils.dx import DxLabel
    n = eibi.load_builtin(server.dx)
    print(f"dx: {n} EiBi labels loaded", flush=True)
    server.dx.upsert(DxLabel(7100.0, "am", "AM test", "synthetic"))
    server.dx.upsert(DxLabel(14201.0, "usb", "USB test", "synthetic"))
    server.dx.upsert(DxLabel(10000.0, "am", "carrier", "synthetic"))


async def prewarm():
    """Compile the fused serve programs for every subscriber bucket
    up to --max-listeners in the background, so neither the FIRST
    listener nor listener #9/#17/... waits on the remote compile
    helper (the persistent compile cache makes later boots fast).
    Buckets beyond the prewarmed set compile off the serving path
    (`KiwiServer._serve_bucket`)."""
    warm = getattr(eng, "prewarm_gather", None)
    if warm is None or getattr(eng, "run_block_gather", None) is None:
        return
    loop = asyncio.get_running_loop()
    top = 1
    while top < min(max(args.max_listeners, 1), nchan):
        top *= 2
    bucket = 1
    while bucket <= top:
        server.compiles_in_flight += 1   # watchdog: compile stalls
        try:                             # on the tunnel are benign
            await loop.run_in_executor(None, warm, bucket)
        except Exception as e:          # noqa: BLE001 — best effort
            print(f"prewarm bucket {bucket}: {e}", flush=True)
            return
        finally:
            server.compiles_in_flight -= 1
        server._warm_buckets.add(bucket)
        print(f"prewarmed bucket {bucket}", flush=True)
        bucket *= 2


async def main():
    await server.start()
    # background services: SNR self-measurement + (egress-gated)
    # registry/DDNS/update tasks (`net/services.cpp` services_start)
    from flydog_sdr_gps_tpu.server.services import default_services
    sched = default_services(server, cfg=cfg,
                             egress_allowed=bool(
                                 cfg and cfg.bool("egress", False)))
    sched.start()
    server.services = sched
    print(f"ready on http://127.0.0.1:{args.port}/", flush=True)
    asyncio.create_task(prewarm())
    # offline restart: admin "SET restart" re-execs this process
    # (reference: `ui/admin.cpp` restart op → kiwi_restart())
    await server.wait_restart()
    await sched.stop()
    await server.stop()

asyncio.run(main())
if server.restart_requested:
    print("admin restart requested; re-exec", flush=True)
    os.execv(sys.executable, [sys.executable] + sys.argv)
