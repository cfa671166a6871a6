"""CPU-mesh weak-scaling report for the sharded receiver step.

Multi-chip TPU hardware is not available in this environment, so this
measures the sharded program on a virtual CPU mesh
(--xla_force_host_platform_device_count): it validates that the
shard_map step compiles, runs and scales in PROGRAM STRUCTURE
(channels per device held constant while devices grow).  Virtual CPU
devices time-share one physical CPU, so wall-clock here measures
overhead, not ICI speedup — the hardware-scaling expectation comes
from the collective structure (per-step comms = tail1+tail2 halos +
one audio all_gather, independent of channel count per device).

Usage: python tools/scaling_report.py [--out SCALING.md]
"""

import argparse
import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from flydog_sdr_gps_tpu import parallel  # noqa: E402
from flydog_sdr_gps_tpu.models import rx_channel as rx  # noqa: E402
from flydog_sdr_gps_tpu.runtime import (  # noqa: E402
    ShardedStreamEngine, SyntheticSource)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--chans-per-dev", type=int, default=16)
    ap.add_argument("--iters", type=int, default=6)
    args = ap.parse_args()

    rows = []
    for n in (1, 2, 4, 8):
        t_sz = 2 if n >= 2 else 1
        mesh = parallel.make_mesh(time=t_sz, chan=n // t_sz,
                                  devices=jax.devices()[:n])
        params = rx.RxParams(num_channels=args.chans_per_dev * n,
                             audio_block=64 * max(t_sz, 2))
        src = SyntheticSource(tones=((7.1e6, 0.3),), noise_rms=1e-3)
        eng = ShardedStreamEngine(params, src, mesh=mesh)
        rep = eng.scaling_report(iters=args.iters)
        block_s = params.ddc.adc_block / params.adc_clock
        rep["realtime_x"] = round(block_s / rep["step_seconds"], 2)
        rows.append(rep)
        print(json.dumps(rep), flush=True)

    if args.out:
        with open(args.out, "w") as f:
            f.write("# Sharded-step scaling (virtual CPU mesh)\n\n")
            f.write("Weak scaling: channels grow with devices "
                    f"({args.chans_per_dev}/device). Virtual CPU "
                    "devices time-share one host CPU, so step time "
                    "growing ~linearly with total work is the expected "
                    "ceiling here; the structural claim (fixed-size "
                    "halos + one all_gather per step) is what carries "
                    "to real ICI.\n\n")
            f.write("| devices | mesh (time x chan) | channels | "
                    "step (s) | realtime x |\n|---|---|---|---|---|\n")
            for r in rows:
                f.write(f"| {r['devices']} | {r['time_shards']}x"
                        f"{r['chan_shards']} | {r['channels']} | "
                        f"{r['step_seconds']:.4f} | "
                        f"{r['realtime_x']} |\n")
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
