"""Multi-host (DCN) deployment glue.

Reference parallelism (SURVEY.md section 2.9): the KiwiSDR splits work
between the FPGA, a cooperative-coroutine host, and forked offload
processes over shmem + RT signals.  The TPU-native analogue at
multi-host scale:

- intra-slice: ICI collectives inside `shard_map` (halo exchange of
  filter tails on the time axis, channel sharding on the chan axis —
  `parallel/sharded_rx.py`).
- cross-host: jax.distributed over DCN.  The mesh is laid out so the
  TIME axis (whose `ppermute` halo exchange moves only
  `tail1`-sized edges, a few hundred KB) crosses hosts, while the
  heavy channel axis stays inside each host's ICI domain.
- ingest: each host feeds only its own time-shard of the ADC stream
  (`host_shard_block`), the distributed analogue of the per-host SPI
  DMA ring.

Nothing here requires multiple hosts to import: single-process meshes
(including the CPU `--xla_force_host_platform_device_count` test mesh)
take the same code path with ``num_processes == 1``.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> int:
    """Initialize jax.distributed when launched multi-host.

    No-op (returns 1) for single-process runs so callers can use the
    same entry point everywhere.  Returns the process count.
    """
    if num_processes is None or num_processes <= 1:
        return 1
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    return jax.process_count()


def make_global_mesh(time: int | None = None,
                     chan: int | None = None) -> Mesh:
    """(time, chan) mesh over ALL processes' devices.

    Default layout: time = process count (DCN crosses hosts only on
    the cheap halo axis), chan = local device count (ICI).  A custom
    split must keep ``time * chan == total devices``.
    """
    devs = jax.devices()
    n = len(devs)
    if time is None:
        time = max(jax.process_count(), 1)
    if chan is None:
        chan = n // time
    if time * chan != n:
        raise ValueError(f"time*chan = {time}*{chan} != {n}")
    # order devices host-major so the time axis crosses processes and
    # the chan axis stays host-local
    devs = sorted(devs, key=lambda d: (d.process_index, d.id))
    arr = np.asarray(devs).reshape(time, chan)
    return Mesh(arr, ("time", "chan"))


def host_shard_block(mesh: Mesh, x_local: np.ndarray) -> jax.Array:
    """Assemble the global ADC block from per-host local time-shards.

    ``x_local``: this process's contiguous slice of the block, length
    ``global_len / time_shards`` (per-host ingest — no host ever holds
    the whole wideband stream).  Returns a global jax.Array sharded
    P("time") along the mesh's time axis.
    """
    sharding = NamedSharding(mesh, P("time"))
    if jax.process_count() == 1:
        # single process: x_local IS the whole block
        return jax.device_put(x_local, sharding)
    global_shape = (x_local.shape[0] * jax.process_count(),)
    return jax.make_array_from_process_local_data(
        sharding, x_local, global_shape)


def scaling_report(mesh: Mesh, step_fn, args,
                   iters: int = 4) -> dict:
    """Measure per-step wall time on this mesh (the >=85 %
    weak-scaling gate of BASELINE.json is step_time(1 dev) /
    step_time(N dev) when channels scale with N)."""
    import time
    out = step_fn(*args)
    jax.tree.map(lambda a: a.block_until_ready(), out)
    t0 = time.time()
    for _ in range(iters):
        out = step_fn(*args)
    jax.tree.map(lambda a: a.block_until_ready(), out)
    dt = (time.time() - t0) / iters
    return {"devices": mesh.devices.size,
            "time_shards": mesh.shape["time"],
            "chan_shards": mesh.shape["chan"],
            "step_seconds": dt}
