"""Multi-chip StreamEngine: the production mesh-sharded data plane.

The reference scales by forking offload processes over shmem
(SURVEY.md section 2.9); the TPU equivalent is ONE jitted shard_map
step over a (time, chan) device mesh (`parallel/sharded_rx.py`):
the 125 Msps front half is sharded in time with `ppermute` halo
exchange of filter tails, the audio-rate back half re-shards channels
over all devices.

`ShardedStreamEngine` is a drop-in `StreamEngine`: the server's block
loop, control plane ("SET" commands -> `set_channel`), GPS clock
feedback (`retune_all`) and checkpointing all work unchanged — the
only differences are that state/tuning live sharded on the mesh and
ingest places each block with the canonical P('time') sharding
(per-host time-shards over DCN when launched multi-process,
`parallel/distributed.host_shard_block`).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..models import rx_channel as rx
from .. import parallel
from ..parallel import distributed
from .stream import StreamEngine


class ShardedStreamEngine(StreamEngine):
    """StreamEngine whose step runs sharded over a device mesh."""

    def __init__(self, params: rx.RxParams, source, mesh=None,
                 time: int | None = None, chan: int | None = None):
        if mesh is None:
            mesh = distributed.make_global_mesh(time=time, chan=chan)
        self.mesh = mesh
        super().__init__(params, source, use_jit=False)
        # replace the single-device step and shard the live state
        self._step = parallel.make_sharded_rx_step(params, mesh)
        self.state = parallel.shard_rx_state(self.state, mesh, params)
        self.tuning = parallel.shard_rx_tuning(self.tuning, mesh)

    # -- control plane -----------------------------------------------------
    def set_channel(self, ch: int, **kwargs) -> None:
        """Per-channel SET: the parent mutates tuning columns with
        `.at[].set()`; re-pin the canonical shardings afterwards so the
        jitted step never sees a layout change (a re-placement of a few
        KB — control-plane rates are sub-Hz)."""
        super().set_channel(ch, **kwargs)
        self.tuning = parallel.shard_rx_tuning(self.tuning, self.mesh)

    def retune_all(self, adc_clock_corrected: float) -> None:
        super().retune_all(adc_clock_corrected)
        self.tuning = parallel.shard_rx_tuning(self.tuning, self.mesh)

    # the fused step+gather fast path compiles the UNSHARDED program;
    # the sharded engine keeps the plain two-dispatch path
    run_block_gather = None

    # -- data plane ----------------------------------------------------------
    def run_block(self):
        """Identical to the parent except ingest: the block is placed
        with the P('time') sharding (each process contributes only its
        local time-shard when multi-host)."""
        ticks = getattr(self.source, "ticks", 0)
        x = self.source.next_block(self.params.ddc.adc_block //
                                   max(jax.process_count(), 1))
        x = distributed.host_shard_block(self.mesh, np.asarray(x))
        self._last_x = x
        self.state, taps = self._step(self.state, self.tuning, x)
        self.block_ticks = ticks
        self.seq += 1
        if self.seq % 64 == 0:
            if not bool(jnp.all(jnp.isfinite(taps.audio))):
                self.reset_streaming_state()
        for fn in self.subscribers:
            fn(self, taps)
        return taps

    def reset_streaming_state(self) -> None:
        self.state = parallel.shard_rx_state(
            rx.init_state(self.params), self.mesh, self.params)
        self.resets += 1

    def load_state(self, path: str) -> None:
        super().load_state(path)
        self.state = parallel.shard_rx_state(self.state, self.mesh,
                                             self.params)
        self.tuning = parallel.shard_rx_tuning(self.tuning, self.mesh)

    def scaling_report(self, iters: int = 4) -> dict:
        """Measured step time on this mesh (weak-scaling evidence).
        Uses a fresh state chain (the jitted step donates its state
        argument, so the same state must never be passed twice)."""
        import time as _time
        x = distributed.host_shard_block(
            self.mesh, np.zeros(self.params.ddc.adc_block, np.float32))
        st = parallel.shard_rx_state(rx.init_state(self.params),
                                     self.mesh, self.params)
        st, taps = self._step(st, self.tuning, x)   # compile
        jax.tree.map(lambda a: a.block_until_ready(), taps)
        t0 = _time.time()
        for _ in range(iters):
            st, taps = self._step(st, self.tuning, x)
        jax.tree.map(lambda a: a.block_until_ready(), taps)
        dt = (_time.time() - t0) / iters
        return {"devices": int(self.mesh.devices.size),
                "time_shards": int(self.mesh.shape["time"]),
                "chan_shards": int(self.mesh.shape["chan"]),
                "channels": self.params.num_channels,
                "step_seconds": dt}
