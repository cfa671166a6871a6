"""Device-mesh parallelism for the SDR pipeline.

The reference's parallel structure (SURVEY.md section 2.9) is an
embedded heterogeneous pipeline: N FPGA DDC channels in spatial
parallel, forked offload processes, shmem IPC.  The TPU mapping:

- **channel parallelism** (the FPGA's spatial channels): shard the
  channel axis of the filter bank and all per-channel state across the
  mesh — embarrassingly parallel, no collectives in steady state.
- **time parallelism** (the 125 Msps front half): shard each ADC block
  in time; filter-history halos (stage-1 input tail, stage-2 tail) are
  exchanged with `ppermute` — the SDR analogue of sequence-parallel
  halo exchange.
- the audio-rate back half re-shards channels over ALL devices
  (all_gather over time + slice), since it is purely channel-parallel.
"""

from .mesh import make_mesh, mesh_shape
from .sharded_rx import make_sharded_rx_step, shard_rx_state, shard_rx_tuning
