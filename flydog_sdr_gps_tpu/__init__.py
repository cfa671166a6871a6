"""flydog_sdr_gps_tpu — a TPU-native wideband SDR + GNSS framework.

A from-scratch re-design of the FlyDog_SDR_GPS (KiwiSDR-family) receiver
stack for TPU hardware.  The reference implements an HF receiver as an
FPGA DDC chain + ARM host DSP; here the entire signal chain is expressed
as JAX/XLA/Pallas programs over a `jax.sharding.Mesh`:

- ``ops``      — core DSP numerics (NCO, filter-bank DDC, FIR/IIR, demod,
                 AGC, noise processing, ADPCM, windows).
- ``models``   — assembled signal pipelines: the per-channel receiver
                 ("rx channel"), waterfall, GPS acquisition/tracking/
                 solver, decoder front-ends (WSPR/FT8).
- ``parallel`` — device-mesh sharding: channel-parallel back half,
                 time-parallel front half with halo exchange.
- ``runtime``  — host-side streaming runtime: sample sources, block
                 scheduler, native (C) codecs.
- ``server``   — KiwiSDR-protocol-compatible WebSocket server layer.
- ``utils``    — config (kiwi.json-style), logging, event tracing.

Reference behavior citations use ``file:line`` into the upstream tree
(flydog-sdr/FlyDog_SDR_GPS).
"""

__version__ = "0.1.0"

from . import numerology  # noqa: F401
