"""GPS/GNSS subsystem: acquisition, tracking, nav decode, PVT, clock.

TPU mapping of the reference's GPS stack (SURVEY.md section 2.6):
- FFT acquisition (`gps/search.cpp`) -> batched matmul-FFT over
  (satellite, Doppler) — a near-perfect MXU fit.
- FPGA correlator bank + e_cpu tracking ISR (`verilog/gps/demod.v`,
  `e_cpu/kiwi.gps.asm`) -> channel-batched `lax.scan` over 1 ms epochs.
- Nav decode / ephemeris / position solve (`gps/ephemeris.cpp`,
  `gps/solve.cpp`, `gps/PosSolver.cpp`) -> host numpy control plane
  (the reference also runs these at low rate on the ARM host).
- Clock discipline (`init/clk.cpp`) -> host filter feeding DDC retune.
"""

from . import cacode  # noqa: F401
