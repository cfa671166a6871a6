"""Check E1B acquisition code-phase accuracy vs scene truth for the
mixed-test scene (BOC side-peak hypothesis)."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from flydog_sdr_gps_tpu.models.gps import acquisition, galileo, scene
from flydog_sdr_gps_tpu.numerology import GALILEO_PRN_BASE

rx = scene.ecef_from_lla(47.0, 8.0, 500.0)
t0 = 1200.0
gps_eph = scene.visible_constellation(rx, t0, n_sats=4)
gal_eph = scene.visible_galileo(rx, t0, n_sats=4)
sc = scene.GpsScene(rx, gps_eph, t0, duration=2.0, noise=1.0,
                    amplitude=0.5, galileo_ephemerides=gal_eph)
ap = acquisition.AcqParams()
raw = sc.next_block(2 * ap.n_raw)
res = galileo.acquire_all_e1b(ap, raw, tuple(sorted(gal_eph)))
for r in res:
    prn = r["prn"]
    # truth: delay at the first sample; code phase = chips of SV time
    tau = sc.true_delay(GALILEO_PRN_BASE + prn, t0)
    eph = gal_eph[prn]
    _, clk = eph.sat_pos(t0 - tau)
    t_sv = t0 - tau + clk
    cp_true = (t_sv * 1.023e6) % 4092
    dcp = (r["code_phase"] - cp_true + 2046) % 4092 - 2046
    # truth doppler: numeric derivative of delay
    dt = 0.05
    tau2 = sc.true_delay(GALILEO_PRN_BASE + prn, t0 + dt)
    dop_true = -(tau2 - tau) / dt * 1.57542e9
    print(f"G{prn}: snr={r['snr']:7.1f} cp_err={dcp:+7.3f} chips "
          f"dop={r['doppler']:+8.1f} dop_true={dop_true:+8.1f} "
          f"dop_err={r['doppler']-dop_true:+6.1f}")
