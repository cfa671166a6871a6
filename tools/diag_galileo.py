"""Diagnose the mixed GPS+Galileo e2e failure: instrument each
channel's acquisition, lock, I/NAV decode and TOW anchoring second by
second through the exact scene of test_mixed_gps_galileo_fix."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from flydog_sdr_gps_tpu.models.gps import manager, scene
from flydog_sdr_gps_tpu.numerology import GALILEO_PRN_BASE

rx = scene.ecef_from_lla(47.0, 8.0, 500.0)
t0 = 1200.0
gps_eph = scene.visible_constellation(rx, t0, n_sats=4)
gal_eph = scene.visible_galileo(rx, t0, n_sats=4)
print("gps prns:", sorted(gps_eph), " gal svids:", sorted(gal_eph))
sc = scene.GpsScene(rx, gps_eph, t0, duration=15.0, noise=1.0,
                    amplitude=0.5, galileo_ephemerides=gal_eph)
gm = manager.GpsManager(prns=tuple(gps_eph),
                        galileo_prns=tuple(sorted(gal_eph)))
chunk = gm.acq.n_raw
total = int(14.0 * gm.tp.fs)
done = 0
sec_mark = 0
while done < total:
    n_before = len(gm.channels)
    gm.process(sc.next_block(chunk), search=(done == 0))
    if len(gm.channels) != n_before:
        for prn, c in sorted(gm.channels.items()):
            print(f"  tracking prn={prn} snr={c.acquired_snr:.1f} "
                  f"at t={done/gm.tp.fs:.3f}s")
    done += chunk
    if done // int(gm.tp.fs) > sec_mark:
        sec_mark = done // int(gm.tp.fs)
        parts = []
        for prn, ch in sorted(gm.channels.items()):
            if prn < GALILEO_PRN_BASE:
                continue
            ip = np.asarray(ch.ip_pending[-100:]) if ch.ip_pending else \
                np.zeros(1)
            lock = (np.mean(np.abs(ip)) ** 2 /
                    max(np.mean(ip ** 2), 1e-9))
            parts.append(
                f"G{ch.svid}: sf={ch.asm.subframes} "
                f"have={sorted(ch.asm.eph.have)} "
                f"iods={ch.asm._iods} tow={ch.tow_ref is not None} "
                f"lost={ch.lost_count} buf={len(ch.asm.syms)}")
        print(f"t={sec_mark:2d}s  " + " | ".join(parts), flush=True)
        if sec_mark >= 10 and sec_mark % 2 == 0:
            fix = gm.solve(ephemerides=gps_eph)
            sets = {k: v["nsat"] for k, v in gm.last_solutions.items()}
            err = (np.linalg.norm(fix - rx) if fix is not None else -1)
            print(f"   solve: fix_err={err:.1f} sets={sets}")
print("final status:", gm.status())
