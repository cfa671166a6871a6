"""Isolate G2's alternating-page failures: track svid 2 of the mixed
scene alone vs with all 8 satellites; dump symbol quality per page."""

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

for label, geph, gals in (
        ("alone", {}, {2: gal_eph[2]}),
        ("all8", gps_eph, gal_eph)):
    sc = scene.GpsScene(rx, geph, t0, duration=12.0, noise=1.0,
                        amplitude=0.5, galileo_ephemerides=gals)
    gm = manager.GpsManager(prns=tuple(geph),
                            galileo_prns=(2,))
    gm.search_interval_s = 0          # single shot like before
    chunk = gm.acq.n_raw
    total = int(11.0 * gm.tp.fs)
    done = 0
    # instrument: collect emitted symbols by monkeypatching feed
    ch_syms = []
    while done < total:
        gm.process(sc.next_block(chunk), search=(done == 0))
        done += chunk
    ch = gm.channels.get(GALILEO_PRN_BASE + 2)
    if ch is None:
        print(label, "LOST CHANNEL")
        continue
    asm = ch.asm
    # symbol magnitude stats per 500-symbol page window from the
    # assembler's residual buffer won't cover decoded pages; instead
    # re-derive from a second pass: re-track and capture symbols
    print(f"{label}: sf={asm.subframes} iods={asm._iods} "
          f"tow={ch.tow_ref is not None} lost={ch.lost_count}")
    # re-run capturing symbols
    sc2 = scene.GpsScene(rx, geph, t0, duration=12.0, noise=1.0,
                         amplitude=0.5, galileo_ephemerides=gals)
    gm2 = manager.GpsManager(prns=tuple(geph), galileo_prns=(2,))
    gm2.search_interval_s = 0
    seen = []
    orig_feed = None
    done = 0
    first = True
    while done < int(11.0 * gm2.tp.fs):
        gm2.process(sc2.next_block(chunk), search=(done == 0))
        done += chunk
        ch2 = gm2.channels.get(GALILEO_PRN_BASE + 2)
        if ch2 is not None and first:
            first = False
            orig_feed = ch2.asm.feed
            def capture(syms, _f=orig_feed):
                seen.extend(np.atleast_1d(syms).tolist())
                return _f(syms)
            ch2.asm.feed = capture
    s = np.asarray(seen)
    if len(s) < 500:
        print("  too few symbols", len(s))
        continue
    print(f"  {len(s)} symbols; |s| mean={np.mean(np.abs(s)):.0f}")
    for blk in range(0, len(s) - 499, 500):
        seg = s[blk:blk + 500]
        # fraction of weak symbols (|s| < half the median)
        med = np.median(np.abs(s))
        weak = np.mean(np.abs(seg) < 0.5 * med)
        print(f"  syms {blk:4d}-{blk+500}: mean|s|={np.mean(np.abs(seg)):6.0f} "
              f"weak={weak:.2f}")
