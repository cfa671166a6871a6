"""GPS manager: cold search -> tracking -> drop logic, status."""

import numpy as np
import pytest

from flydog_sdr_gps_tpu.models.gps import manager, acquisition
from flydog_sdr_gps_tpu.numerology import GPS_FS

import sys, os
sys.path.insert(0, os.path.dirname(__file__))
from test_gps import synth_if  # noqa: E402


def test_manager_acquires_and_tracks():
    m = manager.GpsManager(prns=(3, 9, 14, 22, 30))
    sats = [(9, 210.0, +1200.0, 0.7), (22, 555.5, -900.0, 0.65)]
    n = m.acq.n_raw
    raw = synth_if(sats, n, noise=0.5)
    started = m.cold_search(raw)
    assert {s["prn"] for s in started} == {9, 22}
    assert set(m.channels) == {9, 22}

    # track 60 ms of signal
    n2 = m.tp.epoch * 60
    raw2 = synth_if(sats, n2, noise=0.5, seed=1)
    m.track_block(raw2)
    assert all(c.epochs == 60 for c in m.channels.values())
    st = m.status()
    assert st["tracking"] == 2 and st["prns"] == [9, 22]
    assert st["fixes"] == 0 and st["fix"] is None

    # feed noise only -> channels eventually dropped (the power
    # monitor needs the 500-epoch pull-in grace to pass and then ~2 s
    # of sustained lost lock, `CheckPower` analogue)
    for i in range(26):
        noise = np.sign(np.random.default_rng(i)
                        .standard_normal(m.tp.epoch * 100)
                        ).astype(np.float32)
        m.track_block(noise)
        if not m.channels:
            break
    assert len(m.channels) == 0  # power monitor drops dead channels
