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


def test_track_block_accepts_device_arrays():
    """Device-resident IF (GpsScene device=True path): track_block
    consumes whole-epoch jax arrays IN PLACE (no host round trip);
    results must match the numpy path exactly."""
    import jax.numpy as jnp
    sats = [(9, 210.0, +1200.0, 0.7)]
    m1 = manager.GpsManager(prns=(9,))
    m2 = manager.GpsManager(prns=(9,))
    raw = synth_if(sats, m1.acq.n_raw, noise=0.5)
    m1.cold_search(raw)
    m2.cold_search(raw)
    n2 = m1.tp.epoch * 40
    raw2 = synth_if(sats, n2, noise=0.5, seed=1)
    m1.track_block(raw2)                       # numpy path
    m2.track_block(jnp.asarray(raw2))          # device path
    c1, c2 = m1.channels[9], m2.channels[9]
    assert c1.epochs == c2.epochs == 40
    assert c1.chips == pytest.approx(c2.chips, abs=1e-6)
    assert m1.samples_tracked == m2.samples_tracked
    # process() with a device array + search fetches the capture
    m3 = manager.GpsManager(prns=(9,))
    m3.process(jnp.asarray(raw), search=True)
    assert 9 in m3.channels
