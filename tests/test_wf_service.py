"""Shared waterfall subsystem: slot sharing, jit-cache reuse,
auto-aperture, masked frequencies, interp modes.

Covers the reference behaviors of `rx/rx_waterfall.cpp`:
aperture_auto (:1176-1270), masked-frequency zeroing (:905-918),
interp modes (:74,567-575), and the shared-chain architecture
(<= wf_chans DDCs serve all clients).
"""

import numpy as np
import jax.numpy as jnp

from flydog_sdr_gps_tpu.models import waterfall as wf_model
from flydog_sdr_gps_tpu.numerology import ADC_CLOCK_NOM, UI_SRATE_30M
from flydog_sdr_gps_tpu.server.wf_service import WfSubsystem

BLOCK = 1 << 16


def tone_block(freq_hz, n=BLOCK, amp=0.5, ticks=0):
    t = (ticks + np.arange(n)) / ADC_CLOCK_NOM
    return jnp.asarray((amp * np.cos(2 * np.pi * ((freq_hz * t) % 1.0))
                        ).astype(np.float32))


def test_slot_sharing_and_jit_reuse():
    wf = WfSubsystem(ADC_CLOCK_NOM, UI_SRATE_30M, capacity=4)
    a = wf.attach(2, 1000)
    b = wf.attach(2, 1000)
    assert a is b and a.refs == 2          # same view -> one chain
    c = wf.attach(3, 1000)
    assert c is not a
    # zoom params and compiled programs are process-wide singletons:
    # a fresh attach at a previously-seen zoom reuses them (no retrace)
    p1 = wf_model.make_wf_params(2, ADC_CLOCK_NOM, UI_SRATE_30M)
    assert p1 is a.params
    assert wf_model.jit_ingest(p1) is wf_model.jit_ingest(a.params)
    wf.detach(b)
    wf.detach(a)
    assert a.refs == 0
    # capacity enforcement: fill all slots, next distinct view denied
    wf2 = WfSubsystem(ADC_CLOCK_NOM, UI_SRATE_30M, capacity=2)
    s1 = wf2.attach(0, 0)
    s2 = wf2.attach(1, 0)
    assert s1 and s2
    assert wf2.attach(2, 0) is None
    wf2.detach(s2)
    assert wf2.attach(2, 0) is not None    # freed chain is reused


def test_ingest_frame_and_masking():
    wf = WfSubsystem(ADC_CLOCK_NOM, UI_SRATE_30M, capacity=2)
    slot = wf.attach(0, 0)                 # full span, cf=15 MHz
    f_tone = 10.0e6
    ticks = 0
    for _ in range(3):
        wf.ingest(tone_block(f_tone, ticks=ticks))
        ticks += BLOCK
    row = wf.frame(slot)
    assert row.shape == (1024,)
    px = int(np.argmax(row))
    # pixel of a 10 MHz tone on a 0-30 MHz display
    expect_px = int(round((f_tone - (slot.cf - slot.params.span / 2))
                          / slot.params.span * 1024))
    assert abs(px - expect_px) <= 2
    peak_db = row[px]
    floor_db = np.median(row)
    assert peak_db - floor_db > 40

    # mask the tone's band -> its pixels go to the wire floor
    wf.set_masked([(f_tone - 50e3, f_tone + 50e3)])
    row2 = wf.frame(slot)
    assert row2[px] < -250.0
    # out-of-mask pixels unaffected
    assert abs(np.median(row2) - floor_db) < 3.0


def test_interp_modes_ordering():
    wf = WfSubsystem(ADC_CLOCK_NOM, UI_SRATE_30M, capacity=4)
    rows = {}
    for mode in ("max", "cma", "min"):
        slot = wf.attach(1, 0, interp=mode)
        rng = np.random.default_rng(7)
        ticks = 0
        for _ in range(2):
            x = jnp.asarray(rng.standard_normal(BLOCK)
                            .astype(np.float32) * 0.1)
            wf.ingest(x)
            ticks += BLOCK
        rows[mode] = wf.frame(slot)
    assert np.all(rows["max"] >= rows["cma"] - 1e-3)
    assert np.all(rows["cma"] >= rows["min"] - 1e-3)
    assert np.mean(rows["max"] - rows["min"]) > 1.0


def test_aperture_tracks_noise_floor_step():
    ap = wf_model.ApertureAuto(algo=wf_model.ApertureAuto.MMA,
                               param=4.0, report_s=0.0)
    rng = np.random.default_rng(1)

    def make_row(floor_dbm):
        row = floor_dbm + rng.standard_normal(1024) * 1.5
        row[100:104] = -60.0               # a strong signal
        return row

    for i in range(12):
        ap.accumulate(make_row(-100.0))
    rep = ap.report(now=100.0)
    assert rep is not None
    maxdb, mindb = rep
    assert abs(mindb - (-100.0)) <= 5.0
    assert abs(maxdb - (-60.0)) <= 5.0
    # noise floor steps up 15 dB -> aperture follows
    for i in range(20):
        ap.accumulate(make_row(-85.0))
    maxdb2, mindb2 = ap.report(now=200.0)
    assert abs(mindb2 - (-85.0)) <= 5.0

    # single-shot mode (algo=OFF) reports exactly once
    ss = wf_model.ApertureAuto(algo=wf_model.ApertureAuto.OFF)
    for i in range(10):
        ss.accumulate(make_row(-95.0))
    assert ss.report(now=10.0) is not None
    ss.accumulate(make_row(-95.0))
    assert ss.report(now=20.0) is None


def test_chunked_ingest_equals_oneshot():
    """Large serving blocks are ingested in WF_CHUNK pieces (the
    whole-block program OOMs HBM at 2048-audio blocks); the streaming
    tails must make chunked == one-shot exactly."""
    z = 3
    wf1 = WfSubsystem(ADC_CLOCK_NOM, UI_SRATE_30M, capacity=1)
    wf2 = WfSubsystem(ADC_CLOCK_NOM, UI_SRATE_30M, capacity=1)
    s1 = wf1.attach(z, 5000)
    s2 = wf2.attach(z, 5000)
    div = s1.params.total_decim
    n = 8 * div * 64
    x = tone_block(s1.cf + 1e4, n=n)
    wf2.WF_CHUNK = n // 4               # force 4 chunks
    wf1.ingest(x)
    wf2.ingest(x)
    r1 = wf1.frame(s1)
    r2 = wf2.frame(s2)
    np.testing.assert_allclose(r1, r2, atol=1e-3)
