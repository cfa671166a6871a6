"""DeviceSceneSource FSK tone: exact-integer symbol clock, phase
continuity across symbol boundaries, idle gating, cycle repeat —
the soak scene's WSPR transmitter (tools/soak.py).

Reference behavior being mimicked: a real WSPR station keys 4-FSK
with continuous phase on a 120 s cadence; the data pump sees it as
plain ADC samples (`rx/data_pump.cpp`)."""

import numpy as np

from flydog_sdr_gps_tpu.numerology import RX_DECIM_12K
from flydog_sdr_gps_tpu.runtime import DeviceSceneSource


def _ref_fsk(src, n_blocks):
    """Pure-numpy reference: accumulate the same 48-bit phase ints."""
    st = dict(src._fsk[0])
    blk = src.block
    sym_ticks, cycle = st["sym_ticks"], st["cycle"]
    syms, fcws, amp = st["syms"], st["fcws"], st["amp"]
    out = np.zeros(n_blocks * blk, np.float32)
    phi = 0
    for n in range(n_blocks * blk):
        s = (n // sym_ticks) % cycle
        if s < len(syms):
            out[n] = amp * np.cos(2 * np.pi * (phi / float(1 << 48)))
            phi = (phi + fcws[syms[s]]) % (1 << 48)
        else:
            phi = (phi + fcws[0]) % (1 << 48)
    return out


def test_fsk_matches_integer_reference():
    # small block; symbol boundary lands mid-block (sym = 1.5 blocks)
    blk = 4 * RX_DECIM_12K
    src = DeviceSceneSource(
        tones=[(10e3, 0.5, ("fsk", 6, 500.0, (0, 3, 1), 5))],
        noise_rms=0.0, block=blk)
    assert src._fsk[0]["sym_ticks"] == 6 * RX_DECIM_12K
    got = np.concatenate([np.asarray(src.next_block(blk))
                          for _ in range(9)])
    want = _ref_fsk(DeviceSceneSource(
        tones=[(10e3, 0.5, ("fsk", 6, 500.0, (0, 3, 1), 5))],
        noise_rms=0.0, block=blk), 9)
    # phase-exact: boundaries mid-block, idle gap, next-cycle restart
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_fsk_cycle_pos():
    blk = 2 * RX_DECIM_12K
    src = DeviceSceneSource(
        tones=[(10e3, 0.5, ("fsk", 4, 500.0, (0, 1), 4))],
        noise_rms=0.0, block=blk)
    pos0, cyc = src.fsk_cycle_pos_s()
    assert pos0 == 0.0
    src.next_block(blk)
    pos1, _ = src.fsk_cycle_pos_s()
    assert abs(pos1 - blk / src.adc_clock) < 1e-9
    assert abs(cyc - 4 * 4 * RX_DECIM_12K / src.adc_clock) < 1e-9


def test_wspr_capture_aligns_to_cycle():
    """The WSPR extension waits for the start of the transmission
    cycle before capturing (reference: even-minute alignment,
    `extensions/wspr/wspr_main.cpp`)."""
    from flydog_sdr_gps_tpu.extensions.wspr import WsprExt

    class FakeParams:
        audio_block = 128
        adc_clock = 125e6

        @property
        def fs_out(self):
            return 12000.0

    class FakeSource:
        _fsk = [True]

        def __init__(self):
            self.pos = 50.0

        def fsk_cycle_pos_s(self):
            return self.pos, 120.0

    class FakeEngine:
        params = FakeParams()
        block_ticks = 0
        source = FakeSource()

    class FakeTaps:
        audio = np.zeros((128, 2), np.float32)

    eng = FakeEngine()
    ext = WsprExt(eng, 0)
    ext.start()
    assert ext.process_block(FakeTaps()) == []    # mid-cycle: waiting
    assert ext._samples == 0
    eng.source.pos = 0.005                        # cycle just started
    ext.process_block(FakeTaps())
    assert ext._samples == 128                    # capturing now
