"""Engine checkpoint/resume: restored stream continues bit-identically."""

import numpy as np
import pytest

from flydog_sdr_gps_tpu.models import rx_channel as rx
from flydog_sdr_gps_tpu.ops import demod
from flydog_sdr_gps_tpu.runtime import StreamEngine, SyntheticSource


def test_save_load_resumes_stream(tmp_path):
    params = rx.RxParams(num_channels=2, audio_block=128)

    def make():
        src = SyntheticSource(tones=((14.201e6, 0.5),), noise_rms=0.0)
        eng = StreamEngine(params, src)
        eng.set_channel(0, freq_hz=14.200e6, mode=demod.MODE_USB)
        return eng

    eng = make()
    for _ in range(3):
        eng.run_block()
    path = str(tmp_path / "state.pkl")
    eng.save_state(path)
    ref_next = np.asarray(eng.run_block().audio)

    eng2 = make()
    eng2.load_state(path)
    assert eng2.seq == 3
    # drive the fresh source to the same tick position
    eng2.source.ticks = eng.source.ticks - params.ddc.adc_block
    got_next = np.asarray(eng2.run_block().audio)
    np.testing.assert_allclose(got_next, ref_next, atol=1e-5)
