"""BASELINE config 5: rx14 composite — 14 channels + decoder taps.

14 concurrent DDC+demod channels with WSPR and FT8 front ends and a
CW decoder camping on three of them, one jitted block program driving
everything (the reference needs its biggest FPGA build + forked
decoder processes for this, `main.cpp:346-395`, SURVEY.md 2.9).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from flydog_sdr_gps_tpu import extensions as ext
from flydog_sdr_gps_tpu.models import rx_channel as rx
from flydog_sdr_gps_tpu.numerology import CONFIGS
from flydog_sdr_gps_tpu.ops import demod
from flydog_sdr_gps_tpu.runtime import StreamEngine, SyntheticSource


def test_rx14_with_decoder_extensions():
    cfg = CONFIGS["rx14.wf0"]
    params = rx.RxParams.from_config(cfg, audio_block=128)
    assert params.num_channels == 14

    tones = [(5.0e6 + 2e6 * k + 1000.0, 0.25) for k in range(3)]
    src = SyntheticSource(tones=tones, noise_rms=0.002)
    eng = StreamEngine(params, src)
    for k in range(3):
        eng.set_channel(k, freq_hz=5.0e6 + 2e6 * k,
                        mode=demod.MODE_USB, in_use=True)
    for k in range(3, 14):
        eng.set_channel(k, freq_hz=1.0e6 + 2e6 * k,
                        mode=demod.MODE_AM, in_use=True)

    exts = [ext.ext_create("wspr", eng, 0),
            ext.ext_create("FT8", eng, 1),
            ext.ext_create("CW_decoder", eng, 2)]
    for e in exts:
        e.start()

    audio_rows = []
    for _ in range(6):
        taps = eng.run_block()
        audio_rows.append(np.asarray(taps.audio))
        for e in exts:
            e.process_block(taps)          # must not throw / stall

    audio = np.concatenate(audio_rows)[256:]
    assert audio.shape[1] == 14
    assert np.all(np.isfinite(audio))
    # the three USB channels hear their 1 kHz offsets
    for k in range(3):
        spec = np.abs(np.fft.rfft(audio[:, k] * np.hanning(len(audio))))
        f = np.fft.rfftfreq(len(audio), 1.0 / params.fs_out)
        assert abs(f[np.argmax(spec)] - 1000.0) < 60, k
    # wspr/ft8 captures accumulated audio without stalling the engine
    assert exts[0]._samples > 0 and exts[1]._samples > 0
