"""Runtime: sources, stream engine, control plane, native codec."""

import numpy as np
import jax.numpy as jnp
import pytest

from flydog_sdr_gps_tpu.models import rx_channel as rx
from flydog_sdr_gps_tpu.ops import adpcm, demod
from flydog_sdr_gps_tpu.runtime import (FileSource, StreamEngine,
                                        SyntheticSource)


def small_engine(tones=((14.201e6, 0.5),)):
    params = rx.RxParams(num_channels=2, audio_block=128)
    src = SyntheticSource(tones=tones, noise_rms=0.001)
    eng = StreamEngine(params, src)
    eng.set_channel(0, freq_hz=14.200e6, mode=demod.MODE_USB,
                    in_use=True)
    eng.set_channel(1, freq_hz=7.000e6, mode=demod.MODE_AM, in_use=True)
    return eng


def test_engine_produces_audio_and_seq():
    eng = small_engine()
    rows = []
    eng.subscribers.append(lambda e, taps: rows.append(
        np.asarray(taps.audio)))
    for _ in range(10):
        taps = eng.run_block()
    assert eng.seq == 10
    # drop passband-FIR group delay (~448 samples at this block size)
    audio = np.concatenate(rows)[640:]
    # ch0 hears the 1 kHz USB offset tone
    spec = np.abs(np.fft.rfft(audio[:, 0] * np.hanning(len(audio))))
    f = np.fft.rfftfreq(len(audio), 1.0 / eng.params.fs_out)
    assert abs(f[np.argmax(spec)] - 1000.0) < 40
    # ticks advance by adc_block per block
    assert eng.block_ticks == 9 * eng.params.ddc.adc_block


def test_engine_retune_mid_stream():
    eng = small_engine(tones=((14.201e6, 0.5), (21.0015e6, 0.5)))
    for _ in range(2):
        eng.run_block()
    eng.set_channel(0, freq_hz=21.000e6)
    rows = []
    eng.subscribers.append(lambda e, taps: rows.append(
        np.asarray(taps.audio)))
    for _ in range(8):
        eng.run_block()
    audio = np.concatenate(rows)[640:]
    spec = np.abs(np.fft.rfft(audio[:, 0] * np.hanning(len(audio))))
    f = np.fft.rfftfreq(len(audio), 1.0 / eng.params.fs_out)
    assert abs(f[np.argmax(spec)] - 1500.0) < 40


def test_engine_nan_reset():
    eng = small_engine()

    class PoisonSource(SyntheticSource):
        def _produce(self, n):
            x = super()._produce(n)
            x[5] = np.nan          # sanitized by SampleSource wrapper
            return x

    eng.source = PoisonSource(tones=((14.201e6, 0.5),))
    taps = eng.run_block()
    assert bool(jnp.all(jnp.isfinite(taps.audio)))


def test_file_source_loops(tmp_path):
    path = tmp_path / "cap.raw"
    data = (np.arange(1000) % 17 - 8).astype(np.int16)
    data.tofile(path)
    src = FileSource(str(path), dtype="int16")
    blk = src.next_block(2500)
    assert blk.shape == (2500,)
    np.testing.assert_allclose(blk[:1000], blk[1000:2000])
    assert src.ticks == 2500


def test_native_adpcm_matches_python():
    from flydog_sdr_gps_tpu.runtime.native import adpcm_native
    if adpcm_native is None:
        pytest.skip("no compiler")
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(2048) * 8000).astype(np.int16)
    s1, s2 = adpcm.AdpcmState(), adpcm.AdpcmState()
    enc_c = adpcm_native.encode(x, s1)
    enc_py = adpcm._encode_py(x, s2)
    np.testing.assert_array_equal(enc_c, enc_py)
    assert (s1.predictor, s1.index) == (s2.predictor, s2.index)
    d1, d2 = adpcm.AdpcmState(), adpcm.AdpcmState()
    np.testing.assert_array_equal(adpcm_native.decode(enc_c, d1),
                                  adpcm._decode_py(enc_py, d2))
