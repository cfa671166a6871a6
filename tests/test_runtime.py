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


def test_native_datapump_conversions():
    from flydog_sdr_gps_tpu.runtime import native
    if native.s24_to_f32 is None:
        pytest.skip("no compiler")
    rng = np.random.default_rng(0)
    vals = rng.integers(-(1 << 23), 1 << 23, 128)
    raw = b"".join(int(v & 0xFFFFFF).to_bytes(3, "little") for v in vals)
    got = native.s24_to_f32(raw, 2.0 ** -23)
    assert np.allclose(got, vals.astype(np.float32) * 2.0 ** -23)
    sw = native.s24_to_f32(raw, 1.0, iq_swap=True)
    assert np.allclose(sw[0::2], vals[1::2])
    b = native.f32_to_s16be(np.array([0.5, -1.5, 1.0], np.float32))
    assert np.frombuffer(b, ">i2").tolist() == [16384, -32768, 32767]
    sc = native.SeqCheck()
    assert [sc.check(s) for s in (0, 1, 4, 5)] == [0, 0, 2, 0]
    assert sc.total_gaps == 2


def test_native_ring_and_threaded_source():
    from flydog_sdr_gps_tpu.runtime import native, source
    if native.NativeRing is None:
        pytest.skip("no compiler")
    r = native.NativeRing(8, nblocks=4)
    for i in range(6):
        r.push(np.full(8, i, np.float32))
    assert r.overruns == 2 and r.fill == 4
    assert r.pop()[0] == 0.0          # newest two were dropped

    src = source.ThreadedSource(
        source.SyntheticSource(tones=[(1e6, 0.5)]), block=4096)
    try:
        a = src.next_block(4096)
        b = src.next_block(4096)
        assert a.shape == (4096,) and np.all(np.isfinite(a))
        assert not np.array_equal(a, b)   # stream advances
    finally:
        src.close()


def test_int24_file_source(tmp_path):
    from flydog_sdr_gps_tpu.runtime import source
    vals = np.array([1 << 22, -(1 << 22), 12345, -1], np.int64)
    raw = b"".join(int(v & 0xFFFFFF).to_bytes(3, "little") for v in vals)
    p = tmp_path / "cap.s24"
    p.write_bytes(raw * 8)
    s = source.Int24FileSource(str(p), scale=2.0 ** -23)
    x = s.next_block(8)
    assert np.allclose(x[:4], vals / 2.0 ** 23)
    assert s.ticks == 8
