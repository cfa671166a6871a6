"""Extensions: registry, CW decode, WSPR/FT8 front ends, taps wiring."""

import numpy as np
import jax.numpy as jnp
import pytest

from flydog_sdr_gps_tpu import extensions as ext
from flydog_sdr_gps_tpu.models.rx_channel import RxTaps
from flydog_sdr_gps_tpu.ops.cplx import Cplx

FS = 12000.0


class FakeEngine:
    class params:
        fs_out = FS

    source = None


def make_taps(audio_ch0: np.ndarray) -> RxTaps:
    """Wrap a 1-channel audio array into an RxTaps pytree."""
    a = jnp.asarray(audio_ch0[:, None].astype(np.float32))
    z = Cplx(a, jnp.zeros_like(a))
    return RxTaps(audio=a, audio2=a, iq_pre_fir=z, iq_post_agc=z,
                  smeter_dbm=jnp.asarray([-50.0], jnp.float32))


def test_registry():
    names = ext.ext_list()
    for want in ("S_meter", "IQ_display", "FFT", "CW_decoder",
                 "sig_gen", "wspr", "FT8"):
        assert want in names, names


def morse_audio(text: str, wpm=20.0, pitch=500.0, fs=FS) -> np.ndarray:
    from flydog_sdr_gps_tpu.extensions.cw_decoder import MORSE
    inv = {v: k for k, v in MORSE.items()}
    dit = 1.2 / wpm
    keying = []
    for chdx, c in enumerate(text):
        if c == " ":
            keying.append((0, 7 * dit))
            continue
        for i, sym in enumerate(inv[c]):
            keying.append((1, dit if sym == "." else 3 * dit))
            keying.append((0, dit))
        keying.append((0, 2 * dit))   # totals 3 dits after last element
    samples = []
    for (on, dur) in keying:
        n = int(dur * fs)
        t = np.arange(n) / fs
        samples.append(on * np.sin(2 * np.pi * pitch * t))
    return np.concatenate([np.zeros(2000)] + samples +
                          [np.zeros(4000)]).astype(np.float32)


def test_cw_decoder_decodes_text():
    dec = ext.ext_create("CW_decoder", FakeEngine(), 0)
    dec.start(pitch=500.0, wpm=20.0)
    audio = morse_audio("CQ TEST")
    got = ""
    for i in range(0, len(audio) - 511, 512):
        for tag, payload in dec.process_block(
                make_taps(audio[i:i + 512])):
            got += payload.decode()
    got = got.strip()
    assert "CQ" in got and "TEST" in got, got


def test_s_meter_and_iq_and_fft_run():
    audio = np.sin(2 * np.pi * 700 * np.arange(2048) / FS)
    for name in ("S_meter", "IQ_display"):
        e = ext.ext_create(name, FakeEngine(), 0)
        e.start()
        msgs = e.process_block(make_taps(audio[:512]))
        assert msgs and isinstance(msgs[0][1], bytes)
    f = ext.ext_create("FFT", FakeEngine(), 0)
    f.start()
    out = []
    for i in range(4):
        out += f.process_block(make_taps(audio[i * 512:(i + 1) * 512]))
    assert out, "FFT ext produced no rows"
    row = np.frombuffer(out[0][1], "<f4")
    assert len(row) == 1024


def test_wspr_frontend_finds_candidate():
    from flydog_sdr_gps_tpu.extensions import wspr as w
    rng = np.random.default_rng(0)
    # build a WSPR-like 4-FSK signal: sync bit -> LSB, random data
    n = int(w.CAPTURE_S * FS)
    data = rng.integers(0, 2, w.NSYM)
    tones = 2 * data + w.SYNC.astype(np.int64)      # 0..3
    f0 = w.DIAL_OFFSET + (-40) * w.TONE_SPACING     # 40 bins below dial
    phase = 0.0
    sig = np.zeros(n, np.float64)
    sps_audio = int(w.SPS * w.DECIM)                # samples/symbol @12k
    for i, tone in enumerate(tones):
        f = f0 + tone * w.TONE_SPACING
        a, b = i * sps_audio, min((i + 1) * sps_audio, n)
        if a >= n:
            break
        t = np.arange(b - a)
        sig[a:b] = np.sin(phase + 2 * np.pi * f * t / FS)
        phase = (phase + 2 * np.pi * f * (b - a) / FS) % (2 * np.pi)
    sig = (0.3 * sig + 0.2 * rng.standard_normal(n)).astype(np.float32)

    e = ext.ext_create("wspr", FakeEngine(), 0)
    e.start()
    msgs = []
    step = 512
    for i in range(0, n, step):
        blk = np.zeros(step, np.float32)
        chunk = sig[i:i + step]
        blk[:len(chunk)] = chunk
        msgs += e.process_block(make_taps(blk))
        if msgs:
            break
    assert msgs, "no wspr status emitted"
    assert e.results, "no candidates"
    best = e.results[0][0]
    assert abs(best["bin"] - (w.SPS // 2 - 40)) <= 1, best
    assert abs(best["freq"] - f0) <= 2 * w.TONE_SPACING, best
    assert best["sync"] > 0.25, best
    syms = e.results[0][1]
    assert syms.shape == (162,)


def test_ft8_frontend_costas_sync():
    from flydog_sdr_gps_tpu.extensions import ft8 as f8
    rng = np.random.default_rng(1)
    n = int(f8.Ft8Ext.CAPTURE_S * FS)
    base = 1000.0
    tones = rng.integers(0, 8, f8.NSYM)
    for pos in f8.COSTAS_POS:
        tones[pos:pos + 7] = f8.COSTAS
    sig = np.zeros(n, np.float64)
    phase = 0.0
    for i, tone in enumerate(tones):
        a, b = i * f8.SPS, min((i + 1) * f8.SPS, n)
        if a >= n:
            break
        f = base + tone * f8.BAUD
        t = np.arange(b - a)
        sig[a:b] = np.sin(phase + 2 * np.pi * f * t / FS)
        phase = (phase + 2 * np.pi * f * (b - a) / FS) % (2 * np.pi)
    sig = (0.3 * sig + 0.15 * rng.standard_normal(n)).astype(np.float32)

    e = ext.ext_create("FT8", FakeEngine(), 0)
    e.start()
    msgs = []
    for i in range(0, n, 512):
        blk = np.zeros(512, np.float32)
        chunk = sig[i:i + 512]
        blk[:len(chunk)] = chunk
        msgs += e.process_block(make_taps(blk))
        if msgs:
            break
    assert e.results
    best = e.results[0][0]
    bin_hz = FS / f8.NFFT
    assert abs(best["freq"] - base) < 3 * bin_hz, best
    logls = e.results[0][1]
    assert logls.shape == (58, 8)


def test_misc_ui_extensions():
    assert {"colormap", "iframe", "prefs", "example", "devl",
            "waterfall", "digi_modes"} <= set(ext.ext_list())
    pe = ext.ext_create("prefs", FakeEngine(), 0)
    pe.start()
    assert pe.command({"set": True, "key": "vol", "value": "7"})
    assert pe.command({"get": True, "key": "vol"})[0][1] == b"7"
    ex = ext.ext_create("example", FakeEngine(), 0)
    ex.start()
    assert ex.command({"ping": True})[0][1] == b"pong"
    dm = ext.ext_create("digi_modes", FakeEngine(), 0)
    dm.start()
    out = dm.command({"preset": "rtty75"})
    assert out and dm.baud == 75.0 and dm.shift == 450.0
