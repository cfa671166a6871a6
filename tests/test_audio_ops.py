"""Audio-chain op tests: IIR scans, FastFIR, AGC, demods, ADPCM, NR."""

import numpy as np
import jax.numpy as jnp
import pytest

from flydog_sdr_gps_tpu.ops import (adpcm, agc, cplx, demod, fastfir, iir,
                                    noise, smeter)
from flydog_sdr_gps_tpu.ops.cplx import Cplx

FS = 12_000.0


# ---------------------------------------------------------------------------
# iir
# ---------------------------------------------------------------------------

def _ref_first_order(a, u, y0):
    y = np.zeros_like(u)
    prev = y0
    for n in range(len(u)):
        prev = a * prev + u[n]
        y[n] = prev
    return y


def test_linear_recurrence_matches_loop():
    rng = np.random.default_rng(0)
    u = rng.standard_normal((256, 3)).astype(np.float32)
    y0 = rng.standard_normal(3).astype(np.float32)
    got = np.asarray(iir.linear_recurrence(jnp.float32(0.95),
                                           jnp.asarray(u), jnp.asarray(y0)))
    ref = np.stack([_ref_first_order(0.95, u[:, c], y0[c])
                    for c in range(3)], axis=1)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)


def test_biquad_matches_scipy():
    from scipy.signal import lfilter
    rng = np.random.default_rng(1)
    x = rng.standard_normal((512, 2)).astype(np.float32)
    b, a = iir.design_biquad_lowpass(FS, 300.0)
    state = jnp.zeros((4, 2), jnp.float32)
    y, _ = iir.biquad(jnp.asarray(x), b, a, state)
    ref = lfilter(b, a, x, axis=0)
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-3, atol=1e-4)


def test_biquad_streaming_continuity():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((512, 2)).astype(np.float32)
    b, a = iir.design_biquad_lowpass(FS, 1000.0)
    s = jnp.zeros((4, 2), jnp.float32)
    y1, s = iir.biquad(jnp.asarray(x[:256]), b, a, s)
    y2, s = iir.biquad(jnp.asarray(x[256:]), b, a, s)
    yref, _ = iir.biquad(jnp.asarray(x), b, a,
                         jnp.zeros((4, 2), jnp.float32))
    got = np.concatenate([np.asarray(y1), np.asarray(y2)])
    np.testing.assert_allclose(got, np.asarray(yref), rtol=1e-3, atol=1e-4)


def test_dc_blocker_removes_dc():
    x = jnp.ones((4096, 1), jnp.float32) * 0.7
    y, _ = iir.dc_blocker(x, jnp.zeros((2, 1), jnp.float32), r=0.99)
    assert abs(float(y[-1, 0])) < 1e-3


# ---------------------------------------------------------------------------
# fastfir
# ---------------------------------------------------------------------------

def test_fastfir_passband_tone():
    plan = fastfir.FastFIRPlan()
    coef = fastfir.passband_freq_coef(FS, 300.0, 3000.0)
    n = plan.hop * 6
    t = np.arange(n) / FS
    z_in = np.exp(2j * np.pi * 1000.0 * t)          # in passband
    z_out_band = np.exp(2j * np.pi * 5000.0 * t)    # out of passband
    tail = fastfir.init_state(plan, 1)
    coef_c = cplx.from_numpy(coef[:, None])
    outs = []
    for i in range(6):
        blk = cplx.from_numpy(
            (z_in + z_out_band)[i * plan.hop:(i + 1) * plan.hop, None])
        y, tail = fastfir.fastfir_block(plan, blk, tail, coef_c)
        outs.append(cplx.to_numpy(y[:, 0]))
    y = np.concatenate(outs)[plan.hop * 2:]
    spec = np.abs(np.fft.fft(y * np.hanning(len(y))))
    freqs = np.fft.fftfreq(len(y), 1 / FS)
    in_bin = np.argmin(np.abs(freqs - 1000))
    out_bin = np.argmin(np.abs(freqs - 5000))
    ratio_db = 20 * np.log10(spec[in_bin] / max(spec[out_bin], 1e-12))
    assert ratio_db > 60, ratio_db


def test_fastfir_streaming_equals_direct_conv():
    from scipy.signal import lfilter
    plan = fastfir.FastFIRPlan()
    rng = np.random.default_rng(3)
    x = (rng.standard_normal(plan.hop * 4)
         + 1j * rng.standard_normal(plan.hop * 4)).astype(np.complex64)
    from flydog_sdr_gps_tpu.ops.filters import complex_bandpass
    h = complex_bandpass(FS, 300.0, 3000.0, 70.0, plan.ntaps)
    coef = fastfir.passband_freq_coef(FS, 300.0, 3000.0)
    tail = fastfir.init_state(plan, 1)
    coef_c = cplx.from_numpy(coef[:, None])
    outs = []
    for i in range(4):
        y, tail = fastfir.fastfir_block(
            plan, cplx.from_numpy(x[i * plan.hop:(i + 1) * plan.hop, None]),
            tail, coef_c)
        outs.append(cplx.to_numpy(y[:, 0]))
    got = np.concatenate(outs)
    ref = lfilter(h, 1.0, x)
    np.testing.assert_allclose(got, ref, atol=2e-4)


# ---------------------------------------------------------------------------
# agc
# ---------------------------------------------------------------------------

def test_agc_levels_loud_and_soft():
    p = agc.AgcParams(fs=FS, decay_ms=50.0, delay_samples=16)
    n = 4096
    t = np.arange(n) / FS
    tone = np.exp(2j * np.pi * 800 * t)
    for amp in (0.5, 0.01):
        st = agc.init_state(p, 1)
        x = cplx.from_numpy((amp * tone)[:, None])
        y, st = agc.agc_block(p, x, st)
        out_level = float(jnp.max(y[-1024:].abs()))
        assert 0.2 < out_level < 1.2, (amp, out_level)


def test_agc_manual_gain():
    p = agc.AgcParams(fs=FS)
    st = agc.init_state(p, 2)
    x = Cplx(jnp.full((256, 2), 0.1, jnp.float32),
             jnp.zeros((256, 2), jnp.float32))
    manual = jnp.asarray([20.0, np.nan], jnp.float32)  # ch0 fixed +20 dB
    y, _ = agc.agc_block(p, x, st, manual_gain_db=manual)
    assert abs(float(y[-1, 0].abs()) - 1.0) < 1e-3


# ---------------------------------------------------------------------------
# demod
# ---------------------------------------------------------------------------

def test_am_demod_recovers_modulation():
    n = 8192
    t = np.arange(n) / FS
    mod = 0.5 * np.sin(2 * np.pi * 400 * t)
    z = ((1.0 + mod) * np.exp(2j * np.pi * 50 * t)).astype(np.complex64)
    audio, _ = demod.am_demod(cplx.from_numpy(z[:, None]),
                              jnp.zeros((2, 1), jnp.float32))
    a = np.asarray(audio[:, 0])[1024:]
    spec = np.abs(np.fft.rfft(a * np.hanning(len(a))))
    f = np.fft.rfftfreq(len(a), 1 / FS)
    assert abs(f[np.argmax(spec)] - 400) < 5


def test_fm_demod_recovers_tone():
    n = 8192
    t = np.arange(n) / FS
    dev = 2500.0
    msg = np.sin(2 * np.pi * 700 * t)
    phase = 2 * np.pi * dev * np.cumsum(msg) / FS
    z = np.exp(1j * phase).astype(np.complex64)
    audio, _ = demod.fm_demod(cplx.from_numpy(z[:, None]),
                              cplx.from_numpy(np.ones(1, np.complex64)),
                              FS, dev)
    a = np.asarray(audio[:, 0])[256:]
    spec = np.abs(np.fft.rfft(a * np.hanning(len(a))))
    f = np.fft.rfftfreq(len(a), 1 / FS)
    assert abs(f[np.argmax(spec)] - 700) < 5
    # amplitude should approximate the modulation index scaling (~1.0)
    amp = np.sqrt(np.mean(a ** 2) * 2)
    assert 0.8 < amp < 1.2, amp


def test_sam_pll_locks_and_demods():
    params = demod.SamParams(fs=FS, bandwidth_hz=150.0)
    n = 12_000
    t = np.arange(n) / FS
    carrier_off = 80.0   # Hz offset the PLL must pull in
    mod = 0.5 * np.sin(2 * np.pi * 300 * t)
    z = ((1 + mod) * np.exp(2j * np.pi * carrier_off * t)
         ).astype(np.complex64)
    st = demod.init_sam_state(1)
    audio, _, st = demod.sam_demod(params, cplx.from_numpy(z[:, None]), st)
    # locked: recovered frequency ~= offset
    f_locked = float(st.freq[0]) * FS / (2 * np.pi)
    assert abs(f_locked - carrier_off) < 10, f_locked
    a = np.asarray(audio[:, 0])[4000:]
    spec = np.abs(np.fft.rfft(a * np.hanning(len(a))))
    f = np.fft.rfftfreq(len(a), 1 / FS)
    assert abs(f[np.argmax(spec)] - 300) < 5


def test_fm_squelch_gates_noise():
    rng = np.random.default_rng(4)
    st = demod.init_squelch_state(1)
    noisy = jnp.asarray(rng.standard_normal((512, 1)).astype(np.float32))
    thr = jnp.asarray([0.5], jnp.float32)
    y = noisy
    for _ in range(8):
        y, st = demod.fm_squelch(noisy, st, thr, tail_blocks=0)
    assert float(jnp.max(jnp.abs(y))) == 0.0
    # clean tone (low discriminator noise) passes
    t = np.arange(512) / FS
    clean = jnp.asarray(np.sin(2 * np.pi * 400 * t)[:, None]
                        .astype(np.float32))
    for _ in range(8):
        y, st = demod.fm_squelch(clean, st, thr, tail_blocks=0)
    assert float(jnp.max(jnp.abs(y))) > 0.5


# ---------------------------------------------------------------------------
# noise
# ---------------------------------------------------------------------------

def test_noise_blanker_kills_impulses():
    rng = np.random.default_rng(5)
    n = 1024
    base = (0.01 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
            ).astype(np.complex64)
    x = base.copy()
    x[100] += 5.0
    x[600] -= 4.0j
    mavg = jnp.asarray([0.01], jnp.float32)
    y, _ = noise.noise_blanker(cplx.from_numpy(x[:, None]), mavg)
    y = cplx.to_numpy(y[:, 0])
    assert np.abs(y[100]) < 0.05 and np.abs(y[600]) < 0.05
    # most samples untouched
    untouched = np.mean(np.abs(y - x) < 1e-9)
    assert untouched > 0.95


def test_spectral_nr_improves_snr():
    """NR must cut broadband noise while mostly passing a bursty (CW-like)
    tone.  A perfectly steady tone is indistinguishable from noise to any
    minimum-statistics tracker (the reference's NR_spectral included), so
    the probe signal keys on/off."""
    p = noise.SpectralNRParams()
    rng = np.random.default_rng(6)
    n = 16384
    t = np.arange(n) / FS
    burst = ((t * FS) // 2048 % 2 == 0)          # 2048-sample on/off keying
    sig = (np.sin(2 * np.pi * 800 * t) * burst).astype(np.float32)
    nse = 0.3 * rng.standard_normal(n).astype(np.float32)
    x = (sig + nse)[:, None]
    st = noise.init_spectral_nr(p, 1)
    outs = []
    for i in range(n // 512):
        y, st = noise.spectral_nr_block(p, jnp.asarray(x[i*512:(i+1)*512]),
                                        st)
        outs.append(np.asarray(y[:, 0]))
    y = np.concatenate(outs)
    # NR output is delayed by one hop; align and compare the back half
    d = p.hop
    sl = slice(n // 2, n - d)
    def snr(sigl):
        spec = np.abs(np.fft.rfft(sigl * np.hanning(len(sigl)))) ** 2
        f = np.fft.rfftfreq(len(sigl), 1 / FS)
        sb = (f > 700) & (f < 900)
        return 10 * np.log10(spec[sb].sum() / spec[~sb].sum())
    snr_in = snr((sig + nse)[sl])
    snr_out = snr(y[d:][sl])
    assert snr_out > snr_in + 3.0, (snr_in, snr_out)


def test_lms_notch_removes_tone():
    p = noise.LmsParams(taps=32, delay=4, mu=0.05, notch=True)
    n = 4096
    t = np.arange(n) / FS
    tone = np.sin(2 * np.pi * 1000 * t).astype(np.float32)
    st = noise.init_lms(p, 1)
    y, st = noise.lms_block(p, jnp.asarray(tone[:, None]), st)
    before = np.mean(tone[-512:] ** 2)
    after = np.mean(np.asarray(y[-512:, 0]) ** 2)
    assert after < before * 0.1, (before, after)


# ---------------------------------------------------------------------------
# adpcm
# ---------------------------------------------------------------------------

def test_adpcm_round_trip_snr():
    rng = np.random.default_rng(7)
    n = 4096
    t = np.arange(n) / FS
    x = (10000 * np.sin(2 * np.pi * 440 * t)
         + 300 * rng.standard_normal(n)).astype(np.int16)
    enc_state = adpcm.AdpcmState()
    dec_state = adpcm.AdpcmState()
    data = adpcm.encode(x, enc_state)
    assert len(data) == n // 2
    y = adpcm.decode(data, dec_state).astype(np.float64)
    err = y[64:] - x[64:]
    snr = 10 * np.log10(np.mean(x[64:].astype(np.float64) ** 2)
                        / np.mean(err ** 2))
    assert snr > 25, snr


# ---------------------------------------------------------------------------
# smeter
# ---------------------------------------------------------------------------

def test_smeter_level():
    n = 1024
    z = Cplx(jnp.full((n, 1), 0.5, jnp.float32),
             jnp.zeros((n, 1), jnp.float32))  # power = 0.25
    dbm_seq, peak, _ = smeter.smeter_block(z, jnp.zeros((1,), jnp.float32))
    expect = 10 * np.log10(0.25) + smeter.DEFAULT_CAL_DBM
    assert abs(float(peak[0]) - expect) < 0.5
    wire = int(np.asarray(smeter.smeter_wire(peak))[0])
    assert wire == round((expect + 127) * 10)


def test_noise_blanker_wild_bridges():
    """NB_WILD interpolates across impulses instead of zeroing
    (`rx/Teensy/NB_Wild.cpp` behavior)."""
    from flydog_sdr_gps_tpu.ops import noise
    from flydog_sdr_gps_tpu.ops.cplx import Cplx
    import jax.numpy as jnp
    n, C = 512, 3
    t = np.arange(n)
    clean = np.cos(2 * np.pi * 0.01 * t)[:, None] * np.ones((1, C))
    x = clean.copy()
    x[100, :] += 30.0
    x[101, :] -= 25.0
    y, _ = noise.noise_blanker_wild(
        Cplx(jnp.asarray(x, jnp.float32), jnp.zeros((n, C), jnp.float32)),
        jnp.full((C,), 1.0, jnp.float32))
    y = np.asarray(y.re)
    assert np.abs(y[90:115, 0] - clean[90:115, 0]).max() < 0.15
    assert np.abs(y[300:400] - clean[300:400]).max() < 1e-5
    # std blanker zeroes the same region (the audible-hole contrast)
    ys, _ = noise.noise_blanker(
        Cplx(jnp.asarray(x, jnp.float32), jnp.zeros((n, C), jnp.float32)),
        jnp.full((C,), 1.0, jnp.float32))
    assert np.abs(np.asarray(ys.re)[100, 0]) < 1e-6


def test_deemphasis_and_overload_mute():
    """75 us de-emphasis rolls off highs; overload mutes hot channels
    (`rx_sound.cpp:898-908, 989-1014`)."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    from flydog_sdr_gps_tpu.models import rx_channel as rx
    from flydog_sdr_gps_tpu.ops import demod
    params = rx.RxParams(num_channels=2, audio_block=128)
    tuning = rx.default_tuning(
        params, freqs_hz=[7.1e6, 7.1e6],
        modes=[demod.MODE_NBFM, demod.MODE_NBFM])
    tuning = dataclasses.replace(
        tuning,
        deemph_on=jnp.asarray([True, False]),
        manual_gain_db=jnp.full(2, 30.0, jnp.float32),  # AGC off
        squelch_thresh=jnp.zeros(2, jnp.float32))
    state = rx.init_state(params)
    from flydog_sdr_gps_tpu.numerology import ADC_CLOCK_NOM
    n = params.ddc.adc_block
    t = np.arange(n) / ADC_CLOCK_NOM
    # NBFM carrier with a 3 kHz (high) tone
    dev = 3000.0
    mod = np.sin(2 * np.pi * 3000.0 * t)
    phase = 2 * np.pi * 7.1e6 * t + dev / 3000.0 * (-np.cos(2 * np.pi * 3000.0 * t))
    x = (0.4 * np.cos(phase)).astype(np.float32)
    step = jax.jit(lambda s, tn, xx: rx.rx_block(params, s, tn, xx))
    for _ in range(6):
        state, taps = step(state, tuning, jnp.asarray(x))
    a = np.asarray(taps.audio)
    # compare the 3 kHz tone magnitude between the two channels: the
    # one-pole 75us filter attenuates 3 kHz to ~0.64
    w0 = np.abs(np.fft.rfft(a[:, 0] * np.hanning(len(a))))
    w1 = np.abs(np.fft.rfft(a[:, 1] * np.hanning(len(a))))
    b3k = int(round(3000.0 * len(a) / 12000.0))
    tone_de = w0[b3k - 1:b3k + 2].max()
    tone_raw = w1[b3k - 1:b3k + 2].max()
    assert tone_de < 0.8 * tone_raw, (tone_de, tone_raw)
    assert tone_de > 0.4 * tone_raw, (tone_de, tone_raw)

    # overload mute: drop the threshold below the carrier level
    tuning2 = dataclasses.replace(
        tuning, mute_over_dbm=jnp.asarray([-60.0, 20.0], jnp.float32))
    state, taps = step(state, tuning2, jnp.asarray(x))
    a = np.asarray(taps.audio)
    assert np.all(a[:, 0] == 0.0)
    assert np.any(a[:, 1] != 0.0)


def test_spectral_nr_mmse_rule_beats_subtraction():
    """EMNR-style MMSE-LSA gain (decision-directed a-priori SNR)
    outperforms plain spectral subtraction on the bursty probe
    (`rx/wdsp` EMNR role)."""
    rng = np.random.default_rng(6)
    n = 16384
    t = np.arange(n) / FS
    burst = ((t * FS) // 2048 % 2 == 0)
    sig = (np.sin(2 * np.pi * 800 * t) * burst).astype(np.float32)
    nse = 0.3 * rng.standard_normal(n).astype(np.float32)
    x = (sig + nse)[:, None]

    def run(rule):
        p = noise.SpectralNRParams(gain_rule=rule)
        st = noise.init_spectral_nr(p, 1)
        outs = []
        for i in range(n // 512):
            y, st = noise.spectral_nr_block(
                p, jnp.asarray(x[i * 512:(i + 1) * 512]), st)
            outs.append(np.asarray(y[:, 0]))
        return np.concatenate(outs), p

    def snr(sigl):
        spec = np.abs(np.fft.rfft(sigl * np.hanning(len(sigl)))) ** 2
        f = np.fft.rfftfreq(len(sigl), 1 / FS)
        sb = (f > 700) & (f < 900)
        return 10 * np.log10(spec[sb].sum() / spec[~sb].sum())

    y_sub, p = run("subtract")
    y_mmse, _ = run("mmse")
    d = p.hop
    sl = slice(n // 2, n - d)
    s_in = snr((sig + nse)[sl])
    s_sub = snr(y_sub[d:][sl])
    s_mmse = snr(y_mmse[d:][sl])
    assert s_mmse > s_in + 8.0, (s_in, s_mmse)
    assert s_mmse > s_sub + 2.0, (s_sub, s_mmse)
