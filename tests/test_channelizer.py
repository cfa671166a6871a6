"""DDC golden tests: tone SNR, tuning accuracy, streaming consistency.

Mirrors the reference's signal-generator self-test methodology
(`verilog/rx/gen.v`, sig_gen extension): inject a known tone at the ADC
rate, tune a channel near it, and verify the baseband output is a clean
tone at the difference frequency with the expected amplitude.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from flydog_sdr_gps_tpu.ops import channelizer as chz
from flydog_sdr_gps_tpu.ops import cplx
from flydog_sdr_gps_tpu.ops import nco
from flydog_sdr_gps_tpu.numerology import ADC_CLOCK_NOM


def make_plan():
    return chz.make_ddc_plan(adc_clock=ADC_CLOCK_NOM, audio_block=512)


def run_ddc(plan, fcws, x, nblocks):
    bank_r, bank_i, dphi = chz.build_filterbank(plan, fcws)
    state = chz.init_ddc_state(plan, len(fcws))
    outs = []
    for b in range(nblocks):
        blk = x[b * plan.adc_block:(b + 1) * plan.adc_block]
        state, audio = chz.ddc_block(plan, state, jnp.asarray(blk),
                                     jnp.asarray(bank_r),
                                     jnp.asarray(bank_i),
                                     jnp.asarray(dphi))
        outs.append(cplx.to_numpy(audio))
    return np.concatenate(outs, axis=0)


def tone_metrics(audio, fs_out, f_expect):
    """Return (measured freq, amplitude, SINAD dB) of the dominant tone.

    Uses a 4-term Blackman-Harris window (-92 dB sidelobes) and a
    +-6-bin integration span so the measurement floor is ~ -90 dB even
    for worst-case half-bin tone placement (a Hann/3-bin measure caps
    at ~41 dB from mainlobe leakage alone).
    """
    from flydog_sdr_gps_tpu.ops.windows import window, BLACKMAN_HARRIS
    n = len(audio)
    w = window(BLACKMAN_HARRIS, n).astype(np.float64)
    spec = np.fft.fft(audio * w)
    p = np.abs(spec) ** 2
    peak = int(np.argmax(p))
    freqs = np.fft.fftfreq(n, 1.0 / fs_out)
    sig = p[[(peak + d) % n for d in range(-6, 7)]].sum()
    noise = p.sum() - sig
    # Parseval: sum|X|^2 over the tone's bins ~= A^2 * N * sum(w^2)
    amp = np.sqrt(sig / (n * np.sum(w ** 2)))
    sinad = 10 * np.log10(sig / max(noise, 1e-30))
    return freqs[peak], amp, sinad


def test_plan_numerology():
    plan = make_plan()
    assert plan.total_decim == 10416
    assert abs(plan.fs_out - ADC_CLOCK_NOM / 10416) < 1e-9
    assert plan.adc_block == 512 * 10416
    assert plan.l1 % plan.d1 == 0 and plan.l2 % plan.d2 == 0


def test_tone_snr_and_tuning():
    """Full-scale tone 1 kHz above the tuned freq -> 1 kHz baseband tone,
    amplitude ~1.0, SINAD >= 80 dB."""
    plan = make_plan()
    f_tuned = 7.040e6
    f_off = 1000.0
    fcw = nco.freq_to_fcw(f_tuned, ADC_CLOCK_NOM)
    nblocks = 3
    n = plan.adc_block * nblocks
    t = np.arange(n, dtype=np.float64)
    x = np.cos(2 * np.pi * (((f_tuned + f_off) / ADC_CLOCK_NOM * t) % 1.0)
               ).astype(np.float32)
    audio = run_ddc(plan, [fcw], x, nblocks)[:, 0]
    # drop filter warm-up
    audio = audio[64:]
    f_meas, amp, sinad = tone_metrics(audio, plan.fs_out, f_off)
    assert abs(f_meas - f_off) < plan.fs_out / len(audio) * 4, f_meas
    assert abs(amp - 1.0) < 0.01, amp
    assert sinad > 80.0, sinad


def test_out_of_band_rejection():
    """A full-scale tone 30 kHz away must be suppressed >= 80 dB."""
    plan = make_plan()
    f_tuned = 10.0e6
    fcw = nco.freq_to_fcw(f_tuned, ADC_CLOCK_NOM)
    n = plan.adc_block * 2
    t = np.arange(n, dtype=np.float64)
    x = np.cos(2 * np.pi * (f_tuned + 30e3) / ADC_CLOCK_NOM * t
               ).astype(np.float32)
    audio = run_ddc(plan, [fcw], x, 2)[:, 0][64:]
    power_db = 10 * np.log10(np.mean(np.abs(audio) ** 2) + 1e-30)
    assert power_db < -80.0, power_db


def test_multi_channel_independence():
    """Two channels tuned to different tones each see only their own."""
    plan = make_plan()
    fa, fb = 5.0e6, 12.5e6
    n = plan.adc_block * 2
    t = np.arange(n, dtype=np.float64)
    x = (0.5 * np.cos(2 * np.pi * (fa + 700.0) / ADC_CLOCK_NOM * t)
         + 0.25 * np.cos(2 * np.pi * (fb - 400.0) / ADC_CLOCK_NOM * t)
         ).astype(np.float32)
    fcws = [nco.freq_to_fcw(fa, ADC_CLOCK_NOM),
            nco.freq_to_fcw(fb, ADC_CLOCK_NOM)]
    audio = run_ddc(plan, fcws, x, 2)[64:]
    fm_a, amp_a, sinad_a = tone_metrics(audio[:, 0], plan.fs_out, 700.0)
    fm_b, amp_b, sinad_b = tone_metrics(audio[:, 1], plan.fs_out, -400.0)
    assert abs(fm_a - 700.0) < 10 and abs(amp_a - 0.5) < 0.01
    assert abs(fm_b + 400.0) < 10 and abs(amp_b - 0.25) < 0.005
    assert sinad_a > 60 and sinad_b > 60


def test_20k_family_rx3():
    """The 20.25 kHz firmware family (rx3, decim 6172 = 1543*4)."""
    from flydog_sdr_gps_tpu.numerology import CONFIGS, SND_RATE_20K
    from flydog_sdr_gps_tpu.models import rx_channel as rxm
    plan = chz.make_ddc_plan(snd_rate=SND_RATE_20K, audio_block=256)
    assert plan.total_decim == 6172
    assert abs(plan.fs_out - ADC_CLOCK_NOM / 6172) < 1e-9
    f_tuned = 9.5e6
    fcw = nco.freq_to_fcw(f_tuned, ADC_CLOCK_NOM)
    n = plan.adc_block * 3
    t = np.arange(n, dtype=np.float64)
    x = np.cos(2 * np.pi * (((f_tuned + 2000.0) / ADC_CLOCK_NOM * t)
                            % 1.0)).astype(np.float32)
    audio = run_ddc(plan, [fcw], x, 3)[:, 0][64:]
    f_meas, amp, sinad = tone_metrics(audio, plan.fs_out, 2000.0)
    assert abs(f_meas - 2000.0) < 30 and abs(amp - 1.0) < 0.02
    assert sinad > 75.0, sinad
    # the firmware config factory plumbs through
    params = rxm.RxParams.from_config(CONFIGS["rx3.wf3"],
                                      audio_block=256)
    assert params.num_channels == 3
    assert abs(params.fs_out - ADC_CLOCK_NOM / 6172) < 1e-9


def test_streaming_equals_batch():
    """Block-by-block streaming must bit-match a single long run."""
    plan = chz.make_ddc_plan(audio_block=128)
    fcw = nco.freq_to_fcw(3.33e6, ADC_CLOCK_NOM)
    rng = np.random.default_rng(42)
    n = plan.adc_block * 4
    x = rng.standard_normal(n).astype(np.float32) * 0.1
    a1 = run_ddc(plan, [fcw], x, 4)
    plan2 = chz.make_ddc_plan(audio_block=512)
    a2 = run_ddc(plan2, [fcw], x, 1)
    np.testing.assert_allclose(a1[:, 0], a2[:, 0], atol=1e-6)
