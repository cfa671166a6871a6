"""Demod fidelity: SAM sideband variants (SAL/SAU/SAS), the all-mode
RSSI squelch, and the LMS NR chain wired through the live pipeline.

Reference behavior under test:
- `rx/wdsp/SAM_demod.cpp` MODE_SAL/SAU select one sideband after PLL
  lock; MODE_SAS emits stereo L=LSB / R=USB.
- `rx/rx_sound.cpp:951-987` squelches EVERY mode via a median-RSSI
  noise floor with hysteresis and tail.
- `rx/rx_sound.cpp:922-948` dispatches LMS autonotch/denoise NR.
"""

import numpy as np
import jax.numpy as jnp

from flydog_sdr_gps_tpu.models import rx_channel as rx
from flydog_sdr_gps_tpu.numerology import ADC_CLOCK_NOM
from flydog_sdr_gps_tpu.ops import demod, noise

FS = 12_000.0


# ---------------------------------------------------------------------------
# SAL / SAU / SAS through the full rx_block
# ---------------------------------------------------------------------------

def _band_power_db(a: np.ndarray, f_lo: float, f_hi: float) -> float:
    spec = np.abs(np.fft.rfft(a * np.hanning(len(a)))) ** 2
    f = np.fft.rfftfreq(len(a), 1 / FS)
    sel = (f >= f_lo) & (f <= f_hi)
    return 10 * np.log10(spec[sel].sum() + 1e-12)


def test_sam_sideband_variants_end_to_end():
    f0 = 10.0e6
    params = rx.RxParams(num_channels=4, audio_block=256)
    modes = [demod.MODE_SAM, demod.MODE_SAL, demod.MODE_SAU,
             demod.MODE_SAS]
    tuning = rx.default_tuning(
        params, freqs_hz=[f0] * 4, modes=modes,
        passbands=[(-5000.0, 5000.0)] * 4)
    state = rx.init_state(params)

    nblk = 14
    n = params.ddc.adc_block * nblk
    t = np.arange(n, dtype=np.float64) / ADC_CLOCK_NOM
    # carrier at f0 plus a single tone 1 kHz ABOVE it (pure USB energy)
    x = (0.4 * np.cos(2 * np.pi * f0 * t) +
         0.2 * np.cos(2 * np.pi * (f0 + 1000.0) * t)).astype(np.float32)

    outs, outs2 = [], []
    for i in range(nblk):
        blk = jnp.asarray(x[i * params.ddc.adc_block:
                            (i + 1) * params.ddc.adc_block])
        state, taps = rx.rx_block(params, state, tuning, blk)
        outs.append(np.asarray(taps.audio))
        outs2.append(np.asarray(taps.audio2))
    audio = np.concatenate(outs)[-1024:]       # settled tail
    audio2 = np.concatenate(outs2)[-1024:]

    p = {m: _band_power_db(audio[:, i], 900, 1100)
         for i, m in enumerate(("sam", "sal", "sau", "sas_l"))}
    p["sas_r"] = _band_power_db(audio2[:, 3], 900, 1100)

    # plain SAM and SAU hear the tone; SAL rejects it hard
    assert p["sau"] > p["sal"] + 20.0, p
    assert p["sam"] > p["sal"] + 15.0, p
    # SAS stereo: right (USB) carries the tone, left (LSB) does not
    assert p["sas_r"] > p["sas_l"] + 20.0, p
    # mono modes: audio2 mirrors audio exactly
    np.testing.assert_array_equal(audio2[:, :3], audio[:, :3])


def test_sam_sideband_lsb_tone():
    """Mirror case: tone BELOW the carrier lands in SAL/SAS-left."""
    f0 = 7.0e6
    params = rx.RxParams(num_channels=2, audio_block=256)
    tuning = rx.default_tuning(
        params, freqs_hz=[f0] * 2,
        modes=[demod.MODE_SAL, demod.MODE_SAU],
        passbands=[(-5000.0, 5000.0)] * 2)
    state = rx.init_state(params)
    nblk = 14
    n = params.ddc.adc_block * nblk
    t = np.arange(n, dtype=np.float64) / ADC_CLOCK_NOM
    x = (0.4 * np.cos(2 * np.pi * f0 * t) +
         0.2 * np.cos(2 * np.pi * (f0 - 1500.0) * t)).astype(np.float32)
    for i in range(nblk):
        blk = jnp.asarray(x[i * params.ddc.adc_block:
                            (i + 1) * params.ddc.adc_block])
        state, taps = rx.rx_block(params, state, tuning, blk)
    audio = np.asarray(taps.audio)
    p_sal = _band_power_db(audio[:, 0], 1400, 1600)
    p_sau = _band_power_db(audio[:, 1], 1400, 1600)
    assert p_sal > p_sau + 20.0, (p_sal, p_sau)


# ---------------------------------------------------------------------------
# all-mode RSSI squelch
# ---------------------------------------------------------------------------

def test_rssi_squelch_opens_on_signal():
    c = 1
    st = demod.init_rssi_squelch(c)
    sq = jnp.asarray([20.0], jnp.float32)          # 20 dB above floor
    audio = jnp.ones((64, c), jnp.float32)
    floor = jnp.asarray([-100.0], jnp.float32)

    # warmup: noise-floor blocks fill the ring; gate stays closed
    for _ in range(demod.N_RSSI + 5):
        y, st = demod.rssi_squelch(audio, floor, st, sq)
    assert float(jnp.max(jnp.abs(y))) == 0.0

    # strong carrier: floor median -100, thresh -80 -> -60 opens
    strong = jnp.asarray([-60.0], jnp.float32)
    y, st = demod.rssi_squelch(audio, strong, st, sq, tail_blocks=2)
    assert float(jnp.max(jnp.abs(y))) == 1.0
    # signal drops: the tail keeps it open one block, then it closes
    y, st = demod.rssi_squelch(audio, floor, st, sq, tail_blocks=2)
    assert float(jnp.max(jnp.abs(y))) == 1.0       # inside the tail
    for _ in range(4):
        y, st = demod.rssi_squelch(audio, floor, st, sq, tail_blocks=2)
    assert float(jnp.max(jnp.abs(y))) == 0.0


def test_rssi_squelch_disabled_passes():
    st = demod.init_rssi_squelch(2)
    audio = jnp.ones((32, 2), jnp.float32)
    y, st = demod.rssi_squelch(audio, jnp.asarray([-80.0, -80.0]),
                               st, jnp.zeros(2))
    np.testing.assert_array_equal(np.asarray(y), np.ones((32, 2)))


# ---------------------------------------------------------------------------
# LMS NR chain
# ---------------------------------------------------------------------------

def test_lms_chain_notch_and_passthrough():
    notch_p = noise.LmsParams(taps=32, delay=4, mu=0.05, notch=True)
    den_p = noise.LmsParams(taps=32, delay=4, mu=0.02, notch=False)
    n = 4096
    t = np.arange(n) / FS
    tone = np.sin(2 * np.pi * 1000 * t).astype(np.float32)
    x = jnp.asarray(np.stack([tone, tone], axis=1))   # 2 channels
    st_n = noise.init_lms(notch_p, 2)
    st_d = noise.init_lms(den_p, 2)
    # ch0: autonotch on; ch1: everything off (must be bit-identical in)
    en_n = jnp.asarray([True, False])
    en_d = jnp.asarray([False, False])
    y, st_n, st_d = noise.lms_chain_block(notch_p, den_p, x, st_n, st_d,
                                          en_n, en_d)
    y = np.asarray(y)
    assert np.mean(y[-512:, 0] ** 2) < 0.1 * np.mean(tone[-512:] ** 2)
    np.testing.assert_array_equal(y[:, 1], tone)


def test_lms_wired_into_rx_block():
    """A steady heterodyne on an AM channel disappears when the
    autonotch is enabled via tuning (the reference's NR_ORIG path)."""
    f0 = 5.0e6
    params = rx.RxParams(num_channels=2, audio_block=256)
    tuning = rx.default_tuning(params, freqs_hz=[f0] * 2,
                               modes=[demod.MODE_AM] * 2)
    import dataclasses
    tuning = dataclasses.replace(
        tuning, nr_notch_on=jnp.asarray([True, False]))
    state = rx.init_state(params)
    nblk = 12
    n = params.ddc.adc_block * nblk
    t = np.arange(n, dtype=np.float64) / ADC_CLOCK_NOM
    # AM carrier + steady 1.2 kHz audio tone (as a heterodyne would be)
    msg = 0.6 * np.cos(2 * np.pi * 1200.0 * t)
    x = (0.4 * (1 + msg) * np.cos(2 * np.pi * f0 * t)).astype(np.float32)
    outs = []
    for i in range(nblk):
        blk = jnp.asarray(x[i * params.ddc.adc_block:
                            (i + 1) * params.ddc.adc_block])
        state, taps = rx.rx_block(params, state, tuning, blk)
        outs.append(np.asarray(taps.audio))
    audio = np.concatenate(outs)
    tail = audio[-1024:]
    p_notched = _band_power_db(tail[:, 0], 1100, 1300)
    p_plain = _band_power_db(tail[:, 1], 1100, 1300)
    assert p_plain > p_notched + 10.0, (p_plain, p_notched)
