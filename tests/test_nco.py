"""48-bit NCO: exactness vs Python big-int reference, spectral purity."""

import numpy as np
import jax.numpy as jnp
import pytest

from flydog_sdr_gps_tpu.ops import nco
from flydog_sdr_gps_tpu.numerology import ADC_CLOCK_NOM, PHASE_BITS

MOD = 1 << PHASE_BITS


def test_fcw_round_trip():
    for f in [0.0, 10e6, 7.1234567e6, -3e6, 62.4e6]:
        fcw = nco.freq_to_fcw(f, ADC_CLOCK_NOM)
        assert 0 <= fcw < MOD
        back = nco.fcw_to_freq(fcw, ADC_CLOCK_NOM)
        # 48-bit resolution at 125 MHz ~ 0.44 uHz
        assert abs(back - f) < 1e-6


def test_limb_round_trip():
    rng = np.random.default_rng(0)
    words = [int(x) for x in rng.integers(0, MOD, size=32, dtype=np.int64)]
    limbs = nco.to_limbs(words)
    assert limbs.shape == (32, 3)
    back = nco.from_limbs(limbs)
    assert list(back) == words


def test_limb_add_scale_exact():
    rng = np.random.default_rng(1)
    a = [int(x) for x in rng.integers(0, MOD, size=16, dtype=np.int64)]
    b = [int(x) for x in rng.integers(0, MOD, size=16, dtype=np.int64)]
    got = nco.from_limbs(np.asarray(nco.limb_add(nco.to_limbs(a),
                                                 nco.to_limbs(b))))
    assert list(got) == [(x + y) % MOD for x, y in zip(a, b)]

    for k in [0, 1, 7, 16383, 16384]:
        got = nco.from_limbs(np.asarray(nco.limb_scale(nco.to_limbs(a), k)))
        assert list(got) == [(k * x) % MOD for x in a]


def test_phase_ramp_exact():
    fcw = nco.freq_to_fcw(7.040123e6, ADC_CLOCK_NOM)
    phi0 = 123456789012345 % MOD
    num = 4096
    ph = np.asarray(nco.phase_ramp(nco.to_limbs([phi0])[0],
                                   nco.to_limbs([fcw])[0], num))
    expect = np.array([((phi0 + k * fcw) % MOD) / MOD for k in range(num)],
                      np.float64)
    assert ph.shape == (num,)
    np.testing.assert_allclose(ph, expect, atol=2 ** -23)


def test_advance_matches_ramp_end():
    fcw = nco.freq_to_fcw(14.1e6, ADC_CLOCK_NOM)
    limb = nco.to_limbs([fcw])[0]
    phi = nco.to_limbs([0])[0]
    # long advance, exceeding MAX_RAMP, static int
    n = 5_332_992
    out = int(nco.from_limbs(np.asarray(nco.advance(phi, limb, n))))
    assert out == (n * fcw) % MOD
    # traced int path
    out2 = int(nco.from_limbs(np.asarray(nco.advance(phi, limb,
                                                     jnp.int32(12345)))))
    assert out2 == (12345 * fcw) % MOD


def test_tone_purity():
    """Tone SNR from f32 sin/cos of exact phase should exceed 100 dB.

    The tone is placed exactly on FFT bin 1000 (fcw = 2**48 * 1000/8192
    is exact) so no window is needed and the measurement floor is the
    f32 sin/cos error itself, not spectral leakage.
    """
    n = 8192
    fcw = (1000 << 48) // n
    z = np.asarray(nco.tone(nco.to_limbs([0])[0], nco.to_limbs([fcw])[0], n))
    spec = np.abs(np.fft.fft(z)) ** 2
    peak_bin = int(np.argmax(spec))
    assert peak_bin == 1000
    sig = spec[peak_bin]
    noise = spec.sum() - sig
    snr_db = 10 * np.log10(sig / max(noise, sig * 1e-30))
    assert snr_db > 100, snr_db


def test_phase_continuity_across_blocks():
    """Streamed blocks with advance() must equal one long exact ramp."""
    fcw = nco.freq_to_fcw(10.000e6, ADC_CLOCK_NOM)
    limb = nco.to_limbs([fcw])[0]
    phi = nco.to_limbs([987654321] )[0]
    blocks = []
    p = phi
    for _ in range(3):
        blocks.append(np.asarray(nco.phase_ramp(p, limb, 1000)))
        p = nco.advance(p, limb, 1000)
    got = np.concatenate(blocks)
    expect = np.asarray(nco.phase_ramp(phi, limb, 3000))
    np.testing.assert_array_equal(got, expect)
