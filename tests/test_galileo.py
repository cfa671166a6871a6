"""Galileo E1B: Viterbi K=7, interleaver, code-FFT acquisition."""

import numpy as np
import pytest

from flydog_sdr_gps_tpu.models.gps import acquisition, galileo


def test_viterbi_round_trip_clean():
    rng = np.random.default_rng(0)
    bits = np.concatenate([rng.integers(0, 2, 114).astype(np.uint8),
                           np.zeros(6, np.uint8)])      # tail
    coded = galileo.conv_encode_k7(bits)
    soft = 2.0 * coded - 1.0
    got = galileo.viterbi_decode_k7(soft)
    np.testing.assert_array_equal(got, bits)


def test_viterbi_with_noise():
    rng = np.random.default_rng(1)
    bits = np.concatenate([rng.integers(0, 2, 114).astype(np.uint8),
                           np.zeros(6, np.uint8)])
    coded = galileo.conv_encode_k7(bits).astype(np.float64)
    soft = (2 * coded - 1) + rng.standard_normal(len(coded)) * 0.8
    got = galileo.viterbi_decode_k7(soft)
    np.testing.assert_array_equal(got, bits)


def test_interleaver_round_trip():
    rng = np.random.default_rng(2)
    syms = rng.integers(0, 2, 240).astype(np.uint8)
    np.testing.assert_array_equal(
        galileo.inav_deinterleave(galileo.inav_interleave(syms)), syms)


def test_e1b_acquisition_with_synthetic_code():
    """A synthetic 4092-chip memory code is acquired through the same
    FFT search plumbing as C/A."""
    rng = np.random.default_rng(3)
    code = (1 - 2 * rng.integers(0, 2, 4092)).astype(np.int8)
    p = acquisition.AcqParams()
    cf = galileo.e1b_code_fft(p, code)
    assert cf.shape == (p.fft_len,)

    # synthesize IF containing that code (BOC ignored at this SNR —
    # use the same sampled waveform the search correlates against)
    chips = np.floor(np.arange(p.fft_len)
                     * (4092 / 16368.0)).astype(np.int64)
    boc = np.where((np.arange(p.fft_len) * 2 * 4092 // 16368) % 2 == 0,
                   1.0, -1.0)
    wave = code[np.clip(chips, 0, 4091)] * boc
    shift = 5000
    wave = np.roll(wave, shift)
    # upconvert to the 16.368 Msps IF grid
    t = np.arange(p.n_raw) / p.fs_if
    bb = np.repeat(wave, p.decim)[:p.n_raw]
    x = np.sign(1.2 * bb * np.cos(2 * np.pi * p.fc * t)
                + 0.3 * rng.standard_normal(p.n_raw)).astype(np.float32)

    from flydog_sdr_gps_tpu.ops import cplx
    bb_dev = acquisition.downsample_if(p, x)
    snr, cp, dop = acquisition.acquire(
        p, bb_dev, cplx.from_numpy(cf[None, :]),
        code_period_samples=p.fft_len, chips_per_period=4092)
    assert float(snr[0]) > 100.0, float(snr[0])
    assert abs(float(dop[0])) < 260.0, float(dop[0])
    # recovered code phase: roll(wave, +shift) DELAYS the code, so the
    # replica alignment is cp = -shift (in chips), mod one period
    expect_chips = (-shift * 4092.0 / 16368.0) % 4092
    dcp = abs(float(cp[0]) - expect_chips) % 4092
    dcp = min(dcp, 4092 - dcp)
    assert dcp < 2.0, (float(cp[0]), expect_chips)
