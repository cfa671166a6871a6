"""MXU matmul-FFT vs numpy reference."""

import numpy as np
import pytest

from flydog_sdr_gps_tpu.ops import cplx, fft


@pytest.mark.parametrize("n", [16, 64, 256, 1024, 8192, 16384])
def test_fft_matches_numpy(n):
    rng = np.random.default_rng(n)
    z = (rng.standard_normal(n) + 1j * rng.standard_normal(n)
         ).astype(np.complex64)
    got = cplx.to_numpy(fft.fft(cplx.from_numpy(z)))
    ref = np.fft.fft(z)
    err = np.abs(got - ref).max() / np.abs(ref).max()
    assert err < 2e-6 * np.sqrt(n), err


@pytest.mark.parametrize("n", [256, 1024, 4096])
def test_ifft_round_trip(n):
    rng = np.random.default_rng(n + 1)
    z = (rng.standard_normal(n) + 1j * rng.standard_normal(n)
         ).astype(np.complex64)
    back = cplx.to_numpy(fft.ifft(fft.fft(cplx.from_numpy(z))))
    err = np.abs(back - z).max()
    assert err < 1e-4, err


def test_fft_batched():
    rng = np.random.default_rng(7)
    z = (rng.standard_normal((5, 1024)) + 1j * rng.standard_normal((5, 1024))
         ).astype(np.complex64)
    got = cplx.to_numpy(fft.fft(cplx.from_numpy(z)))
    ref = np.fft.fft(z, axis=-1)
    assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-4


def test_fft_tone_bin():
    n = 8192
    k = 517
    t = np.arange(n)
    z = np.exp(2j * np.pi * k * t / n).astype(np.complex64)
    spec = np.abs(cplx.to_numpy(fft.fft(cplx.from_numpy(z))))
    assert np.argmax(spec) == k
    assert abs(spec[k] - n) / n < 1e-5
