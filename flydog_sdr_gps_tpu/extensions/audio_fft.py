"""FFT extension — audio/IQ spectrum + integration display.

Reference: `extensions/FFT/fft.cpp` + the SND-loop audio FFT tap
(`rx/rx_sound.cpp:175-220` specAF_FFT, 1024-pt).  Computes a windowed
spectrum of the post-AGC IQ on the device and streams dB rows.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import cplx as cplx_ops
from ..ops import fft as fft_ops
from ..ops import windows
from ..ops.cplx import Cplx
from . import Extension, ext_register

FFT_N = 1024


@ext_register
class AudioFFTExt(Extension):
    name = "FFT"

    def start(self, **params):
        self.navg = int(params.get("navg", 1))
        self._buf = None
        self._win = jnp.asarray(windows.window(windows.HANNING, FFT_N))
        self._acc = np.zeros(FFT_N, np.float64)
        self._count = 0

        def spectrum(re, im):
            z = Cplx(re * self._win, im * self._win)
            s = fft_ops.fftshift_axis(fft_ops.fft(z.reshape(1, -1))[0])
            return s.abs2()

        self._spectrum = jax.jit(spectrum)

    def process_block(self, taps) -> list:
        ch = self.rx_chan
        re = taps.iq_post_agc.re[:, ch]
        im = taps.iq_post_agc.im[:, ch]
        if self._buf is None:
            self._buf = (re, im)
            return []
        bre = jnp.concatenate([self._buf[0], re])[-FFT_N:]
        bim = jnp.concatenate([self._buf[1], im])[-FFT_N:]
        self._buf = (bre, bim)
        if bre.shape[0] < FFT_N:
            return []
        p = np.asarray(self._spectrum(bre, bim))
        self._acc += p
        self._count += 1
        if self._count < self.navg:
            return []
        row = 10.0 * np.log10(self._acc / self._count + 1e-30)
        self._acc[:] = 0
        self._count = 0
        return [("fft", row.astype("<f4").tobytes())]
