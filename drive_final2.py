"""End-of-round validation: entry() + rx chain on TPU after refactors."""
import time
import numpy as np
import jax, jax.numpy as jnp

import __graft_entry__ as ge
print("device:", jax.devices()[0], flush=True)
t0 = time.time()
fn, args = ge.entry()
out_state, taps = jax.jit(fn)(*args)
a = np.asarray(taps.audio)
print(f"entry(): {time.time()-t0:.1f}s, audio {a.shape}, finite={np.all(np.isfinite(a))}", flush=True)

# full receiver with a tone after the phase_ramp_long refactor
from flydog_sdr_gps_tpu.models import rx_channel as rx
from flydog_sdr_gps_tpu.ops import demod
from flydog_sdr_gps_tpu.numerology import ADC_CLOCK_NOM
params = rx.RxParams(num_channels=2, audio_block=2048)   # long-ramp path
tuning = rx.default_tuning(params, freqs_hz=[14.2e6, 7.0e6],
                           modes=[demod.MODE_USB, demod.MODE_AM])
state = rx.init_state(params)
n = params.ddc.adc_block
t = np.arange(n, dtype=np.float64)
x = np.cos(2*np.pi*(((14.2e6+1000)/ADC_CLOCK_NOM*t) % 1.0)).astype(np.float32)
step = jax.jit(lambda s, tn, xx: rx.rx_block(params, s, tn, xx))
t0=time.time()
state, taps = step(state, tuning, jnp.asarray(x))
a = np.asarray(taps.audio)[256:, 0]
print(f"audio_block=2048 block: {time.time()-t0:.1f}s", flush=True)
spec = np.abs(np.fft.rfft(a*np.hanning(len(a))))
f = np.fft.rfftfreq(len(a), 1/params.fs_out)
print(f"tone at {f[np.argmax(spec)]:.1f} Hz (expect 1000) via chunked ramp", flush=True)
