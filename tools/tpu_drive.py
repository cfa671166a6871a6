"""Verify drive: end-to-end receiver on the real TPU (axon).

Used by the /verify workflow: 4-channel scene, demod checks, and an
on-device pallas-vs-poly stage-2 agreement check.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from flydog_sdr_gps_tpu.models import rx_channel as rx
from flydog_sdr_gps_tpu.ops import demod
from flydog_sdr_gps_tpu.numerology import ADC_CLOCK_NOM

print("device:", jax.devices()[0], flush=True)
params = rx.RxParams(num_channels=4)   # stage2="auto" -> poly at C=4 (untileable), pallas checked below
tuning = rx.default_tuning(params,
    freqs_hz=[7.1e6, 14.2e6, 28.5e6, 21.0e6],
    modes=[demod.MODE_AM, demod.MODE_USB, demod.MODE_NBFM, demod.MODE_USB])
state = rx.init_state(params)
step = jax.jit(lambda s, t, x: rx.rx_block(params, s, t, x))

nb = params.ddc.adc_block
t = np.arange(nb * 6) / ADC_CLOCK_NOM
x_all = (0.5*(1+0.5*np.cos(2*np.pi*1000*t))*np.cos(2*np.pi*((7.1e6*t)%1.0))
        + 0.4*np.cos(2*np.pi*(((14.2e6+1200.0)*t)%1.0))
        + 0.4*np.cos(2*np.pi*((28.5e6*t)%1.0) + 1.5*np.sin(2*np.pi*800*t))
        ).astype(np.float32)
rows = []
import time
for b in range(6):
    t0=time.time()
    xb = jnp.asarray(x_all[b*nb:(b+1)*nb])
    state, taps = step(state, tuning, xb)
    rows.append(np.asarray(taps.audio))
    print(f"block {b}: {time.time()-t0:.1f}s", flush=True)
sm = np.asarray(taps.smeter_dbm)
audio = np.concatenate(rows)[1024:]
fs = params.fs_out
def tone(a, lo=100.0):
    w = np.abs(np.fft.rfft(a*np.hanning(len(a))))
    f = np.fft.rfftfreq(len(a), 1/fs)
    sel = f>=lo
    return f[sel][np.argmax(w[sel])]
print("AM mod tone:", round(tone(audio[:,0]),1), "Hz (want 1000)")
print("USB offset:", round(tone(audio[:,1]),1), "Hz (want 1200)")
print("FM tone:", round(tone(audio[:,2]),1), "Hz (want 800)")
print("empty ch rms:", float(np.sqrt(np.mean(audio[:,3]**2))))
print("smeter dBm:", np.round(sm,1), flush=True)
assert abs(tone(audio[:,0])-1000)<30 and abs(tone(audio[:,1])-1200)<30
assert abs(tone(audio[:,2])-800)<30

from flydog_sdr_gps_tpu.ops import channelizer as chz
from flydog_sdr_gps_tpu.ops.cplx import Cplx
plan = params.ddc
rng = np.random.default_rng(0)
kp = plan.k1 + plan.tail2
y = Cplx(jnp.asarray(rng.standard_normal((kp,128)),jnp.float32),
         jnp.asarray(rng.standard_normal((kp,128)),jnp.float32))
a = chz.stage2_apply(plan, y, method="pallas")
b = chz.stage2_apply(plan, y, method="poly")
err = float(jnp.max(jnp.abs(a.re-b.re)) + jnp.max(jnp.abs(a.im-b.im)))
ref = float(jnp.max(jnp.abs(b.re)))
print("pallas vs poly max err:", err, "scale:", ref, flush=True)
assert err < 2e-5 * max(ref,1.0), err
print("TPU DRIVE OK", flush=True)
