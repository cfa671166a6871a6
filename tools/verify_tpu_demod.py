"""TPU drive: demod fidelity pass (SAL/SAU/SAS, RSSI squelch, LMS NR).

Runs on the real axon TPU (default platform). Verifies:
1. SAM variants end-to-end: USB-only tone -> SAU/SAS-R hear it,
   SAL/SAS-L reject it.
2. LMS autonotch removes a steady heterodyne on an AM channel.
3. RSSI squelch silences a no-signal channel with squelch set.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

from flydog_sdr_gps_tpu.models import rx_channel as rx
from flydog_sdr_gps_tpu.ops import demod
from flydog_sdr_gps_tpu.numerology import ADC_CLOCK_NOM

print("devices:", jax.devices(), flush=True)

f0 = 10.0e6
params = rx.RxParams(num_channels=6, audio_block=256)
modes = [demod.MODE_SAM, demod.MODE_SAL, demod.MODE_SAU,
         demod.MODE_SAS, demod.MODE_AM, demod.MODE_USB]
tuning = rx.default_tuning(
    params, freqs_hz=[f0] * 4 + [5.0e6, 21.0e6], modes=modes,
    passbands=[(-5000.0, 5000.0)] * 4 + [(-4900.0, 4900.0),
                                         (300.0, 2700.0)])
import dataclasses
tuning = dataclasses.replace(
    tuning,
    nr_notch_on=jnp.asarray([0, 0, 0, 0, 1, 0], bool),
    squelch_thresh=jnp.asarray([0, 0, 0, 0, 0, 15.0], jnp.float32))
state = rx.init_state(params)
step = jax.jit(lambda s, t, x: rx.rx_block(params, s, t, x))

nblk = 90      # enough blocks to fill the 65-block RSSI ring
n = params.ddc.adc_block
t_all = np.arange(n * nblk, dtype=np.float64) / ADC_CLOCK_NOM
sig = (0.4 * np.cos(2 * np.pi * f0 * t_all) +
       0.2 * np.cos(2 * np.pi * (f0 + 1000.0) * t_all) +
       0.3 * (1 + 0.6 * np.cos(2 * np.pi * 1200.0 * t_all)) *
       np.cos(2 * np.pi * 5.0e6 * t_all)).astype(np.float32)
# nothing near 21 MHz: the USB channel sees noise floor only

t0 = time.time()
outs, outs2 = [], []
for i in range(nblk):
    blk = jax.device_put(jnp.asarray(sig[i * n:(i + 1) * n]))
    state, taps = step(state, tuning, blk)
    if i >= nblk - 5 or i == 0:
        outs.append(np.asarray(taps.audio))
        outs2.append(np.asarray(taps.audio2))
print(f"compile+run {nblk} blocks: {time.time()-t0:.1f}s", flush=True)

audio = np.concatenate(outs[1:])
audio2 = np.concatenate(outs2[1:])
FS = params.fs_out

def bp(a, flo, fhi):
    s = np.abs(np.fft.rfft(a * np.hanning(len(a)))) ** 2
    f = np.fft.rfftfreq(len(a), 1 / FS)
    return 10 * np.log10(s[(f >= flo) & (f <= fhi)].sum() + 1e-12)

p_sam = bp(audio[:, 0], 900, 1100)
p_sal = bp(audio[:, 1], 900, 1100)
p_sau = bp(audio[:, 2], 900, 1100)
p_sasl = bp(audio[:, 3], 900, 1100)
p_sasr = bp(audio2[:, 3], 900, 1100)
print(f"1kHz tone dB: sam={p_sam:.1f} sal={p_sal:.1f} sau={p_sau:.1f} "
      f"sas_l={p_sasl:.1f} sas_r={p_sasr:.1f}")
assert p_sau > p_sal + 20 and p_sasr > p_sasl + 20 and p_sam > p_sal + 15
print("PASS sideband variants")

p_notch = bp(audio[:, 4], 1100, 1300)
print(f"AM+notch residual 1.2kHz: {p_notch:.1f} dB")
# first-block (pre-adaptation) level for comparison
p_first = bp(outs[0][:, 4], 1100, 1300)
print(f"  first block level: {p_first:.1f} dB")
assert p_notch < p_first - 8
print("PASS LMS autonotch on TPU")

rms_sq = float(np.sqrt(np.mean(audio[:, 5] ** 2)))
print(f"squelched empty channel rms: {rms_sq:.2e}")
assert rms_sq < 1e-6
print("PASS RSSI squelch")
print("ALL TPU CHECKS PASS")
