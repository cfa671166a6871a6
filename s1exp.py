import time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from flydog_sdr_gps_tpu.ops import channelizer as chz

plan = chz.make_ddc_plan(audio_block=512)
C = 1024
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal(plan.adc_block + plan.tail1).astype(np.float32))
bank = jnp.asarray(rng.standard_normal((plan.l1, 2*C)).astype(np.float32))
PREC = lax.Precision.HIGH

def frame_mm(xx):
    fr = chz.frame(xx, plan.d1, plan.m1)
    return jnp.dot(fr, bank, precision=PREC)

def partial_mm(xx):
    # y = sum_i r[i:i+K] @ bank[i*D:(i+1)*D]  — no frame materialization
    r = xx.reshape(-1, plan.d1)
    k = r.shape[0] - (plan.m1 - 1)
    acc = jnp.dot(r[0:k], bank[:plan.d1], precision=PREC)
    for i in range(1, plan.m1):
        acc = acc + jnp.dot(r[i:i+k], bank[i*plan.d1:(i+1)*plan.d1],
                            precision=PREC)
    return acc

for name, f in [("partial_mm", partial_mm), ("frame_mm", frame_mm)]:
    g = jax.jit(f)
    t0=time.time(); out = g(x); s=float(np.asarray(out).sum())
    print(name, "compile", round(time.time()-t0,1), "s  sum", round(s,1), flush=True)
    best = 1e9
    for _ in range(6):
        t0=time.time(); out = g(x); _=np.asarray(out[0,:4]); best=min(best, time.time()-t0)
    print(name, "best", round(best*1000,2), "ms (incl ~25ms dispatch)", flush=True)
