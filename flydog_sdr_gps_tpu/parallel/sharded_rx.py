"""The multi-chip receiver step: one shard_map over a (time, chan) mesh.

Parallel decomposition of `models.rx_channel.rx_block`:

1. **Front half (DDC, 125 Msps)** — the ADC block is sharded along
   'time' (each device takes a contiguous time slice) and the filter
   bank along 'chan'.  Filter history crosses time-shard boundaries:
   each device needs the last ``tail1`` raw samples of its left
   neighbor (stage 1) and the last ``tail2`` stage-1 outputs (stage 2)
   — exchanged with `lax.ppermute`, the halo pattern of
   sequence-parallel ML (reference analogue: the FastFIR overlap-save
   tail and CIC state that the reference carries between buffers,
   SURVEY.md section 5).  Time shard 0 consumes the carried global
   tails instead.  The 48-bit NCO phase for shard t is
   ``advance(phi, dphi, t * k1_local)`` — exact, no drift.

2. **Back half (audio rate)** — purely channel-parallel, so channels
   are re-sharded over ALL devices: all_gather the DDC output along
   'time', slice the local channel group, run the audio chain
   (passband FIR / AGC / demods / squelch), emit audio partitioned
   over the combined ('chan', 'time') axis.

Requirements: C % (K*T) == 0, audio_block % T == 0, and
``audio_block/T * d2 >= tail2`` (halo must fit in one neighbor shard).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..models import rx_channel as rx
from ..ops import agc as agc_ops
from ..ops import channelizer as chz
from ..ops import cplx as cplx_ops
from ..ops import demod as demod_ops
from ..ops import nco
from ..ops import noise as noise_ops
from ..ops.cplx import Cplx


def _state_specs(params: rx.RxParams) -> rx.RxState:
    """PartitionSpec pytree for RxState under the (time, chan) mesh."""
    cc = ("chan", "time")      # combined channel axis for the back half
    return rx.RxState(
        ddc=chz.DDCState(
            x_tail=P(None),
            y_tail=Cplx(P(None, "chan"), P(None, "chan")),
            phi1=P("chan", None),
        ),
        fir_tail=Cplx(P(None, cc), P(None, cc)),
        agc=agc_ops.AgcState(delay=Cplx(P(None, cc), P(None, cc)),
                             env_db=P(cc), hang=P(cc)),
        dc=P(None, cc),
        sam=demod_ops.SamState(phase=P(cc), freq=P(cc), dc=P(None, cc)),
        fm_last=Cplx(P(cc), P(cc)),
        squelch=demod_ops.SquelchState(noise=P(cc), open_=P(cc),
                                       tail=P(cc)),
        rssi_sq=demod_ops.RssiSquelchState(
            ring=P(None, cc), count=P(), open_=P(cc), tail=P(cc)),
        nb_mavg=P(cc),
        nr=noise_ops.SpectralNRState(
            in_tail=P(None, cc), out_tail=P(None, cc),
            psd_smooth=P(None, cc), min_ring=P(None, None, cc),
            xhat2=P(None, cc)),
        lms_notch=noise_ops.LmsState(weights=P(None, cc),
                                     line=P(None, cc)),
        lms_den=noise_ops.LmsState(weights=P(None, cc),
                                   line=P(None, cc)),
        sb_tail=Cplx(P(None, cc), P(None, cc)),
        smeter=P(cc),
        deemph=P(cc),
    )


def _tuning_specs() -> rx.RxTuning:
    cc = ("chan", "time")
    return rx.RxTuning(
        bank_r=P(None, "chan"), bank_i=P(None, "chan"),
        dphi1=P("chan", None),
        pb_coef=Cplx(P(None, cc), P(None, cc)),
        mode=P(cc), manual_gain_db=P(cc), squelch_thresh=P(cc),
        nb_on=P(cc), nb_wild=P(cc), deemph_on=P(cc),
        mute_over_dbm=P(cc), nr_on=P(cc), nr_notch_on=P(cc),
        nr_den_on=P(cc), fm_deviation=P(),
    )


def _taps_specs() -> rx.RxTaps:
    cc = ("chan", "time")
    return rx.RxTaps(
        audio=P(None, cc),
        audio2=P(None, cc),
        iq_pre_fir=Cplx(P(None, cc), P(None, cc)),
        iq_post_agc=Cplx(P(None, cc), P(None, cc)),
        smeter_dbm=P(cc),
    )


def shard_rx_state(state: rx.RxState, mesh: Mesh,
                   params: rx.RxParams) -> rx.RxState:
    """Place an RxState on the mesh with the canonical shardings."""
    specs = _state_specs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        state, specs,
        is_leaf=lambda x: isinstance(x, jax.Array) or isinstance(x, P))


def shard_rx_tuning(tuning: rx.RxTuning, mesh: Mesh) -> rx.RxTuning:
    specs = _tuning_specs()
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        tuning, specs,
        is_leaf=lambda x: isinstance(x, jax.Array) or isinstance(x, P))


def make_sharded_rx_step(params: rx.RxParams, mesh: Mesh):
    """Build the jitted multi-device receiver step.

    Returns ``step(state, tuning, x) -> (new_state, taps)`` where x is
    the full (adc_block,) float32 ADC block (sharded P('time')).
    """
    plan = params.ddc
    t_sz = mesh.shape["time"]
    k_sz = mesh.shape["chan"]
    c_total = params.num_channels
    if c_total % (t_sz * k_sz):
        raise ValueError(f"channels {c_total} not divisible by mesh "
                         f"{t_sz}x{k_sz}")
    if params.audio_block % t_sz:
        raise ValueError("audio_block must divide by time shards")
    k1_local = plan.k1 // t_sz
    if k1_local < plan.tail2:
        raise ValueError(
            f"time shard too small: k1_local={k1_local} < tail2="
            f"{plan.tail2}; raise audio_block or lower time shards")
    nl = plan.adc_block // t_sz
    c_chan = c_total // k_sz          # channels per 'chan' shard (DDC)
    c_local = c_chan // t_sz          # channels per device (back half)
    b = params.audio_block

    state_specs = _state_specs(params)
    tuning_specs = _tuning_specs()

    def fwd(state, tuning, x_sh):
        tidx = lax.axis_index("time")
        right = [(i, i + 1) for i in range(t_sz - 1)]

        # ---- stage 1 halo: previous shard's last tail1 raw samples ----
        halo1 = lax.ppermute(x_sh[-plan.tail1:], "time", right)
        left1 = jnp.where(tidx == 0, state.ddc.x_tail, halo1)
        x_ext = jnp.concatenate([left1, x_sh])
        phi_local = nco.advance(state.ddc.phi1, tuning.dphi1,
                                tidx * k1_local)
        prec = (lax.Precision.HIGH if params.precision == "high"
                else lax.Precision.HIGHEST)
        y1 = chz.stage1_apply(plan, x_ext, tuning.bank_r, tuning.bank_i,
                              phi_local, tuning.dphi1,
                              precision=prec)   # (k1_local, c_chan)

        # ---- stage 2 halo: previous shard's last tail2 DDC outputs ----
        h_re = lax.ppermute(y1.re[-plan.tail2:], "time", right)
        h_im = lax.ppermute(y1.im[-plan.tail2:], "time", right)
        left2 = cplx_ops.where(tidx == 0,
                               state.ddc.y_tail, Cplx(h_re, h_im))
        y_ext = cplx_ops.concatenate([left2, y1], axis=0)
        iq_local = chz.stage2_apply(plan, y_ext)   # (b/t_sz, c_chan)

        # ---- re-shard: full time, local channel group -----------------
        g_re = lax.all_gather(iq_local.re, "time", axis=0, tiled=True)
        g_im = lax.all_gather(iq_local.im, "time", axis=0, tiled=True)
        iq = Cplx(
            lax.dynamic_slice_in_dim(g_re, tidx * c_local, c_local, 1),
            lax.dynamic_slice_in_dim(g_im, tidx * c_local, c_local, 1))

        # ---- audio-rate back half (channel-parallel on all devices) ---
        new_state, taps = _back_half(params, state, tuning, iq)

        # ---- DDC carries (global slices computed from local shards) ---
        is_last = tidx == t_sz - 1
        y_tail_new = cplx_ops.where(is_last,
                                    y_ext[-plan.tail2:], state.ddc.y_tail)
        # psum trick: every shard contributes 0 except the last, so the
        # carried tail is replicated without a gather
        y_tail_new = Cplx(
            lax.psum(jnp.where(is_last, y_tail_new.re, 0.0), "time"),
            lax.psum(jnp.where(is_last, y_tail_new.im, 0.0), "time"))
        x_tail_new = lax.psum(
            jnp.where(is_last, x_sh[-plan.tail1:], 0.0), "time")
        new_state = dataclasses.replace(
            new_state,
            ddc=chz.DDCState(
                x_tail=x_tail_new,
                y_tail=y_tail_new,
                phi1=nco.advance(state.ddc.phi1, tuning.dphi1, plan.k1),
            ))
        return new_state, taps

    fwd_sharded = shard_map(
        fwd, mesh=mesh,
        in_specs=(state_specs, tuning_specs, P("time")),
        out_specs=(state_specs, _taps_specs()),
        check_vma=False,
    )
    return jax.jit(fwd_sharded, donate_argnums=(0,))


def _back_half(params: rx.RxParams, state: rx.RxState,
               tuning: rx.RxTuning, iq: Cplx
               ) -> tuple[rx.RxState, rx.RxTaps]:
    """The audio-rate chain on the local channel group — exactly the
    single-device chain (`rx.audio_back_half`) over local shards; every
    op in it is channel-local so no collectives are needed."""
    return rx.audio_back_half(params, state, tuning, iq)
