"""The streaming engine: blocks in, per-channel audio out.

This is the TPU replacement for the reference's data pump + per-channel
task fabric (`rx/data_pump.cpp:84-342`, `support/coroutines.cpp`): one
jitted block program advances every channel; the host side keeps the
sequence accounting, GPS timestamps, and fan-out to subscribers
(websocket connections, decoder extensions, recorders).

Faithfully carried semantics:
- 48-bit tick timestamps per block (`rx/data_pump.cpp:214`), used for
  GPS-timestamped IQ (TDoA) and clock discipline.
- sequence numbers + discontinuity detection (SND_SEQ_CHECK,
  `rx/data_pump.cpp:56-143`).
- overrun/NaN auto-reset: non-finite state resets the affected
  streaming chain, like the data-pump latency reset
  (`rx/data_pump.cpp:245-269`).
- per-channel retune/mode changes between blocks via the control plane
  (`rx_sound_cmd` analogue lives in server/).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp

from ..models import rx_channel as rx
from ..ops import channelizer as chz
from ..ops import demod as demod_ops
from ..ops import fastfir
from ..ops import nco


@dataclasses.dataclass
class ChannelCtl:
    """Host-side mirror of one channel's tuning (control plane)."""
    freq_hz: float = 10.0e6
    mode: int = demod_ops.MODE_USB
    passband: tuple[float, float] | None = None
    agc_on: bool = True
    manual_gain_db: float = 50.0
    squelch: float = 0.0
    nb_on: bool = False
    nb_wild: bool = False
    deemph_on: bool = False
    mute_over_dbm: float = 20.0
    nr_on: bool = False             # spectral NR (NR_SPECTRAL)
    nr_notch_on: bool = False       # LMS autonotch (NR_ORIG/NR_WDSP)
    nr_den_on: bool = False         # LMS denoiser
    in_use: bool = False


class StreamEngine:
    """Owns the receiver state and advances it block by block."""

    def __init__(self, params: rx.RxParams, source,
                 use_jit: bool = True):
        self.params = params
        self.source = source
        self.state = rx.init_state(params)
        self.ctl = [ChannelCtl() for _ in range(params.num_channels)]
        self.tuning = rx.default_tuning(params)
        self.seq = 0
        self.block_ticks = 0            # 48-bit tick of block start
        self.subscribers: list[Callable] = []
        self.resets = 0
        self._last_x = None
        self._step = (jax.jit(
            lambda s, t, x: rx.rx_block(params, s, t, x))
            if use_jit else
            (lambda s, t, x: rx.rx_block(params, s, t, x)))

    # -- control plane ---------------------------------------------------
    def set_channel(self, ch: int, **kwargs) -> None:
        """Apply "SET"-style changes (freq/mode/passband/agc/...)."""
        ctl = self.ctl[ch]
        retune = False
        recoef = False
        for k, v in kwargs.items():
            if not hasattr(ctl, k):
                raise KeyError(k)
            if getattr(ctl, k) != v:
                setattr(ctl, k, v)
                retune |= k == "freq_hz"
                recoef |= k in ("mode", "passband")
        if retune:
            fcw = nco.freq_to_fcw(ctl.freq_hz, self.params.adc_clock)
            br, bi, dp = chz.build_filterbank_column(self.params.ddc, fcw)
            t = self.tuning
            self.tuning = dataclasses.replace(
                t,
                bank_r=t.bank_r.at[:, ch].set(jnp.asarray(br)),
                bank_i=t.bank_i.at[:, ch].set(jnp.asarray(bi)),
                dphi1=t.dphi1.at[ch].set(jnp.asarray(dp)))
        if recoef:
            pb = ctl.passband or rx._default_passband(ctl.mode)
            coef = fastfir.passband_freq_coef(
                self.params.fs_out, pb[0], pb[1], plan=self.params.fir)
            t = self.tuning
            self.tuning = dataclasses.replace(
                t,
                pb_coef=type(t.pb_coef)(
                    t.pb_coef.re.at[:, ch].set(
                        jnp.asarray(coef.real.astype(np.float32))),
                    t.pb_coef.im.at[:, ch].set(
                        jnp.asarray(coef.imag.astype(np.float32)))),
                mode=t.mode.at[ch].set(ctl.mode))
        # scalar per-channel knobs
        t = self.tuning
        self.tuning = dataclasses.replace(
            t,
            manual_gain_db=t.manual_gain_db.at[ch].set(
                np.nan if ctl.agc_on else ctl.manual_gain_db),
            squelch_thresh=t.squelch_thresh.at[ch].set(ctl.squelch),
            nb_on=t.nb_on.at[ch].set(ctl.nb_on),
            nb_wild=t.nb_wild.at[ch].set(ctl.nb_wild),
            deemph_on=t.deemph_on.at[ch].set(ctl.deemph_on),
            mute_over_dbm=t.mute_over_dbm.at[ch].set(
                ctl.mute_over_dbm),
            nr_on=t.nr_on.at[ch].set(ctl.nr_on),
            nr_notch_on=t.nr_notch_on.at[ch].set(ctl.nr_notch_on),
            nr_den_on=t.nr_den_on.at[ch].set(ctl.nr_den_on))

    def retune_all(self, adc_clock_corrected: float) -> None:
        """Clock-discipline feedback: rebuild every NCO against the
        corrected ADC clock (`rx/rx_sound.cpp:334-344`).  Only the
        tuning words change; the decimation plan stays at nominal
        (the ppm-level rate error is absorbed the same way the
        reference's fixed CIC decimation absorbs it)."""
        fcws = [nco.freq_to_fcw(c.freq_hz, adc_clock_corrected)
                for c in self.ctl]
        br, bi, dp = chz.build_filterbank(self.params.ddc, fcws)
        self.tuning = dataclasses.replace(
            self.tuning, bank_r=jnp.asarray(br), bank_i=jnp.asarray(bi),
            dphi1=jnp.asarray(dp))

    # -- data plane ------------------------------------------------------
    def run_block(self) -> rx.RxTaps:
        """Pull one source block through the pipeline; fan out."""
        ticks = getattr(self.source, "ticks", 0)
        x = self.source.next_block(self.params.ddc.adc_block)
        if isinstance(x, np.ndarray):
            x = jnp.asarray(x)
        self._last_x = x            # raw block for waterfall taps
        self.state, taps = self._step(self.state, self.tuning, x)
        self.block_ticks = ticks
        self.seq += 1
        if self.seq % 64 == 0:          # cheap periodic health check
            if not bool(jnp.all(jnp.isfinite(taps.audio))):
                self.reset_streaming_state()
        for fn in self.subscribers:
            fn(self, taps)
        return taps

    def run_block_gather(self, idx: np.ndarray):
        """One FUSED dispatch for the serving path: advance the block
        AND slice the subscribed channels' tap columns on-device.

        The serving loop used to dispatch 3 programs per block (step,
        peak, gather); over the high-latency axon tunnel every extra
        dispatch is round-trip exposure and the tunnel degrades under
        chatty workloads (see .claude/skills/verify).  Returns ONE
        flat f32 device array — ``[audio rows | audio2 rows | iq_re
        rows | iq_im rows | smeter(C) | peak]`` with each tap's
        subscriber columns transposed to (bucket, block) row-major —
        so the host fetch is a single round trip (fetching a 6-array
        tuple paid the tunnel latency per array: ~25-50 ms x 6
        dominated the serve block at high listener counts) and each
        channel's audio is contiguous for the batched ADPCM encode.
        One jit per bucket size.
        """
        params = self.params
        gstep = self._gstep_for(len(idx))
        ticks = getattr(self.source, "ticks", 0)
        x = self.source.next_block(params.ddc.adc_block)
        if isinstance(x, np.ndarray):
            x = jnp.asarray(x)
        self._last_x = x
        self.state, out = gstep(self.state, self.tuning, x,
                                jnp.asarray(idx))
        self.block_ticks = ticks
        self.seq += 1
        return out

    def _gstep_for(self, bucket: int):
        """The ONE definition of the fused serve program per bucket
        size (run_block_gather and prewarm_gather must share it, or
        the prewarm compiles a program the serve path never uses)."""
        if not hasattr(self, "_gstep_cache"):
            self._gstep_cache = {}
        params = self.params
        if bucket not in self._gstep_cache:
            def gstep(s, t, x, i):
                s2, taps = rx.rx_block(params, s, t, x)
                cols = [jnp.take(a, i, axis=1).T.reshape(-1)
                        for a in (taps.audio, taps.audio2,
                                  taps.iq_post_agc.re,
                                  taps.iq_post_agc.im)]
                packed = jnp.concatenate(
                    cols + [taps.smeter_dbm,
                            jnp.max(jnp.abs(x)).reshape(1)])
                return s2, packed
            self._gstep_cache[bucket] = jax.jit(gstep)
        return self._gstep_cache[bucket]

    def prewarm_gather(self, bucket: int) -> None:
        """Compile (only) the fused serve program for one bucket size
        — safe to call concurrently with the block loop because it
        never touches the engine state, just populates the compile
        caches via an abstract lowering (the first real call then
        hits the in-process or persistent cache)."""
        gstep = self._gstep_for(bucket)
        abstract = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype),
            (self.state, self.tuning))
        x_s = jax.ShapeDtypeStruct((self.params.ddc.adc_block,),
                                   jnp.float32)
        i_s = jax.ShapeDtypeStruct((bucket,), jnp.int32)
        gstep.lower(abstract[0], abstract[1], x_s, i_s).compile()

    def reset_streaming_state(self) -> None:
        """Full streaming-state reset (data-pump reset analogue)."""
        self.state = rx.init_state(self.params)
        self.resets += 1

    # -- checkpoint / resume --------------------------------------------
    # The reference persists only JSON config (kiwi.json etc.,
    # SURVEY.md section 5 "checkpoint/resume"); the TPU build can also
    # snapshot the full streaming state so a restarted server resumes
    # mid-stream without filter warmup glitches.
    def save_state(self, path: str) -> None:
        import pickle
        leaves, treedef = jax.tree.flatten(self.state)
        with open(path, "wb") as f:
            pickle.dump(dict(
                leaves=[np.asarray(x) for x in leaves],
                seq=self.seq, block_ticks=self.block_ticks,
                ctl=self.ctl), f)

    def load_state(self, path: str) -> None:
        import pickle
        with open(path, "rb") as f:
            snap = pickle.load(f)
        ref = rx.init_state(self.params)
        _, treedef = jax.tree.flatten(ref)
        self.state = jax.tree.unflatten(
            treedef, [jnp.asarray(x) for x in snap["leaves"]])
        self.seq = snap["seq"]
        self.block_ticks = snap["block_ticks"]
        self.ctl = snap["ctl"]
        # rebuild the device tuning from the restored control mirrors
        self.retune_all(self.params.adc_clock)
        for ch in range(self.params.num_channels):
            c = self.ctl[ch]
            ctlvals = dict(mode=c.mode, passband=c.passband,
                           agc_on=c.agc_on,
                           manual_gain_db=c.manual_gain_db,
                           squelch=c.squelch, nb_on=c.nb_on,
                           nr_on=c.nr_on, nr_notch_on=c.nr_notch_on,
                           nr_den_on=c.nr_den_on)
            # force-apply (set_channel skips unchanged mirrors)
            old = self.ctl[ch]
            self.ctl[ch] = ChannelCtl()
            self.set_channel(ch, **ctlvals)
            self.ctl[ch].freq_hz = old.freq_hz
            self.ctl[ch].in_use = old.in_use

    # -- timestamps ------------------------------------------------------
    def gps_timestamp(self, clock_hz: float | None = None
                      ) -> tuple[int, float]:
        """(48-bit ticks, seconds) of the current block start — feeds
        the GPS-timestamped IQ headers (`rx/rx_sound.cpp:654-661`)."""
        clk = clock_hz or self.params.adc_clock
        return self.block_ticks, self.block_ticks / clk
