"""The receiver pipeline: ADC block -> N channels of demodulated audio.

This is the TPU equivalent of the reference's per-channel audio path
(`rx/rx_sound.cpp:222-1287` `c2s_sound()` plus the FPGA DDC feeding it):

    ADC 125 Msps
      -> [MXU] filter-bank DDC (all channels at once, ops/channelizer)
      -> [VPU] per-channel, channel-vectorized:
           noise blanker (pre-FIR IQ tap)
           passband FastFIR (batched 1024-pt FFTs)
           S-meter
           AGC
           mode demod (AM/SAM/SSB/CW/NBFM/IQ)
           squelch / noise reduction
      -> (audio_block, C) float32 audio + IQ taps + S-meter values

Where the reference runs one cooperative task per channel on an ARM
core, here ALL channels advance together in one jit-compiled block
program; per-channel differences (mode, passband, gain) are data, not
control flow.

Extension sample taps (reference `extensions/ext.h:57-90`): the block
function returns the same tap points the reference exposes — pre-FIR
IQ, post-FIR/post-AGC IQ, demodulated audio, S-meter — so decoder
extensions consume them without re-running the chain.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..numerology import ADC_CLOCK_NOM, AUDIO_BLOCK, SND_RATE_12K
from ..ops import agc as agc_ops
from ..ops import channelizer as chz
from ..ops import cplx as cplx_ops
from ..ops.cplx import Cplx
from ..ops import demod as demod_ops
from ..ops import fastfir
from ..ops import iir
from ..ops import noise as noise_ops
from ..ops import smeter as smeter_ops
from ..ops import nco


@dataclasses.dataclass(frozen=True, eq=False)
class RxParams:
    """Static receiver build (compile-time shape information)."""
    num_channels: int
    adc_clock: float = ADC_CLOCK_NOM
    snd_rate: int = SND_RATE_12K
    audio_block: int = AUDIO_BLOCK
    atten_db: float = 90.0
    enable_nr: bool = True          # build the NR stages in the graph
                                    # (runtime cond-gated; channels with
                                    # NR off pay nothing per block)
    enable_nb: bool = True
    # stage-1 matmul precision: "high" = 3-pass bf16 (~-98 dB error,
    # ~30% faster) or "highest" = full f32
    precision: str = "high"
    # stage-2 decimator implementation: "auto"/"poly" (XLA fused
    # polyphase), "pallas" (VMEM tap-reduction kernel), "fft"
    # (overlap-save correlation) — see ops/channelizer.stage2_apply
    # and KERNELS.md for the measured comparison
    stage2: str = "auto"

    def __post_init__(self):
        object.__setattr__(
            self, "ddc",
            chz.make_ddc_plan(self.adc_clock, self.snd_rate,
                              self.audio_block, self.atten_db))
        object.__setattr__(self, "fir",
                           fastfir.plan_for_block(self.audio_block))
        object.__setattr__(
            self, "agc",
            agc_ops.AgcParams(fs=self.ddc.fs_out))
        object.__setattr__(
            self, "sam",
            demod_ops.SamParams(fs=self.ddc.fs_out))
        object.__setattr__(
            self, "nr", noise_ops.SpectralNRParams())
        # NR_ORIG/NR_WDSP LMS pair: autonotch then denoiser
        # (`rx/rx_sound.cpp:933-943`)
        object.__setattr__(
            self, "lms_notch_p", noise_ops.LmsParams(notch=True))
        object.__setattr__(
            self, "lms_den_p", noise_ops.LmsParams(notch=False))
        # SAM sideband-selection masks on the PLL-locked baseband
        # (reference: +-45 deg allpass Hilbert pair,
        # `rx/wdsp/SAM_demod.cpp:85-105`; here: one-sided overlap-save
        # frequency masks — same math, frequency-domain)
        fs = self.ddc.fs_out
        edge = 0.97 * fs / 2
        object.__setattr__(
            self, "sb_coef_l",
            fastfir.passband_freq_coef(fs, -edge, -15.0, plan=self.fir))
        object.__setattr__(
            self, "sb_coef_u",
            fastfir.passband_freq_coef(fs, 15.0, edge, plan=self.fir))

    ddc: chz.DDCPlan = dataclasses.field(init=False)
    fir: fastfir.FastFIRPlan = dataclasses.field(init=False)
    agc: agc_ops.AgcParams = dataclasses.field(init=False)
    sam: demod_ops.SamParams = dataclasses.field(init=False)
    nr: noise_ops.SpectralNRParams = dataclasses.field(init=False)
    lms_notch_p: noise_ops.LmsParams = dataclasses.field(init=False)
    lms_den_p: noise_ops.LmsParams = dataclasses.field(init=False)
    sb_coef_l: np.ndarray = dataclasses.field(init=False)
    sb_coef_u: np.ndarray = dataclasses.field(init=False)

    @property
    def fs_out(self) -> float:
        return self.ddc.fs_out

    @classmethod
    def from_config(cls, config, **kwargs) -> "RxParams":
        """Build from a firmware-style RxConfig (rx4/rx8/rx3/rx14,
        `numerology.CONFIGS` — reference `main.cpp:346-395`)."""
        return cls(num_channels=config.rx_chans,
                   snd_rate=config.snd_rate, **kwargs)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class RxTuning:
    """Per-channel dynamic configuration (device arrays, updated by the
    control plane on "SET" commands — `rx/rx_sound_cmd.cpp`)."""
    bank_r: jax.Array            # (L1, C) stage-1 filter bank, real
    bank_i: jax.Array            # (L1, C) imag
    dphi1: jax.Array             # (C, 3) rotator increment limbs
    pb_coef: Cplx                # (fft_size, C) passband freq response
    mode: jax.Array              # (C,) int32 demod mode id
    manual_gain_db: jax.Array    # (C,) float32, NaN = AGC on
    squelch_thresh: jax.Array    # (C,) float32, <=0 = open
    nb_on: jax.Array             # (C,) bool noise blanker enable
    nb_wild: jax.Array           # (C,) bool: NB_WILD (interp) vs NB_STD
    deemph_on: jax.Array         # (C,) bool NBFM/AM de-emphasis
    mute_over_dbm: jax.Array     # (C,) f32 overload mute threshold
    nr_on: jax.Array             # (C,) bool spectral NR enable
    nr_notch_on: jax.Array       # (C,) bool LMS autonotch enable
    nr_den_on: jax.Array         # (C,) bool LMS denoiser enable
    fm_deviation: jax.Array      # () float32


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class RxState:
    """All streaming carries for the full multi-channel receiver."""
    ddc: chz.DDCState
    fir_tail: Cplx
    agc: agc_ops.AgcState
    dc: jax.Array                 # (2, C) AM dc-blocker
    sam: demod_ops.SamState
    fm_last: Cplx                 # (C,)
    squelch: demod_ops.SquelchState
    rssi_sq: demod_ops.RssiSquelchState
    nb_mavg: jax.Array            # (C,) float32
    nr: noise_ops.SpectralNRState
    lms_notch: noise_ops.LmsState
    lms_den: noise_ops.LmsState
    sb_tail: Cplx                 # (ntaps-1, C) sideband-filter carry
    smeter: jax.Array             # (C,) float32 filtered power
    deemph: jax.Array             # (C,) float32 de-emphasis z1


def init_state(params: RxParams) -> RxState:
    c = params.num_channels
    return RxState(
        ddc=chz.init_ddc_state(params.ddc, c),
        fir_tail=fastfir.init_state(params.fir, c),
        agc=agc_ops.init_state(params.agc, c),
        dc=jnp.zeros((2, c), jnp.float32),
        sam=demod_ops.init_sam_state(c),
        fm_last=Cplx(jnp.ones((c,), jnp.float32),
                     jnp.zeros((c,), jnp.float32)),
        squelch=demod_ops.init_squelch_state(c),
        rssi_sq=demod_ops.init_rssi_squelch(c),
        nb_mavg=jnp.full((c,), 1e-3, jnp.float32),
        nr=noise_ops.init_spectral_nr(params.nr, c),
        lms_notch=noise_ops.init_lms(params.lms_notch_p, c),
        lms_den=noise_ops.init_lms(params.lms_den_p, c),
        sb_tail=fastfir.init_state(params.fir, c),
        smeter=jnp.zeros((c,), jnp.float32),
        deemph=jnp.zeros((c,), jnp.float32),
    )


def default_tuning(params: RxParams,
                   freqs_hz: Sequence[float] | None = None,
                   modes: Sequence[int] | None = None,
                   passbands: Sequence[tuple[float, float]] | None = None,
                   ) -> RxTuning:
    """Host-side construction of a full tuning set."""
    c = params.num_channels
    if freqs_hz is None:
        freqs_hz = np.linspace(1e6, 29e6, c)
    fcws = [nco.freq_to_fcw(f, params.adc_clock) for f in freqs_hz]
    bank_r, bank_i, dphi1 = chz.build_filterbank(params.ddc, fcws)
    if modes is None:
        modes = [demod_ops.MODE_USB] * c
    if passbands is None:
        passbands = [_default_passband(m) for m in modes]
    coef = np.stack(
        [fastfir.passband_freq_coef(params.fs_out, lo, hi, plan=params.fir)
         for (lo, hi) in passbands], axis=-1)
    return RxTuning(
        bank_r=jnp.asarray(bank_r), bank_i=jnp.asarray(bank_i),
        dphi1=jnp.asarray(dphi1), pb_coef=cplx_ops.from_numpy(coef),
        mode=jnp.asarray(np.asarray(modes, np.int32)),
        manual_gain_db=jnp.full((c,), np.nan, jnp.float32),
        squelch_thresh=jnp.zeros((c,), jnp.float32),
        nb_on=jnp.zeros((c,), bool),
        nb_wild=jnp.zeros((c,), bool),
        deemph_on=jnp.zeros((c,), bool),
        mute_over_dbm=jnp.full((c,), 20.0, jnp.float32),
        nr_on=jnp.zeros((c,), bool),
        nr_notch_on=jnp.zeros((c,), bool),
        nr_den_on=jnp.zeros((c,), bool),
        fm_deviation=jnp.float32(2500.0),
    )


def _default_passband(mode: int) -> tuple[float, float]:
    """Reference default passbands per mode (`rx/rx_init.cpp` mode
    tables: AM +-4.9k, USB 300-2700, LSB mirror, CW 300-700, NBFM
    +-6k, IQ +-5k)."""
    d = demod_ops
    return {
        d.MODE_AM: (-4900.0, 4900.0), d.MODE_AMN: (-2500.0, 2500.0),
        d.MODE_USB: (300.0, 2700.0), d.MODE_LSB: (-2700.0, -300.0),
        d.MODE_CW: (300.0, 700.0), d.MODE_CWN: (470.0, 530.0),
        d.MODE_NBFM: (-5500.0, 5500.0), d.MODE_IQ: (-5000.0, 5000.0),
        d.MODE_DRM: (-5000.0, 5000.0), d.MODE_SAM: (-4900.0, 4900.0),
        d.MODE_SAL: (-4900.0, -10.0), d.MODE_SAU: (10.0, 4900.0),
        d.MODE_SAS: (-4900.0, 4900.0),
    }.get(int(mode), (300.0, 2700.0))


# ---------------------------------------------------------------------------
# the block program
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class RxTaps:
    """Per-block outputs at the reference's extension tap points."""
    audio: jax.Array              # (B, C) float32 demodulated audio
                                  # (stereo SAS: left = LSB)
    audio2: jax.Array             # (B, C) float32 stereo right (USB) for
                                  # SAS; equals ``audio`` for mono modes
    iq_pre_fir: Cplx              # (B, C) DDC output
    iq_post_agc: Cplx             # (B, C) after passband+AGC
    smeter_dbm: jax.Array         # (C,) float32 block peak level


def audio_back_half(params: RxParams, state: RxState, tuning: RxTuning,
                    iq: Cplx) -> tuple[RxState, RxTaps]:
    """The audio-rate chain after the DDC, for all channels at once.

    Shared verbatim between the single-device `rx_block` and the
    sharded step (`parallel/sharded_rx`); the returned state carries
    ``state.ddc`` through unchanged (the caller owns the DDC carry).

    Stage order follows `rx/rx_sound.cpp`: blanker (pre-FIR tap) ->
    passband FIR -> S-meter -> AGC -> demod (:707-896) -> NR dispatch
    (:922-948) -> squelch (:951-987) -> de-emphasis -> overload mute
    (:989-1014).
    """
    d = demod_ops
    # --- noise blanker on raw IQ (reference taps pre-FIR) ---
    # two algorithms, per-channel select: NB_STD zeroes the impulse
    # window (CuteSDR CNoiseProc), NB_WILD bridges it by interpolation
    # (Teensy NB_Wild) — `rx/rx_sound.cpp:910-920` dispatch
    nb_std, nb_mavg = noise_ops.noise_blanker(iq, state.nb_mavg)
    any_wild = jnp.any(tuning.nb_wild & tuning.nb_on)
    nb_iq = jax.lax.cond(
        any_wild,
        lambda: cplx_ops.where(
            tuning.nb_wild[None, :],
            noise_ops.noise_blanker_wild(iq, state.nb_mavg)[0], nb_std),
        lambda: nb_std)
    iq_nb = cplx_ops.where(tuning.nb_on[None, :], nb_iq, iq)

    # --- passband filter (batched FFT) ---
    z, fir_tail = fastfir.fastfir_block(params.fir, iq_nb, state.fir_tail,
                                        tuning.pb_coef)

    # --- S-meter on post-FIR IQ ---
    _, smeter_peak, smeter_level = smeter_ops.smeter_block(z, state.smeter)

    # --- AGC ---
    zg, agc_state = agc_ops.agc_block(params.agc, z, state.agc,
                                      tuning.manual_gain_db)

    # --- demodulators (all computed, selected by mode) ---
    am_audio, dc_state = demod_ops.am_demod(zg, state.dc)
    ssb_audio = demod_ops.ssb_demod(zg)
    fm_audio, fm_last = demod_ops.fm_demod(
        zg, state.fm_last, params.fs_out, tuning.fm_deviation)
    sam_audio, v_locked, sam_state = demod_ops.sam_demod(
        params.sam, zg, state.sam)

    # --- SAM sideband selection (SAL/SAU/SAS) on the locked baseband.
    # cond-gated: pure-SAM/non-SAM workloads skip the extra transforms.
    need_sb = jnp.any(tuning.mode >= d.MODE_SAL)
    coef_l = cplx_ops.from_numpy(params.sb_coef_l)
    coef_u = cplx_ops.from_numpy(params.sb_coef_u)

    def _sb_on():
        vl, vu, sbt = fastfir.fastfir_block2(
            params.fir, v_locked, state.sb_tail, coef_l, coef_u)
        return 2.0 * vl.re, 2.0 * vu.re, sbt

    def _sb_off():
        zb = jnp.zeros_like(sam_audio)
        return zb, zb, state.sb_tail

    sb_l, sb_u, sb_tail = jax.lax.cond(need_sb, _sb_on, _sb_off)

    mode = tuning.mode[None, :]
    # mono SAM lane: SAL -> lower sideband, SAU -> upper, SAS -> left
    # (= LSB, `rx/wdsp/SAM_demod.cpp` MODE_SAS: audio = lsb)
    sam_sel = jnp.where(
        (mode == d.MODE_SAL) | (mode == d.MODE_SAS), sb_l,
        jnp.where(mode == d.MODE_SAU, sb_u, sam_audio))

    audio = jnp.where(
        (mode == d.MODE_AM) | (mode == d.MODE_AMN), am_audio,
        jnp.where(mode == d.MODE_NBFM, fm_audio,
                  jnp.where((mode >= d.MODE_SAM), sam_sel, ssb_audio)))

    # --- NR dispatch (`rx_sound.cpp:922-948`): LMS autonotch ->
    # LMS denoiser -> (alternative) spectral NR, all runtime-gated ---
    if params.enable_nr:
        any_lms = jnp.any(tuning.nr_notch_on | tuning.nr_den_on)

        def _lms_on():
            return noise_ops.lms_chain_block(
                params.lms_notch_p, params.lms_den_p, audio,
                state.lms_notch, state.lms_den,
                tuning.nr_notch_on, tuning.nr_den_on)

        def _lms_off():
            return audio, state.lms_notch, state.lms_den

        audio, lms_notch_state, lms_den_state = jax.lax.cond(
            any_lms, _lms_on, _lms_off)
        any_spec = jnp.any(tuning.nr_on)

        def _spec_on():
            nr_audio, nrs = noise_ops.spectral_nr_block(
                params.nr, audio, state.nr)
            return jnp.where(tuning.nr_on[None, :], nr_audio, audio), nrs

        def _spec_off():
            return audio, state.nr

        audio, nr_state = jax.lax.cond(any_spec, _spec_on, _spec_off)
    else:
        nr_state = state.nr
        lms_notch_state, lms_den_state = state.lms_notch, state.lms_den

    # --- squelch: NBFM uses the discriminator-noise squelch; every
    # other mode uses the median-RSSI squelch (`rx_sound.cpp:951-987`).
    fm_thresh = jnp.where(tuning.mode == d.MODE_NBFM,
                          tuning.squelch_thresh, 0.0)
    audio, squelch_state = demod_ops.fm_squelch(audio, state.squelch,
                                                fm_thresh)
    rssi_thresh = jnp.where(tuning.mode == d.MODE_NBFM, 0.0,
                            tuning.squelch_thresh)
    audio, rssi_state = demod_ops.rssi_squelch(
        audio, smeter_peak, state.rssi_sq, rssi_thresh)

    # --- de-emphasis: one-pole 75 us LPF (`rx_sound.cpp:898-908`) ---
    alpha = jnp.float32(1.0 - np.exp(-1.0 / (params.fs_out * 75e-6)))
    de_audio = iir.one_pole_smoother(audio, alpha, state.deemph)
    audio = jnp.where(tuning.deemph_on[None, :], de_audio, audio)
    deemph_state = jnp.where(tuning.deemph_on, de_audio[-1],
                             state.deemph)

    # --- overload mute (`rx_sound.cpp:989-1014`): hard-mute channels
    # whose peak exceeds the configured limit ---
    over = (smeter_peak > tuning.mute_over_dbm)[None, :]
    audio = jnp.where(over, 0.0, audio)

    # --- stereo right lane (SAS): USB through the same gates (squelch
    # open state + overload mute); NR/de-emphasis are mono-lane only,
    # like the reference's stereo path bypassing the mono chain
    # (`rx_sound.cpp:1047`) ---
    gate_fm = squelch_state.open_
    gate_rssi = (rssi_thresh <= 0.0) | rssi_state.open_
    audio2 = jnp.where((gate_fm & gate_rssi)[None, :] & ~over, sb_u, 0.0)
    audio2 = jnp.where(mode == d.MODE_SAS, audio2, audio)

    new_state = RxState(
        ddc=state.ddc,    # caller replaces with the advanced DDC carry
        fir_tail=fir_tail, agc=agc_state, dc=dc_state,
        sam=sam_state, fm_last=fm_last, squelch=squelch_state,
        rssi_sq=rssi_state, nb_mavg=nb_mavg, nr=nr_state,
        lms_notch=lms_notch_state, lms_den=lms_den_state,
        sb_tail=sb_tail, smeter=smeter_level, deemph=deemph_state,
    )
    taps = RxTaps(audio=audio, audio2=audio2, iq_pre_fir=iq,
                  iq_post_agc=zg, smeter_dbm=smeter_peak)
    return new_state, taps


def rx_block(params: RxParams, state: RxState, tuning: RxTuning,
             x_adc: jax.Array) -> tuple[RxState, RxTaps]:
    """Process one ADC block through every channel.  jit-compiled once.

    x_adc: (adc_block,) float32.
    """
    # --- DDC front half (MXU) ---
    new_ddc, iq = _ddc(params, state, tuning, x_adc)
    # --- audio-rate back half (shared with the sharded step) ---
    new_state, taps = audio_back_half(params, state, tuning, iq)
    return dataclasses.replace(new_state, ddc=new_ddc), taps


def _use_fused_stage2(params: RxParams) -> bool:
    """Fused rotator+stage-2 Pallas path (TPU, tileable shapes).

    Skips a full HBM read+write of the (k1, C) stage-1 output by
    rotating inside the stage-2 kernel (measured: the standalone
    rotator pass cost 29 ms of the 123 ms C=4096 block)."""
    if params.stage2 not in ("auto", "pallas_rot"):
        return False
    if params.stage2 == "auto" and jax.default_backend() != "tpu":
        return False
    from ..ops.pallas_kernels import stage2_rot_supported
    plan = params.ddc
    return (plan.tail2 % plan.d2 == 0
            and stage2_rot_supported(plan.k1 + plan.tail2,
                                     params.num_channels,
                                     plan.d2, plan.l2))


def _ddc(params: RxParams, state: RxState, tuning: RxTuning,
         x_adc: jax.Array) -> tuple[chz.DDCState, Cplx]:
    plan = params.ddc
    prec = (jax.lax.Precision.HIGH if params.precision == "high"
            else jax.lax.Precision.HIGHEST)
    x_ext = jnp.concatenate([state.ddc.x_tail, x_adc])
    if _use_fused_stage2(params):
        # fused path: y (and its carry tail) stay UNROTATED and ride
        # the tile-paired packed layout straight out of one matmul;
        # the stage-2 kernel applies exp(-2j*pi*(phi + n*dphi)) while
        # the data is VMEM-resident.  The carry rows sit tail2 samples
        # BEFORE this block's first stage-1 output, so the rotation
        # ramp starts at phi1 - tail2*dphi (exact limb math).
        from ..ops import pallas_kernels as pk
        k2 = plan.k1 // plan.d2
        _, tc = pk.stage2_rot_tiles(k2, params.num_channels,
                                    plan.d2, plan.l2)
        bank_p = chz.pack_bank(tuning.bank_r, tuning.bank_i, tc)
        y1p = chz.stage1_matmul_packed(plan, x_ext, bank_p,
                                       precision=prec)
        tail_p = chz.pack_cols(state.ddc.y_tail, tc)
        y_ext_p = jnp.concatenate([tail_p, y1p], axis=0)
        phi_ext0 = nco.limb_add(
            state.ddc.phi1,
            nco.limb_neg(nco.advance(jnp.zeros_like(tuning.dphi1),
                                     tuning.dphi1, plan.tail2)))
        audio_iq = pk.stage2_rot_pallas(y_ext_p, phi_ext0,
                                        tuning.dphi1, plan.h2,
                                        plan.d2, k2,
                                        interpret=jax.default_backend()
                                        != "tpu")
        y_ext = chz.unpack_cols(y_ext_p[-plan.tail2:], tc)
        new = chz.DDCState(
            x_tail=x_adc[-plan.tail1:],
            y_tail=y_ext,
            phi1=nco.advance(state.ddc.phi1, tuning.dphi1, plan.k1),
        )
        return new, audio_iq
    else:
        y1 = chz.stage1_apply(plan, x_ext, tuning.bank_r,
                              tuning.bank_i, state.ddc.phi1,
                              tuning.dphi1, precision=prec)
        y_ext = cplx_ops.concatenate([state.ddc.y_tail, y1], axis=0)
        audio_iq = chz.stage2_apply(plan, y_ext, method=params.stage2)
    new = chz.DDCState(
        x_tail=x_adc[-plan.tail1:],
        y_tail=y_ext[-plan.tail2:],
        phi1=nco.advance(state.ddc.phi1, tuning.dphi1, plan.k1),
    )
    return new, audio_iq


def jit_rx_block(params: RxParams):
    """Return the jitted block step for this build."""
    return jax.jit(lambda s, t, x: rx_block(params, s, t, x),
                   donate_argnums=(0,))
