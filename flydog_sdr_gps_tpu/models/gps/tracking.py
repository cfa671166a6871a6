"""GPS tracking: 12-channel early/prompt/late correlator bank.

Reference split: the FPGA runs per-channel carrier/code NCOs and E/P/L
accumulators at 16.368 Msps (`verilog/gps/demod.v:72-295`); the e_cpu
ISR reads accumulators and runs integrator loop filters ~1 kHz
(`e_cpu/kiwi.gps.asm:452-664`); the host does bit sync, subframes and
power monitoring (`gps/channel.cpp:376-553`).

TPU design: one `lax.scan` over 1 ms epochs; each step processes ALL
channels as (nch, 16368) tensor math — carrier wipe (f32 NCO, the
closed loop absorbs rounding), code table gather at E/P/L phases,
integrate-and-dump, then classic discriminators + 2nd-order loops:
FLL-assisted Costas PLL for carrier, carrier-aided 1st-order DLL for
code.  Prompt I/Q per epoch streams out for host-side bit sync and
LNAV decoding (`ephemeris.py`).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ...numerology import (CA_CHIP_RATE, E1B_CODELEN, GPS_FC, GPS_FS,
                           L1_CODELEN)
from . import cacode


@dataclasses.dataclass(frozen=True, eq=False)
class TrackParams:
    fs: float = GPS_FS
    fc: float = GPS_FC
    epoch: int = 16368              # samples per 1 ms epoch
    pll_bw: float = 18.0            # Hz
    fll_bw: float = 10.0            # Hz
    dll_bw: float = 3.0             # Hz
    corr_spacing: float = 0.5       # chips, E/L offset

    @property
    def t_epoch(self) -> float:
        return self.epoch / self.fs

    # standard 2nd-order loop gains (zeta = 0.707)
    @property
    def pll_g1(self) -> float:
        wn = self.pll_bw / 0.53
        return float(2 * 0.707 * wn * self.t_epoch)

    @property
    def pll_g2(self) -> float:
        wn = self.pll_bw / 0.53
        return float(wn * wn * self.t_epoch * self.t_epoch)

    @property
    def fll_g(self) -> float:
        return float(self.fll_bw / 0.25 * self.t_epoch)

    @property
    def dll_g(self) -> float:
        return float(4 * self.dll_bw * self.t_epoch)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrackState:
    """Per-channel tracking state, all (nch,) float32 unless noted.

    The bank is constellation-generic: ``code_len`` is 1023 for GPS
    C/A rows (tiled x4 in the 4092-wide code table) or 4092 for
    Galileo E1B memory codes; ``boc`` enables the BOC(1,1) subcarrier
    in the replica; ``corr_half`` is the per-channel E/L offset in
    chips (0.5 for C/A's triangular ACF, 0.25 for BOC(1,1)'s narrow
    main peak).  This mirrors how the reference FPGA runs E1B in the
    same demod.v channels by downloading a longer code and a flag
    (`verilog/gps/demod.v`, `CmdSetE1Bcode`).
    """
    code_phase: jax.Array       # chips, fractional, mod code_len
    code_rate: jax.Array        # chips per raw sample
    carr_phase: jax.Array       # radians
    carr_freq: jax.Array        # radians per raw sample
    ip_prev: jax.Array          # previous prompt I (for FLL cross/dot)
    qp_prev: jax.Array          # previous prompt Q
    active: jax.Array           # bool — channel enabled
    code_len: jax.Array         # chips per code period (1023 / 4092)
    boc: jax.Array              # 1.0 = BOC(1,1) subcarrier on replica
    corr_half: jax.Array        # E/L correlator offset, chips


def init_track_state(params: TrackParams, prns, code_phases, dopplers
                     ) -> tuple[TrackState, jax.Array]:
    """Start tracking from acquisition results.

    code_phases in chips (at the acquisition instant), dopplers in Hz.
    Returns (state, code_table (nch*1023,) float32).
    """
    nch = len(prns)
    code_rate = np.full(nch, CA_CHIP_RATE, np.float64)
    dop = np.asarray(dopplers, np.float64)
    # carrier-derived code Doppler: chip rate scales with (1 + fd/fL1)
    code_rate *= (1.0 + dop / 1.57542e9)
    state = TrackState(
        code_phase=jnp.asarray(np.asarray(code_phases) % L1_CODELEN,
                               jnp.float32),
        code_rate=jnp.asarray(code_rate / params.fs, jnp.float32),
        carr_phase=jnp.zeros((nch,), jnp.float32),
        carr_freq=jnp.asarray(
            2 * np.pi * (params.fc + dop) / params.fs, jnp.float32),
        ip_prev=jnp.zeros((nch,), jnp.float32),
        qp_prev=jnp.zeros((nch,), jnp.float32),
        active=jnp.ones((nch,), bool),
        code_len=jnp.full((nch,), float(L1_CODELEN), jnp.float32),
        boc=jnp.zeros((nch,), jnp.float32),
        corr_half=jnp.full((nch,), params.corr_spacing, jnp.float32),
    )
    table = np.concatenate(
        [np.tile(cacode.ca_code_any(p).astype(np.float32),
                 E1B_CODELEN // L1_CODELEN) for p in prns])
    return state, jnp.asarray(table)


def empty_track_state(params: TrackParams, capacity: int
                      ) -> tuple[TrackState, jax.Array]:
    """Fixed-capacity all-inactive bank (+ zero code table).

    The capacity is a compile-time shape (GPS_MAX_CHANS=12, matching
    the FPGA's fixed correlator count `verilog/gps/gps.v`); acquiring
    or dropping a satellite only writes one row — the tracking scan is
    traced exactly once per capacity.
    """
    z = jnp.zeros((capacity,), jnp.float32)
    state = TrackState(
        code_phase=z, code_rate=z + jnp.float32(CA_CHIP_RATE / params.fs),
        carr_phase=z,
        carr_freq=z + jnp.float32(2 * np.pi * params.fc / params.fs),
        ip_prev=z, qp_prev=z,
        active=jnp.zeros((capacity,), bool),
        code_len=z + jnp.float32(L1_CODELEN),
        boc=z,
        corr_half=z + jnp.float32(params.corr_spacing))
    return state, jnp.zeros((capacity * E1B_CODELEN,), jnp.float32)


def activate_channel(params: TrackParams, state: TrackState,
                     code_table: jax.Array, idx: int, prn: int,
                     code_phase: float, doppler: float,
                     code: np.ndarray | None = None,
                     boc: bool = False,
                     corr_half: float | None = None
                     ) -> tuple[TrackState, jax.Array]:
    """Start tracking ``prn`` in row ``idx`` (handoff from acquisition,
    `gps/channel.cpp` ChanStart).  Pure row writes — no retrace.

    ``code`` defaults to the C/A code for ``prn``; pass a 4092-chip
    E1B memory code (+ ``boc=True``) for a Galileo channel.
    """
    if code is None:
        code = cacode.ca_code_any(prn)
    code = np.asarray(code, np.float32)
    code_len = len(code)
    if corr_half is None:
        corr_half = 0.25 if boc else params.corr_spacing
    rate = (CA_CHIP_RATE * (1.0 + doppler / 1.57542e9)) / params.fs
    cf = 2 * np.pi * (params.fc + doppler) / params.fs
    state = TrackState(
        code_phase=state.code_phase.at[idx].set(code_phase % code_len),
        code_rate=state.code_rate.at[idx].set(rate),
        carr_phase=state.carr_phase.at[idx].set(0.0),
        carr_freq=state.carr_freq.at[idx].set(cf),
        ip_prev=state.ip_prev.at[idx].set(0.0),
        qp_prev=state.qp_prev.at[idx].set(0.0),
        active=state.active.at[idx].set(True),
        code_len=state.code_len.at[idx].set(float(code_len)),
        boc=state.boc.at[idx].set(1.0 if boc else 0.0),
        corr_half=state.corr_half.at[idx].set(float(corr_half)))
    row = jnp.asarray(np.tile(code, E1B_CODELEN // code_len))
    code_table = jax.lax.dynamic_update_slice(
        code_table, row, (idx * E1B_CODELEN,))
    return state, code_table


def deactivate_channel(state: TrackState, idx: int) -> TrackState:
    return dataclasses.replace(state,
                               active=state.active.at[idx].set(False))


def track_epochs(params: TrackParams, state: TrackState,
                 code_table: jax.Array, raw: jax.Array):
    """Track over raw (n_epochs, epoch) 1-bit (+-1 float) samples.

    Returns (new_state, outputs) with outputs per epoch:
    ip, qp (nch,), code_phase snapshot, carr_freq snapshot, cn0 proxy.
    """
    nch = state.code_phase.shape[0]
    n = params.epoch
    t = jnp.arange(n, dtype=jnp.float32)
    g1, g2 = jnp.float32(params.pll_g1), jnp.float32(params.pll_g2)
    gf, gd = jnp.float32(params.fll_g), jnp.float32(params.dll_g)
    two_pi = jnp.float32(2 * np.pi)
    ch_off = jnp.arange(nch, dtype=jnp.int32)[:, None] * E1B_CODELEN

    def epoch_step(st: TrackState, x):
        # ---- carrier wipeoff: (nch, n) ----
        ph = st.carr_phase[:, None] + t[None, :] * st.carr_freq[:, None]
        cr, sr = jnp.cos(ph), jnp.sin(ph)
        xi = x[None, :] * cr          # I = x*cos
        xq = -x[None, :] * sr         # Q = -x*sin  (mix by e^{-j ph})

        # ---- code replicas at E/P/L ----
        # A naive per-sample code lookup is a (nch, n) dynamic gather
        # three times per epoch — measured ~6.7 ns/element on TPU,
        # 1.6 s per 0.4 s chunk, 4x slower than realtime.  The signal
        # has EXACTLY 16 samples per chip (fs/chip = 16368/1023), so
        # instead: gather only the ~1 ms chip WINDOW per channel
        # (nch x 1027, 16x16x fewer elements), expand chips -> samples
        # with a static repeat(16), and align sub-chip phase with
        # per-channel contiguous dynamic slices.  E/P/L replicas are
        # the same sequence shifted by +-corr_half*16 samples.  The
        # within-epoch rate deviation from exactly 1/16 chip/sample is
        # |Doppler| <= ~1e-5 relative -> <= 0.0015 chip over the
        # epoch, and the start phase quantizes to 1/32 chip — both far
        # below DLL noise and dithered across epochs (the carried
        # code_phase still advances by the TRUE rate).
        cl = st.code_len[:, None]
        is_boc = st.boc[:, None]
        NW = 1027                       # chips spanned by 1 ms + margin
        i0 = jnp.floor(st.code_phase).astype(jnp.int32)
        f0 = st.code_phase - i0
        widx = jnp.mod(i0[:, None] - 1 + jnp.arange(NW)[None, :],
                       cl.astype(jnp.int32)).astype(jnp.int32) + ch_off
        win = jnp.take(code_table, widx)           # (nch, NW)
        big = jnp.repeat(win, 16, axis=1)          # chip-aligned x16
        sub_big = jnp.tile(jnp.concatenate(
            [jnp.ones(8, jnp.float32), -jnp.ones(8, jnp.float32)]), NW)
        s_prompt = 16 + jnp.round(f0 * 16.0).astype(jnp.int32)
        s_half = jnp.round(st.corr_half * 16.0).astype(jnp.int32)

        def _code_at(starts):
            c = jax.vmap(lambda row, s: jax.lax.dynamic_slice(
                row, (s,), (n,)))(big, starts)
            sb = jax.vmap(lambda s: jax.lax.dynamic_slice(
                sub_big, (s,), (n,)))(starts)
            return c * jnp.where(is_boc > 0, sb, 1.0)

        def corr(sign, split=False):
            c = _code_at(s_prompt
                         + jnp.int32(sign) * s_half)
            i_full = jnp.sum(xi * c, axis=1)
            q_full = jnp.sum(xq * c, axis=1)
            if not split:
                return i_full, q_full
            # split the prompt at the window's internal code-period
            # boundary: the pre part belongs to the code period the
            # window starts in, the post part to the next one.  E1B
            # symbols are one code period, so the host can reassemble
            # EXACT symbol integrals even when the boundary falls
            # mid-window (otherwise every straddling window mixes
            # adjacent symbols — fatal for I/NAV at low SNR).
            t_b = (cl - jnp.mod(st.code_phase, st.code_len)[:, None]) \
                / st.code_rate[:, None]
            pre = t[None, :] < t_b
            i_pre = jnp.sum(jnp.where(pre, xi * c, 0.0), axis=1)
            q_pre = jnp.sum(jnp.where(pre, xq * c, 0.0), axis=1)
            return i_full, q_full, i_pre, q_pre

        ie, qe = corr(1.0)
        ip, qp, ip_pre, qp_pre = corr(0.0, split=True)
        il, ql = corr(-1.0)

        # ---- discriminators ----
        e_mag = jnp.sqrt(ie * ie + qe * qe)
        l_mag = jnp.sqrt(il * il + ql * ql)
        dll_err = (e_mag - l_mag) / jnp.maximum(e_mag + l_mag, 1e-9)
        # For BOC (E1B) channels the 4 ms symbol flips at CODE PERIOD
        # boundaries, which can fall mid-window: the full-window
        # prompt then mixes opposite-sign symbols and can null out,
        # poisoning the Costas/FLL discriminators (cycle slips at low
        # SNR).  Feed the loops the DOMINANT boundary partial instead
        # — sign-pure by construction.  (C/A bits last 20 periods, so
        # full-window prompts stay cleaner there: keep them.)
        qp_post = qp - qp_pre
        ip_post = ip - ip_pre
        use_pre = (ip_pre * ip_pre + qp_pre * qp_pre >=
                   ip_post * ip_post + qp_post * qp_post)
        is_boc1 = st.boc > 0
        ip_l = jnp.where(is_boc1,
                         jnp.where(use_pre, ip_pre, ip_post), ip)
        qp_l = jnp.where(is_boc1,
                         jnp.where(use_pre, qp_pre, qp_post), qp)
        # Costas (bit-insensitive, 2-quadrant) phase detector
        pll_err = jnp.arctan(qp_l / jnp.where(jnp.abs(ip_l) < 1e-9,
                                              1e-9, ip_l))
        # bit-insensitive (2-quadrant) FLL discriminator: atan2 would
        # jump by pi whenever a nav-bit edge flips the prompt phasor
        cross = ip_l * st.qp_prev - qp_l * st.ip_prev
        dot = ip_l * st.ip_prev + qp_l * st.qp_prev
        fll_err = jnp.arctan(
            cross / jnp.where(jnp.abs(dot) < 1e-9, 1e-9, dot))

        # ---- loop updates (per raw sample units) ----
        dfreq = (g2 * pll_err - gf * fll_err) / n
        carr_freq = st.carr_freq + dfreq
        carr_phase = jnp.mod(
            st.carr_phase + n * st.carr_freq + g1 * pll_err, two_pi)
        # carrier-aided code rate: code Doppler = carr Doppler / 1540
        carr_dop = carr_freq / two_pi * params.fs - params.fc
        code_rate = (CA_CHIP_RATE * (1 + carr_dop / 1.57542e9)
                     ) / params.fs
        code_phase = jnp.mod(
            st.code_phase + n * st.code_rate + gd * dll_err, st.code_len)

        cn0 = (ip * ip + qp * qp) / jnp.maximum(
            e_mag * e_mag + l_mag * l_mag, 1e-9)
        act = st.active
        new = TrackState(
            code_phase=jnp.where(act, code_phase, st.code_phase),
            code_rate=jnp.where(act, code_rate, st.code_rate),
            carr_phase=jnp.where(act, carr_phase, st.carr_phase),
            carr_freq=jnp.where(act, carr_freq, st.carr_freq),
            ip_prev=ip_l, qp_prev=qp_l, active=act,
            code_len=st.code_len, boc=st.boc, corr_half=st.corr_half)
        out = dict(ip=ip, qp=qp, ip_pre=ip_pre, qp_pre=qp_pre,
                   code_phase=st.code_phase,
                   carr_freq=carr_freq, dll_err=dll_err,
                   pll_err=pll_err, cn0=cn0)
        return new, out

    return lax.scan(epoch_step, state, raw)


# ---------------------------------------------------------------------------
# host-side bit sync (reference: host Tracking() nav-bit collection,
# `gps/channel.cpp:430-530`)
# ---------------------------------------------------------------------------

def bit_sync_confident(ip_seq: np.ndarray, settle: int = 300,
                       min_flips: int = 8, dominance: float = 2.0
                       ) -> int | None:
    """Bit-boundary phase (0..19) with a confidence gate, or None.

    The first ``settle`` epochs are skipped (DLL/PLL pull-in makes
    spurious sign flips — the reference likewise waits for lock before
    collecting nav bits, `gps/channel.cpp:430-530`); the winning
    histogram bin must hold ``min_flips`` hits and beat the runner-up
    by ``dominance``.  ``settle`` must be a multiple of 20 so the
    returned phase is relative to ``ip_seq[0]``.
    """
    assert settle % 20 == 0
    seq = np.asarray(ip_seq)[settle:]
    flips = np.where(np.diff(np.signbit(seq)))[0] + 1
    if len(flips) == 0:
        return None
    hist = np.bincount(flips % 20, minlength=20)
    best = int(np.argmax(hist))
    runner = int(np.sort(hist)[-2])
    if hist[best] < min_flips or hist[best] < dominance * max(runner, 1):
        return None
    return best


def bit_sync(ip_seq: np.ndarray) -> tuple[int, np.ndarray]:
    """Find the 20 ms nav-bit boundary and integrate bits.

    ip_seq: (n_epochs,) prompt-I per 1 ms epoch for one channel.
    Returns (offset, bits +-1) — offset = epochs until first boundary.
    """
    ip_seq = np.asarray(ip_seq)
    flips = np.where(np.diff(np.signbit(ip_seq)))[0] + 1
    if len(flips) == 0:
        return 0, np.sign(ip_seq[::20])[: len(ip_seq) // 20]
    hist = np.bincount(flips % 20, minlength=20)
    offset = int(np.argmax(hist))
    usable = ip_seq[offset:]
    nbits = len(usable) // 20
    bits = np.sign(usable[: nbits * 20].reshape(nbits, 20).sum(axis=1))
    return offset, bits.astype(np.int8)
