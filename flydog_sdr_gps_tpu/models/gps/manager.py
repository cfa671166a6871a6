"""GPS subsystem orchestration — the `gps_main()` analogue.

Reference flow (`gps/gps.cpp:40`, SURVEY.md section 3.4): SearchTask
round-robins satellites through FFT acquisition; hits hand off to one
of 12 channel tasks that track and collect nav bits; SolveTask every
2 s snapshots all channels, builds pseudoranges and solves position;
`clock_correction()` turns (GPS time, 48-bit ticks) pairs into the
corrected ADC clock that retunes every DDC NCO
(`rx/rx_sound.cpp:334-344`).

Here the same state machine runs host-side around the device kernels:
acquisition and the tracking scan are jitted TPU programs; decisions
(handoff, drop, solve cadence) are Python control flow at sub-Hz
rates, exactly like the reference's ARM-side logic.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from ...numerology import GPS_MAX_CHANS
from . import acquisition, cacode, clock, ephemeris, solver, tracking


@dataclasses.dataclass
class GpsChannel:
    prn: int
    state_idx: int                  # row in the batched TrackState
    acquired_snr: float = 0.0
    ip_history: list = dataclasses.field(default_factory=list)
    epochs: int = 0
    asm: ephemeris.SubframeAssembler = None
    bits_fed: int = 0
    lost_count: int = 0

    def __post_init__(self):
        if self.asm is None:
            self.asm = ephemeris.SubframeAssembler(prn=self.prn)


class GpsManager:
    """Drives acquisition/tracking/solution from streamed IF blocks."""

    def __init__(self, max_chans: int = GPS_MAX_CHANS,
                 prns=tuple(range(1, 33)) + cacode.QZSS_PRNS,
                 acq_params: acquisition.AcqParams | None = None,
                 track_params: tracking.TrackParams | None = None,
                 min_snr: float = 30.0,   # peak/mean; noise plane
                                           # maxes out ~20 (ref min_sig
                                           # analogue, gps/search.cpp)
                 on_clock=None):
        self.acq = acq_params or acquisition.AcqParams()
        self.tp = track_params or tracking.TrackParams()
        self.max_chans = max_chans
        self.prns = tuple(prns)
        self.min_snr = min_snr
        self.channels: dict[int, GpsChannel] = {}
        self.clock = clock.ClockDiscipline()
        self.ekf = solver.EkfSolver()
        self.on_clock = on_clock        # callback(adc_clock_hz)
        self.last_fix = None
        self.fixes = 0
        self._track_state = None
        self._code_table = None
        self.ticks = 0                  # IF sample counter

    # -- acquisition -----------------------------------------------------
    def cold_search(self, raw_if: np.ndarray) -> list[dict]:
        """Run the full-sky search on one 65536-sample IF capture and
        start tracking the hits (`SearchTask` -> `ChanStart`)."""
        tracked = {c.prn for c in self.channels.values()}
        cands = acquisition.acquire_all(
            self.acq, raw_if[: self.acq.n_raw], prns=self.prns)
        started = []
        for cand in cands:
            if len(self.channels) >= self.max_chans:
                break
            if cand["prn"] in tracked or cand["snr"] < self.min_snr:
                continue
            self._start_channel(cand)
            started.append(cand)
        return started

    def _start_channel(self, cand: dict) -> None:
        prns = [c.prn for c in self.channels.values()] + [cand["prn"]]
        phases = []
        dops = []
        for c in self.channels.values():
            st = self._track_state
            phases.append(float(st.code_phase[c.state_idx]))
            dops.append(float(st.carr_freq[c.state_idx])
                        / (2 * np.pi) * self.tp.fs - self.tp.fc)
        phases.append(cand["code_phase"])
        dops.append(cand["doppler"])
        self._track_state, self._code_table = tracking.init_track_state(
            self.tp, prns, phases, dops)
        # rebuild channel map (state rows are re-packed)
        newmap = {}
        for i, prn in enumerate(prns):
            old = next((c for c in self.channels.values()
                        if c.prn == prn), None)
            ch = old or GpsChannel(prn=prn, state_idx=i,
                                   acquired_snr=cand["snr"])
            ch.state_idx = i
            newmap[prn] = ch
        self.channels = newmap

    # -- tracking --------------------------------------------------------
    def track_block(self, raw_if: np.ndarray) -> None:
        """Advance all channels over an IF block (multiple 1 ms epochs)."""
        if not self.channels:
            self.ticks += len(raw_if)
            return
        n_ep = len(raw_if) // self.tp.epoch
        if n_ep == 0:
            return
        raw_e = jnp.asarray(
            raw_if[: n_ep * self.tp.epoch].astype(np.float32)
            .reshape(n_ep, self.tp.epoch))
        self._track_state, outs = tracking.track_epochs(
            self.tp, self._track_state, self._code_table, raw_e)
        ip = np.asarray(outs["ip"])
        qp = np.asarray(outs["qp"])
        for ch in list(self.channels.values()):
            i = ch.state_idx
            ch.ip_history.extend(ip[:, i].tolist())
            ch.epochs += n_ep
            # power monitor / drop (`CheckPower`, gps/channel.cpp:579):
            # Costas lock metric — mean|IP|^2 / mean(IP^2+QP^2) is ~1
            # when phase-locked (data on I only), ~0.4 on noise
            lock = (np.mean(np.abs(ip[:, i])) ** 2 /
                    max(np.mean(ip[:, i] ** 2 + qp[:, i] ** 2), 1e-9))
            if lock < 0.55:
                ch.lost_count += 1
                if ch.lost_count > 5:
                    del self.channels[ch.prn]
            else:
                ch.lost_count = 0
        self.ticks += len(raw_if)

    # -- nav decode ------------------------------------------------------
    def decode_nav(self) -> None:
        """Run bit sync + LNAV subframe assembly on each channel's
        accumulated prompt-I history (host control plane, like the
        reference's per-channel `Subframe` handling)."""
        for ch in self.channels.values():
            if len(ch.ip_history) < 600:     # need bit-sync confidence
                continue
            _off, bits = tracking.bit_sync(np.asarray(ch.ip_history))
            new = bits[ch.bits_fed:]
            if len(new):
                ch.asm.feed(new)
                ch.bits_fed = len(bits)

    def ephemerides(self) -> dict[int, ephemeris.Ephemeris]:
        """Currently decoded (complete) ephemerides per PRN."""
        return {ch.prn: ch.asm.eph for ch in self.channels.values()
                if ch.asm.eph.complete()}

    # -- solution --------------------------------------------------------
    def solve(self, ephemerides: dict[int, ephemeris.Ephemeris] | None,
              gps_time: float) -> np.ndarray | None:
        """Position solution from current tracking state + ephemerides.

        ``ephemerides``: prn -> Ephemeris (decoded or externally
        provided — cold-start nav decode needs ~30 s of bits).
        """
        if ephemerides is None:
            ephemerides = {}
        decoded = self.ephemerides()
        prns, sat_pos, pranges = [], [], []
        st = self._track_state
        for ch in self.channels.values():
            eph = ephemerides.get(ch.prn) or decoded.get(ch.prn)
            if eph is None or st is None:
                continue
            cp = float(st.code_phase[ch.state_idx])
            t_tx_off = (ch.epochs * 1e-3 + cp / 1.023e6)
            pos, sv_clk = eph.sat_pos(gps_time)
            prns.append(ch.prn)
            sat_pos.append(pos)
            pranges.append(-t_tx_off * solver.C_LIGHT
                           + sv_clk * solver.C_LIGHT)
        if len(prns) < 4:
            return None
        fix = self.ekf.update(np.asarray(sat_pos), np.asarray(pranges),
                              dt=2.0)
        self.last_fix = fix
        self.fixes += 1
        # clock discipline feedback
        adc = self.clock.update(gps_time, self.ticks)
        if self.on_clock is not None and self.clock.locked:
            self.on_clock(adc)
        return fix

    def status(self) -> dict:
        """UI/status summary (`gps/stat.cpp` analogue)."""
        return dict(
            tracking=len(self.channels),
            prns=sorted(self.channels),
            fixes=self.fixes,
            adc_clock=self.clock.adc_clock_hz,
            clock_ppm=round(self.clock.correction_ppm, 3),
            fix=None if self.last_fix is None else
            solver.lla_from_ecef(self.last_fix),
        )
