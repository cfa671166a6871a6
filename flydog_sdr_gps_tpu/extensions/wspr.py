"""WSPR extension — capture + TPU spectrogram front end + candidates.

Reference: `extensions/wspr/` (K9AN/WSJT wsprd port): per channel, a
2-minute 12 kHz capture is decimated to 375 Hz, searched for 4-FSK
candidates by sync-vector correlation over a (frequency x time-offset)
plane, then Fano/Jelinek sequential decoding of the K=32 r=1/2
convolutional code in a forked process (`wspr_main.cpp:473-480`).

TPU split implemented here (SURVEY.md section 7 step 8):
- capture/decimate/spectrogram/sync-correlation run on device as one
  jitted program — the candidate plane is a pure matmul against the
  162-symbol sync pattern;
- soft symbols for the best candidates are extracted for the host
  decoder.  (The sequential Fano decoder itself is round-2 work; the
  hook `decode_candidates` returns the soft-symbol matrix today.)

The 162-chip sync vector is the public WSPR protocol constant
(pr3, `extensions/wspr/wspr.cpp:31-40`, identical in every WSPR
implementation).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import cplx as cplx_ops
from ..ops import fft as fft_ops
from ..ops import filters
from ..ops.cplx import Cplx
from . import Extension, ext_register

# WSPR protocol constants
FS_AUDIO = 12000.0
FS_WSPR = 375.0           # = 12000 / 32
DECIM = 32
NSYM = 162
SPS = 256                 # samples per symbol at 375 Hz
TONE_SPACING = FS_WSPR / SPS            # 1.4648 Hz
DIAL_OFFSET = 1500.0      # audio center of the 200 Hz WSPR band
CAPTURE_S = 114.0         # reference captures ~114 s of signal

SYNC = np.array([
    1,1,0,0,0,0,0,0,1,0,0,0,1,1,1,0,0,0,1,0,
    0,1,0,1,1,1,1,0,0,0,0,0,0,0,1,0,0,1,0,1,
    0,0,0,0,0,0,1,0,1,1,0,0,1,1,0,1,0,0,0,1,
    1,0,1,0,0,0,0,1,1,0,1,0,1,0,1,0,1,0,0,1,
    0,0,1,0,1,1,0,0,0,1,1,0,1,0,1,0,0,0,1,0,
    0,0,0,0,1,0,0,1,0,0,1,1,1,0,1,1,0,0,1,1,
    0,1,0,0,0,1,1,1,0,0,0,0,0,1,0,1,0,0,1,1,
    0,0,0,0,0,0,0,1,1,0,1,0,1,1,0,0,0,1,1,0,
    0,0], np.float32)


def _make_frontend():
    """Jit: audio (n,) f32 -> (freq_bins, nsym, 4) tone powers +
    sync-correlation (freq_bins, ndt)."""
    h = filters.kaiser_lowpass(FS_AUDIO, 150.0, 210.0, 60.0,
                               numtaps=DECIM * 8)
    hh = jnp.asarray(h, jnp.float32)

    def frontend(audio):
        n = audio.shape[0]
        t = jnp.arange(n, dtype=jnp.float32) / jnp.float32(FS_AUDIO)
        ang = jnp.float32(2 * np.pi * DIAL_OFFSET) * t
        z = Cplx(audio * jnp.cos(ang), -audio * jnp.sin(ang))
        # polyphase decimate by 32 via framing matmul
        from ..ops.channelizer import frame
        m = len(h) // DECIM
        pad = (m - 1) * DECIM
        zr = jnp.concatenate([jnp.zeros(pad), z.re])
        zi = jnp.concatenate([jnp.zeros(pad), z.im])
        k = n // DECIM
        fr = frame(zr[:(k + m - 1) * DECIM], DECIM, m)
        fi = frame(zi[:(k + m - 1) * DECIM], DECIM, m)
        b = Cplx(fr @ hh, fi @ hh)              # (k,) at 375 Hz
        # symbol-rate spectrogram: 162 symbols x 256-sample DFT
        nsym_have = k // SPS
        segs = b[:nsym_have * SPS].reshape(nsym_have, SPS)
        spec = fft_ops.fft(segs)                # (nsym, 256)
        spec = fft_ops.fftshift_axis(spec, axis=1)
        power = spec.abs2()                     # tone bins 1.46 Hz apart
        # after the shift: bin i <-> audio freq
        #   DIAL_OFFSET + (i - SPS/2) * TONE_SPACING
        # the 375 Hz baseband also returns so the host can run the
        # fine (freq, time, drift) candidate refinement
        return power, b.re, b.im

    return jax.jit(frontend)


def sync_correlate(power: np.ndarray, max_dt_sym: int = 4
                   ) -> list[dict]:
    """Host: correlate the spectrogram against the sync vector.

    power: (nsym_have, 256) tone powers.  WSPR tone k of a candidate
    at base bin f is bin (f + 2*sync + 2*data? no: tones are
    f + {0..3} * 1 bin at this resolution); sync bit = tone LSB.
    Correlation metric per (f, dt): sum over symbols of
    +-(p(f+1bin...)-...) per the reference's `ss` metric
    (`wspr.cpp:160-174`).
    """
    nsym_have, nbins = power.shape
    if nsym_have < NSYM:
        return []
    cands = []
    sync_pm = 2 * SYNC - 1
    half = SPS // 2
    # WSPR band: +-100 Hz around the dial offset -> bins half-68..half+68
    for dt in range(0, min(max_dt_sym, nsym_have - NSYM) + 1):
        p = power[dt:dt + NSYM]                # (162, 256)
        # tones occupy 4 adjacent bins starting at f
        for f in range(half - 75, half + 72):
            p0, p1 = p[:, f], p[:, f + 1]
            p2, p3 = p[:, f + 2], p[:, f + 3]
            ss = float(np.sum(sync_pm * ((p1 + p3) - (p0 + p2))))
            pow_tot = float(np.sum(p0 + p1 + p2 + p3))
            if pow_tot > 0:
                cands.append(dict(
                    bin=f, dt=dt, sync=ss / pow_tot,
                    freq=DIAL_OFFSET + (f - half) * TONE_SPACING))
    cands.sort(key=lambda c: -c["sync"])
    return cands[:20]


def soft_symbols(power: np.ndarray, cand: dict) -> np.ndarray:
    """Soft data symbols for one candidate (`wspr.cpp:168-173`):
    data bit metric = p3-p1 when sync=1 else p2-p0."""
    p = power[cand["dt"]:cand["dt"] + NSYM]
    f = cand["bin"]
    p0, p1 = p[:, f], p[:, f + 1]
    p2, p3 = p[:, f + 2], p[:, f + 3]
    return np.where(SYNC == 1, p3 - p1, p2 - p0).astype(np.float32)


# ---------------------------------------------------------------------------
# fine candidate refinement (the wsprd `sync_and_demodulate` analogue,
# `extensions/wspr/wspr.cpp` mode 0/1/2 passes): the coarse spectrogram
# grid is 1 tone bin x 1 symbol; a real signal sits between grid points
# and drifts, so each candidate is refined by maximizing the sync
# metric over (freq offset, symbol timing, linear drift) with 4-tone
# matched filters on the 375 Hz baseband.
# ---------------------------------------------------------------------------

def tone_powers(z375: np.ndarray, f0_hz: float, start_samp: int,
                drift_hz: float = 0.0) -> np.ndarray | None:
    """(NSYM, 4) matched-filter tone powers from the 375 Hz baseband.

    ``f0_hz``: tone-0 frequency relative to the baseband center (the
    spectrogram's DIAL_OFFSET); ``drift_hz``: total linear frequency
    change over the 162-symbol transmission.
    """
    n = NSYM * SPS
    if start_samp < 0 or start_samp + n > len(z375):
        return None
    seg = z375[start_samp:start_samp + n]
    t = np.arange(n) / FS_WSPR
    inst = f0_hz + drift_hz * (t / t[-1] - 0.5)
    ph = 2 * np.pi * np.cumsum(inst) / FS_WSPR
    base = seg * np.exp(-1j * ph)
    out = np.empty((NSYM, 4))
    for m in range(4):
        mixed = (base * np.exp(-2j * np.pi * (m * TONE_SPACING) * t)
                 ).reshape(NSYM, SPS)
        out[:, m] = np.abs(mixed.sum(axis=1)) ** 2
    return out


def _sync_metric(p: np.ndarray) -> float:
    s = 2.0 * SYNC - 1.0
    return float(np.sum(s * ((p[:, 1] + p[:, 3]) - (p[:, 0] + p[:, 2])))
                 / max(np.sum(p), 1e-12))


def refine_candidate(z375: np.ndarray, cand: dict,
                     search_drift: bool = True) -> dict | None:
    """Fine (freq, time, drift) search around a coarse candidate.

    Returns the refined candidate with normalized soft data symbols
    under ``soft`` (per-symbol power normalization caps the influence
    of symbols hit by overlapping transmissions), or None if the
    transmission window does not fit in the capture.
    """
    half = SPS // 2
    f_base = (cand["bin"] - half) * TONE_SPACING
    s_base = cand["dt"] * SPS
    best = None
    for df in np.arange(-0.75, 0.76, TONE_SPACING / 8.0):
        for ds in range(-SPS, SPS + 1, SPS // 8):
            p = tone_powers(z375, f_base + df, s_base + ds)
            if p is None:
                continue
            m = _sync_metric(p)
            if best is None or m > best[0]:
                best = (m, df, ds, 0.0, p)
    if best is None:
        return None
    if search_drift:
        m0, df0, ds0 = best[0], best[1], best[2]
        for drift in np.arange(-4.0, 4.01, 0.5):
            if drift == 0.0:
                continue
            p = tone_powers(z375, f_base + df0, s_base + ds0, drift)
            if p is None:
                continue
            m = _sync_metric(p)
            if m > best[0]:
                best = (m, df0, ds0, float(drift), p)
    m, df, ds, drift, p = best
    soft = np.where(SYNC == 1, p[:, 3] - p[:, 1], p[:, 2] - p[:, 0])
    soft = (soft / (p.sum(axis=1) + 1e-12)).astype(np.float32)
    out = dict(cand)
    out.update(sync=m, drift=drift,
               freq=DIAL_OFFSET + f_base + df,
               dt_s=(s_base + ds) / FS_WSPR, soft=soft)
    return out


@ext_register
class WsprExt(Extension):
    name = "wspr"

    def start(self, **params):
        self._audio = []
        self._samples = 0
        self._frontend = _make_frontend()
        self.capture_samples = int(CAPTURE_S * FS_AUDIO)
        self.results = []
        # capture-cycle alignment (the reference starts WSPR captures
        # at even UTC minutes, `extensions/wspr/wspr_main.cpp`; the
        # framework's timebase is stream time): wait for the start of
        # a 120 s cycle before capturing, so a transmission that
        # begins on-cycle lands whole inside the 114 s window.  A
        # scene source exposes its true cycle via fsk_cycle_pos_s.
        self.align = bool(params.get("align", True))
        self._waiting = self.align

    def _cycle_pos(self) -> tuple[float, float]:
        src = getattr(self.engine, "source", None)
        fn = getattr(src, "fsk_cycle_pos_s", None)
        if fn is not None and getattr(src, "_fsk", None):
            return fn()
        ticks = getattr(self.engine, "block_ticks", 0)
        clk = getattr(getattr(self.engine, "params", None),
                      "adc_clock", None)
        if clk is None:
            return 0.0, 120.0           # fake engine: capture now
        return (ticks / clk) % 120.0, 120.0

    def process_block(self, taps) -> list:
        if self._waiting:
            pos, _cyc = self._cycle_pos()
            p = self.engine.params
            block_s = (getattr(p, "audio_block", 128)
                       / getattr(p, "fs_out", FS_AUDIO))
            if pos > 2.0 * block_s:
                return []               # mid-cycle: keep waiting
            self._waiting = False
        a = taps.audio[:, self.rx_chan]
        self._audio.append(a)
        self._samples += a.shape[0]
        if self._samples < self.capture_samples:
            return []
        audio = jnp.concatenate(self._audio)[:self.capture_samples]
        self._audio, self._samples = [], 0
        self._waiting = self.align      # re-align for the next cycle
        power, bre, bim = self._frontend(audio)
        power = np.asarray(power)
        z375 = np.asarray(bre) + 1j * np.asarray(bim)
        cands = sync_correlate(
            power, max_dt_sym=max(power.shape[0] - NSYM, 0))
        self.results = []
        for c in cands[:5]:
            r = refine_candidate(z375, c)
            if r is not None:
                self.results.append((r, r["soft"]))
            else:
                self.results.append((c, soft_symbols(power, c)))
        out = []
        best = cands[0] if cands else {}
        out.append(("wspr_status",
                    (f"cands={len(cands)} "
                     f"best_freq={best.get('freq', 0):.2f} "
                     f"best_sync={best.get('sync', 0):.3f}").encode()))
        for spot in self.decode_candidates():
            out.append(("wspr_decode",
                        (f"{spot['callsign']} {spot['grid']} "
                         f"{spot['dbm']} {spot['freq']:.2f}").encode()))
        return out

    def decode_candidates(self, min_sync: float = 0.15) -> list[dict]:
        """Run the sequential decoder on the synced candidates; returns
        spots [{'callsign','grid','dbm','freq','sync'}, ...]."""
        from . import wspr_decode
        spots = []
        seen = set()
        for cand, soft in self.results:
            if cand["sync"] < min_sync:
                continue
            msg = wspr_decode.decode_soft_symbols(soft)
            if msg is None:
                continue
            key = (msg.callsign, msg.grid)
            if key in seen:
                continue
            seen.add(key)
            spots.append(dict(callsign=msg.callsign, grid=msg.grid,
                              dbm=msg.dbm, freq=cand["freq"],
                              sync=cand["sync"]))
        return spots
