"""Shared waterfall subsystem: N client views on <= capacity chains.

Reference architecture: at most ``wf_chans`` (<= 4) wideband waterfall
DDCs exist in the FPGA; each connection owns one and programs its
decimation/NCO (`rx/rx_waterfall.cpp:410-510`).  Round 1 instead gave
every connection a private host-side chain and retraced it per zoom —
N waterfall users multiplied the heaviest compute in the system.

This subsystem restores the reference's shape, TPU-style:

- a SLOT is one streaming decimation chain at a (zoom, start, interp)
  view; connections attach/detach, identical views share one slot;
- the per-zoom programs are process-wide jit caches
  (`models.waterfall.jit_ingest/jit_frame`) — changing zoom reuses a
  compiled trace instead of retracing;
- frames are computed lazily (once per slot per due row) no matter how
  many clients watch, then fanned out with per-connection pacing
  (fps table `rx_waterfall.cpp:71-72,98-102` = off/1/5/13/23),
  aperture and compression state.

DX-masked frequency ranges zero their pixels before the dB mapping
(`rx_waterfall.cpp:905-918`).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..models import waterfall as wf_model
from ..numerology import MAX_ZOOM, WF_OUT_PX

# reference fps table: WF_SPEED_OFF/1FPS/SLOW/MED/FAST
WF_SPEEDS_FPS = (0, 1, 5, 13, 23)
# reference wf_interp_t {max, min, last, drop, cma} + CIC-comp offset
WF_INTERP = ("max", "min", "last", "drop", "cma")
WF_CIC_COMP = 10


@dataclasses.dataclass
class WfSlot:
    key: tuple                       # (zoom, start_bin, interp)
    params: object
    cf: float
    tune: tuple                      # (bank_r, bank_i, dphi) device
    state: object
    mask: object | None              # (out_px,) device multiplier
    interp: str = "cma"
    refs: int = 0
    acc: list = dataclasses.field(default_factory=list)
    need: int = 1
    dirty: bool = False
    row_db: np.ndarray | None = None
    row_seq: int = 0


class WfSubsystem:
    """Owns the shared slots; all device work happens in the caller's
    executor thread (one ingest per slot per block)."""

    def __init__(self, adc_clock: float, ui_srate: float,
                 capacity: int = 4, masked=()):
        self.adc_clock = adc_clock
        self.ui_srate = ui_srate
        self.capacity = capacity
        self.masked = list(masked)       # [(f_lo_hz, f_hi_hz), ...]
        self.slots: dict[tuple, WfSlot] = {}

    # -- attach / detach ---------------------------------------------------
    def attach(self, zoom: int, start_bin: int,
               interp: str = "cma") -> WfSlot | None:
        key = (zoom, start_bin, interp)
        slot = self.slots.get(key)
        if slot is None:
            if len(self.slots) >= self.capacity:
                self._evict_unreferenced()
            if len(self.slots) >= self.capacity:
                return None              # all chains busy (wf_chans full)
            slot = self._make_slot(key)
            self.slots[key] = slot
        slot.refs += 1
        return slot

    def detach(self, slot: WfSlot | None) -> None:
        if slot is not None and slot.refs > 0:
            slot.refs -= 1

    def _evict_unreferenced(self) -> None:
        for k in [k for k, s in self.slots.items() if s.refs <= 0]:
            del self.slots[k]

    def _make_slot(self, key: tuple) -> WfSlot:
        import jax.numpy as jnp
        zoom, start_bin, interp = key
        params = wf_model.make_wf_params(zoom, self.adc_clock,
                                         self.ui_srate)
        hz_per_start = self.ui_srate / (WF_OUT_PX << MAX_ZOOM)
        span = params.span
        cf = start_bin * hz_per_start + span / 2
        cf = min(max(cf, span / 2), self.ui_srate)
        br, bi, dphi = wf_model.tune(params, cf)
        mask = self._pixel_mask(cf, span)
        return WfSlot(
            key=key, params=params, cf=cf,
            tune=(jnp.asarray(br), jnp.asarray(bi), jnp.asarray(dphi)),
            state=wf_model.init_state(params),
            mask=None if mask is None else jnp.asarray(mask),
            interp=interp)

    def _pixel_mask(self, cf: float, span: float) -> np.ndarray | None:
        if not self.masked:
            return None
        edges = cf - span / 2 + span * np.arange(WF_OUT_PX + 1) / WF_OUT_PX
        mask = np.ones(WF_OUT_PX, np.float32)
        for (lo, hi) in self.masked:
            hit = (edges[1:] >= lo) & (edges[:-1] <= hi)
            mask[hit] = 0.0
        return None if mask.all() else mask

    def set_masked(self, masked) -> None:
        """Update the DX masked-frequency list; live slots re-mask."""
        import jax.numpy as jnp
        self.masked = list(masked)
        for slot in self.slots.values():
            m = self._pixel_mask(slot.cf, slot.params.span)
            slot.mask = None if m is None else jnp.asarray(m)
            slot.dirty = True

    # Max raw samples per compiled ingest program.  The WF chain
    # frames the input at base_decim hop (a (N/4, 32) gather) plus a
    # framing per halfband stage; at the serving block size
    # (2048 audio = 21.3 M ADC samples) XLA's program for the whole
    # block wants ~57 GB of HBM and fails to compile.  Chunking the
    # ingest host-side is EXACTLY equivalent (the streaming tails
    # carry across chunk boundaries — that is what they are for) and
    # keeps the per-program footprint at the proven 512-audio size.
    WF_CHUNK = 512 * 10416

    # -- data plane (executor thread) ---------------------------------------
    def ingest(self, x_dev) -> None:
        """Advance every live slot with one raw ADC block."""
        import jax.numpy as jnp
        for slot in list(self.slots.values()):
            if slot.refs <= 0:
                continue
            need = slot.params.ingest_blocks(x_dev.shape[0])
            if need > 1:
                slot.acc.append(x_dev)
                if len(slot.acc) < need:
                    continue
                x = jnp.concatenate(slot.acc)
                slot.acc = []
            else:
                x = x_dev
            br, bi, dphi = slot.tune
            div = slot.params.total_decim
            chunk = max((self.WF_CHUNK // div) * div, div)
            for off in range(0, x.shape[0], chunk):
                part = x[off:off + chunk]
                slot.state = wf_model.jit_ingest(slot.params)(
                    slot.state, part, br, bi, dphi)
            slot.dirty = True

    def frame(self, slot: WfSlot) -> np.ndarray:
        """Current row (out_px,) dBFS; computed once per dirty slot no
        matter how many connections read it."""
        import jax.numpy as jnp
        if slot.dirty or slot.row_db is None:
            mask = (slot.mask if slot.mask is not None
                    else jnp.ones((slot.params.out_px,), jnp.float32))
            row = wf_model.jit_frame(slot.params, "hanning",
                                     slot.interp)(slot.state, mask)
            slot.row_db = np.asarray(row)
            slot.row_seq += 1
            slot.dirty = False
        return slot.row_db
