"""DRM extension — Digital Radio Mondiale receiver core (OFDM + FAC/SDC/MSC).

Reference: `extensions/DRM/` vendors Dream 2.1.1 (2.9 MB C++ incl.
FDK-AAC), forked per channel with shmem IPC (`DRM.cpp:155-158,377`).
DRM is a COFDM broadcast system; this module implements the receiver
stack for robustness mode B in the 10 kHz channel (spectrum occupancy
3) at the framework's 12 kHz channel rate:

- OFDM cell mapping: the REAL ETSI ES 201 980 section 8.4 layout via
  :mod:`drm_tables` (same tables as Dream's `CellMappingTable.cpp`):
  carriers k = -103..103 (Tu = 256 samples at 12 kHz = mode B's
  46.875 Hz spacing, 64-sample 1/4 guard), scattered gain pilots on
  the k ≡ 1+2(s mod 3) (mod 6) lattice with the W/Z/Q phase formula,
  time/frequency reference pilots, 65 FAC cells per frame at the
  table positions, SDC in the first 2 superframe symbols, remaining
  cells MSC.
- Coding: the REAL ETSI section 7 multilevel coding via
  :mod:`drm_mlc` (tables matching Dream's `MLC/` value-for-value):
  energy dispersal, punctured K=7 rate-1/4 mother code
  (133/171/145/133 octal), ETSI table 58/59 puncturing/tailbit
  patterns, 7.3.3 block bit-interleavers (t_0 = 13/21), normalized
  QAM mapping.  FAC = 72 bits at R=3/5 over 65 QPSK cells; SDC =
  CS_1_SM (R=1/2 QPSK); MSC = CS_2_SM 16-QAM (2 levels) or CS_3_SM
  64-QAM (3 levels), EEP protection level 1.
- SDC and MSC payloads are length+CRC-16 framed byte streams (the
  full DRM multiplex/SDC-entity parse is out of scope; no AAC).
- Sync: guard-interval correlation (symbol timing + fractional CFO),
  pilot-grid channel estimator with frequency interpolation,
  zero-forcing equalization.

Scope note: MSC payload is delivered as a byte stream (data services /
text). AAC audio decode is NOT implemented — the reference's audio
path depends on the vendored FDK-AAC codec; xHE/AAC bitstreams are
surfaced raw on the "drm_msc" tap instead.
"""

from __future__ import annotations

import numpy as np

from . import Extension, ext_register
from . import drm_mlc
from . import drm_tables
from .hfdl import crc16_ccitt

FS = 12000.0
CMAP = drm_tables.make_cell_map("B", 3, fs=FS)
TU = CMAP.tu                 # 256 samples (46.875 Hz spacing)
GUARD = CMAP.guard           # 64 samples (1/4 guard, mode B)
TS = TU + GUARD              # 320 samples/symbol
SYMS_PER_FRAME = CMAP.syms_per_frame        # 15
FRAMES_PER_SUPER = drm_tables.NUM_FRAMES_IN_SUPERFRAME
KMIN, KMAX = CMAP.kmin, CMAP.kmax           # -103..103 (SO_3)

_PILOT_FLAGS = (drm_tables.CM_SCAT_PI | drm_tables.CM_TI_PI
                | drm_tables.CM_FRE_PI)


def pilot_cells(ssym: int) -> tuple[np.ndarray, np.ndarray]:
    """(carriers k, complex pilot values) of superframe symbol
    ``ssym`` (phases/gains per ETSI 8.4, from the cell map)."""
    ks = CMAP.cells_of(_PILOT_FLAGS, ssym)
    return ks, CMAP.pilots[ssym, ks - KMIN]


def fac_cells_of(fsym: int) -> np.ndarray:
    """FAC carriers of frame symbol ``fsym`` (table positions)."""
    return CMAP.cells_of(drm_tables.CM_FAC, SYMS_PER_FRAME + fsym)


def data_cells(sym: int, frame_in_super: int,
               want_sdc: bool) -> np.ndarray:
    """MSC (or SDC) carriers of frame symbol ``sym`` of frame
    ``frame_in_super``."""
    ssym = frame_in_super * SYMS_PER_FRAME + sym
    flag = drm_tables.CM_SDC if want_sdc else drm_tables.CM_MSC
    return CMAP.cells_of(flag, ssym)


# ---------------------------------------------------------------------------
# channel coding: one MlcParams per logical channel, sized from the
# cell map (MSC is coded per transmission frame, SDC per superframe,
# FAC per frame — `dream/MLC/MLC.cpp:474` CalculateParam)
# ---------------------------------------------------------------------------

def _count_data_cells(sdc: bool, frame: int | None = None) -> int:
    tot = 0
    frames = range(FRAMES_PER_SUPER) if frame is None else (frame,)
    for f in frames:
        for sym in range(SYMS_PER_FRAME):
            ssym = f * SYMS_PER_FRAME + sym
            flag = drm_tables.CM_SDC if sdc else drm_tables.CM_MSC
            tot += len(CMAP.cells_of(flag, ssym))
    return tot


NUM_FAC_CELLS = drm_tables.NUM_FAC_CELLS
FAC_MLC = drm_mlc.MlcParams("fac", NUM_FAC_CELLS)
SDC_MLC = drm_mlc.MlcParams("sdc", _count_data_cells(True))
# EEP (N1=0) protection level 1, 16-QAM and 64-QAM variants per frame
MSC_MLC_16 = [drm_mlc.MlcParams("msc", _count_data_cells(False, f),
                                levels=2, protection=1)
              for f in range(FRAMES_PER_SUPER)]
MSC_MLC_64 = [drm_mlc.MlcParams("msc", _count_data_cells(False, f),
                                levels=3, protection=1)
              for f in range(FRAMES_PER_SUPER)]


def crc8(data_bits: np.ndarray) -> int:
    """DRM CRC-8 (ETSI ES 201 980 annex D): poly x^8+x^4+x^3+x^2+1,
    init all-ones, output inverted, MSB first (verified equivalent to
    Dream's `util/CRC.cpp` shift-register form)."""
    reg = 0xFF
    for b in data_bits:
        fb = ((reg >> 7) & 1) ^ int(b)
        reg = ((reg << 1) & 0xFF) ^ (0x1D if fb else 0)
    return reg ^ 0xFF


# ---------------------------------------------------------------------------
# FAC block: the ETSI 72-bit parameter set (channel params 20 bits +
# service params 44 bits + CRC-8), field layout per the reference's
# `dream/FAC/FAC.cpp:37-215` (ETSI ES 201 980 section 6.3)
# ---------------------------------------------------------------------------

_FAC_IDENTITY = (3, 1, 2)      # identity field per superframe frame
_FAC_FRAME_OF = {3: 0, 0: 0, 1: 1, 2: 2}
_MSC_MODE_OF_QAM = {64: 0, 16: 3}       # CS_3_SM / CS_2_SM
_QAM_OF_MSC_MODE = {0: 64, 1: 64, 2: 64, 3: 16}


def fac_pack(service_id: int, label_idx: int, msc_qam: int = 16,
             frame_idx: int = 0) -> np.ndarray:
    """72 FAC bits: channel + service parameters + CRC-8."""
    bits = np.zeros(64, np.uint8)
    pos = 0

    def put(val, n):
        nonlocal pos
        for i in range(n):
            bits[pos + i] = (val >> (n - 1 - i)) & 1
        pos += n
    put(0, 1)                             # base/enhancement: base
    put(_FAC_IDENTITY[frame_idx], 2)      # identity (frame position)
    put(3, 4)                             # spectrum occupancy SO_3
    put(1, 1)                             # interleaver depth: short
    put(_MSC_MODE_OF_QAM[msc_qam], 2)     # MSC mode
    put(1, 1)                             # SDC mode: CS_1_SM (QPSK)
    put(4, 4)                             # number of services: 1 audio
    put(0, 3)                             # reconfiguration index
    put(0, 2)                             # rfu
    put(service_id & 0xFFFFFF, 24)        # service identifier
    put(0, 2)                             # short ID
    put(0, 1)                             # CA indication
    put(0, 4)                             # language
    put(0, 1)                             # audio/data flag: audio
    put(label_idx & 0x1F, 5)              # service descriptor
    put(0, 7)                             # rfa
    assert pos == 64
    c = crc8(bits)
    return np.concatenate([bits, np.array(
        [(c >> (7 - i)) & 1 for i in range(8)], np.uint8)])


def fac_unpack(bits72: np.ndarray) -> dict | None:
    if crc8(bits72[:64]) != int("".join(map(str, bits72[64:72])), 2):
        return None

    def get(lo, n):
        v = 0
        for i in range(n):
            v = (v << 1) | int(bits72[lo + i])
        return v
    if get(3, 4) != 3:                    # spectrum occupancy SO_3
        return None
    return {"service_id": get(20, 24),
            "label_idx": get(52, 5),
            "msc_qam": _QAM_OF_MSC_MODE[get(8, 2)],
            "frame_idx": _FAC_FRAME_OF.get(get(1, 2), 0)}


# FAC channel coding: the spec MLC chain — 72 bits at R=3/5 (rate id
# 6, `TableMLC.h` iCodRateCombFDC4SM) through the punctured rate-1/4
# mother code to the 130 bits of the 65 QPSK FAC cells

def fac_encode(bits72: np.ndarray) -> np.ndarray:
    """72 FAC bits -> 65 QPSK cells (dispersal+FEC+interleave+map)."""
    return FAC_MLC.encode(np.asarray(bits72, np.uint8))


def fac_cells_decode(cells: np.ndarray) -> dict | None:
    """65 equalized FAC cells -> FAC dict or None."""
    return fac_unpack(FAC_MLC.decode(np.asarray(cells)))


# ---------------------------------------------------------------------------
# Transmitter (loopback source / sig-gen)
# ---------------------------------------------------------------------------

class DrmTx:
    def __init__(self, service_id: int = 0xA1B2C3, label_idx: int = 7,
                 msc_qam: int = 16):
        self.service_id = service_id
        self.label_idx = label_idx
        self.msc_qam = msc_qam

    def superframe(self, sdc_payload: bytes,
                   msc_payload) -> np.ndarray:
        """One 3-frame superframe of passband audio (no silence pad).

        ``msc_payload``: bytes (data service, length+CRC-16 framed)
        OR a list of 3 lists of AAC access units — then each
        transmission frame carries an ETSI 5.3.1 AUDIO SUPER FRAME
        (:mod:`drm_audio`)."""
        sdc_cells = SDC_MLC.encode(self._fit(
            self._framed_bytes(sdc_payload), SDC_MLC.total_bits))
        msc_mlc = MSC_MLC_16 if self.msc_qam == 16 else MSC_MLC_64
        si = 0
        out = []
        for f in range(FRAMES_PER_SUPER):
            fac_cells = fac_encode(
                fac_pack(self.service_id, self.label_idx,
                         msc_qam=self.msc_qam, frame_idx=f)[:72])
            # MSC is coded per transmission frame (MLC.cpp iN_mux =
            # useful MSC cells per frame); same framed payload each
            if isinstance(msc_payload, (list, tuple)):
                from . import drm_audio
                cap = msc_mlc[f].total_bits // 8
                sf = drm_audio.build_super_frame(
                    list(msc_payload[f]), cap)
                bits = np.unpackbits(np.frombuffer(sf, np.uint8))
                msc_bits = self._fit(bits, msc_mlc[f].total_bits)
            else:
                msc_bits = self._fit(self._framed_bytes(msc_payload),
                                     msc_mlc[f].total_bits)
            msc_cells = msc_mlc[f].encode(msc_bits)
            fi, mi = 0, 0
            for sym in range(SYMS_PER_FRAME):
                ssym = f * SYMS_PER_FRAME + sym
                spec = np.zeros(TU, np.complex128)

                def put(k, v):
                    spec[k % TU] = v
                ks, vals = pilot_cells(ssym)
                for k, v in zip(ks, vals):
                    put(int(k), v)
                for k in fac_cells_of(sym):
                    put(int(k), fac_cells[fi])
                    fi += 1
                for k in data_cells(sym, f, want_sdc=True):
                    put(int(k), sdc_cells[si])
                    si += 1
                for k in data_cells(sym, f, want_sdc=False):
                    put(int(k), msc_cells[mi])
                    mi += 1
                td = np.fft.ifft(spec) * np.sqrt(TU)
                out.append(np.concatenate([td[-GUARD:], td]))
        # complex baseband: DRM is 8.5 kHz wide and rides the IQ
        # tap (reference: ext_register_receive_iq_samps, DRM.cpp),
        # not the real audio channel
        return np.concatenate(out).astype(np.complex64)

    @staticmethod
    def _framed_bytes(payload: bytes) -> np.ndarray:
        hdr = len(payload).to_bytes(2, "big")
        crc = crc16_ccitt(hdr + payload).to_bytes(2, "big")
        return np.unpackbits(np.frombuffer(hdr + payload + crc,
                                           np.uint8))

    @staticmethod
    def _fit(bits: np.ndarray, n: int) -> np.ndarray:
        if len(bits) >= n:
            return bits[:n]
        reps = -(-n // len(bits))
        return np.tile(bits, reps)[:n]



# ---------------------------------------------------------------------------
# Receiver
# ---------------------------------------------------------------------------

class DrmRx:
    """Streaming DRM receiver: 12 kHz real audio in; FAC dicts and
    SDC/MSC payloads out.

    ``msc_audio=True`` parses each frame's MSC as an ETSI 5.3.1
    audio super frame and emits validated AAC access units on
    ``drm_audio_frame`` instead of the byte-stream framing."""

    def __init__(self, msc_audio: bool = False):
        self._audio = np.zeros(0, np.complex64)
        self._n0 = 0
        self.fac: dict | None = None
        self.msc_audio = msc_audio
        self._synced_at: int | None = None

    def feed(self, iq: np.ndarray) -> list[tuple[str, object]]:
        self._audio = np.concatenate([self._audio,
                                      np.asarray(iq, np.complex64)])
        need = (FRAMES_PER_SUPER * SYMS_PER_FRAME + 2) * TS + TU
        out = []
        while len(self._audio) >= need + TS:
            bb = self._audio.astype(np.complex128)
            start, cfo = self._sync(bb[:need + TS])
            if start is None:
                self._drop(need // 2)
                continue
            res = self._demod_super(bb, start, cfo)
            if res is None:
                self._drop(start + TS)
                continue
            out.extend(res)
            self._drop(start + FRAMES_PER_SUPER * SYMS_PER_FRAME * TS)
        return out

    def _drop(self, n: int) -> None:
        n = max(int(n), 1)
        self._audio = self._audio[n:]
        self._n0 += n

    # -- synchronisation --------------------------------------------------
    def _sync(self, bb: np.ndarray):
        """Guard correlation -> (superframe start sample, fractional
        CFO in carrier spacings) or (None, 0)."""
        n = len(bb) - TU - TS
        g = bb[:n + TU] * np.conj(bb[TU:n + TU + TU])
        # moving sum over the guard length
        cs = np.cumsum(np.concatenate([[0], g[:n + GUARD]]))
        mov = cs[GUARD:] - cs[:-GUARD]
        # fold over the symbol period: peaks every TS
        m = (len(mov) // TS) * TS
        if m < 3 * TS:
            return None, 0.0
        fold = np.abs(mov[:m].reshape(-1, TS)).sum(axis=0)
        e = np.abs(bb[:m]) ** 2
        if fold.max() < 1e-6 or fold.max() < 2.0 * np.median(fold):
            return None, 0.0
        sym_off = int(np.argmax(fold))
        # fractional CFO from guard-correlation phase at the peaks
        pk = mov[sym_off::TS]
        cfo = -np.angle(np.sum(pk)) / (2 * np.pi)
        # find the superframe boundary: try each symbol slot, decode
        # FAC of the frame starting there (cheap: 1 frame of FFTs)
        for cand in range(FRAMES_PER_SUPER * SYMS_PER_FRAME):
            s0 = sym_off + cand * TS
            if s0 + SYMS_PER_FRAME * TS + TU > len(bb):
                break
            fac = self._try_fac(bb, s0, cfo)
            if fac is not None:
                # frame_idx tells where we are in the superframe
                start = s0 - fac["frame_idx"] * SYMS_PER_FRAME * TS
                if start >= 0:
                    self.fac = fac
                    return start, cfo
        return None, 0.0

    def _fft_symbol(self, bb, s0, sym, cfo):
        seg = bb[s0 + sym * TS + GUARD: s0 + sym * TS + GUARD + TU]
        if len(seg) < TU:
            return None
        t = np.arange(len(seg))
        seg = seg * np.exp(-2j * np.pi * cfo * t / TU)
        return np.fft.fft(seg) / np.sqrt(TU)

    def _estimate_channel(self, spec, ssym):
        """LS estimate on this symbol's pilot cells (scattered + time
        + frequency references), linear interpolation across
        carriers.  Pilot values repeat per frame, so ``ssym`` may be
        any superframe symbol with the right frame phase."""
        ks, ref = pilot_cells(ssym)
        h = spec[ks % TU] / ref
        k_all = np.arange(KMIN, KMAX + 1)
        hr = np.interp(k_all, ks, np.real(h))
        hi = np.interp(k_all, ks, np.imag(h))
        return dict(zip(k_all.tolist(), hr + 1j * hi))

    def _try_fac(self, bb, s0, cfo) -> dict | None:
        cells = []
        for sym in range(SYMS_PER_FRAME):
            ks = fac_cells_of(sym)
            if len(ks) == 0:
                continue
            spec = self._fft_symbol(bb, s0, sym, cfo)
            if spec is None:
                return None
            # pilots depend only on the frame symbol; row 15+sym has
            # the same pilot cells for any frame
            hmap = self._estimate_channel(spec, SYMS_PER_FRAME + sym)
            for k in ks:
                hh = hmap[int(k)]
                if abs(hh) < 1e-9:
                    return None
                cells.append(spec[k % TU] / hh)
        return fac_cells_decode(np.asarray(cells))

    def _demod_super(self, bb, start, cfo):
        sdc_cells, facs = [], []
        msc_by_frame = [[] for _ in range(FRAMES_PER_SUPER)]
        for f in range(FRAMES_PER_SUPER):
            s0 = start + f * SYMS_PER_FRAME * TS
            fac = self._try_fac(bb, s0, cfo)
            if fac is None:
                return None
            facs.append(fac)
            for sym in range(SYMS_PER_FRAME):
                ssym = f * SYMS_PER_FRAME + sym
                spec = self._fft_symbol(bb, s0, sym, cfo)
                if spec is None:
                    return None
                hmap = self._estimate_channel(spec, ssym)
                for k in data_cells(sym, f, want_sdc=True):
                    sdc_cells.append(spec[k % TU] / hmap[int(k)])
                for k in data_cells(sym, f, want_sdc=False):
                    msc_by_frame[f].append(spec[k % TU] / hmap[int(k)])
        out = [("drm_fac", facs[0])]
        sdc = self._frame_payload(SDC_MLC.decode(np.asarray(sdc_cells)))
        if sdc is not None:
            out.append(("drm_sdc", sdc))
        msc_mlc = (MSC_MLC_16 if facs[0]["msc_qam"] == 16
                   else MSC_MLC_64)
        seen = set()
        for f in range(FRAMES_PER_SUPER):
            bits = msc_mlc[f].decode(np.asarray(msc_by_frame[f]))
            if self.msc_audio:
                from . import drm_audio
                data = np.packbits(
                    bits[:len(bits) - len(bits) % 8]).tobytes()
                frames = drm_audio.parse_super_frame(data)
                if frames is not None:
                    for au, ok in frames:
                        if ok and au:
                            out.append(("drm_audio_frame", au))
                continue
            msc = self._frame_payload(bits)
            if msc is not None and msc not in seen:
                seen.add(msc)
                out.append(("drm_msc", msc))
        return out

    @staticmethod
    def _frame_payload(bits: np.ndarray) -> bytes | None:
        """length+CRC-16 framed byte stream -> payload or None."""
        data = np.packbits(bits[:len(bits) - len(bits) % 8]).tobytes()
        if len(data) < 4:
            return None
        ln = int.from_bytes(data[:2], "big")
        if len(data) < ln + 4:
            return None
        if crc16_ccitt(data[:ln + 2]) != int.from_bytes(
                data[ln + 2:ln + 4], "big"):
            return None
        return data[2:ln + 2]


@ext_register
class DrmExt(Extension):
    name = "DRM"

    def start(self, **params):
        self.rx = DrmRx()

    def process_block(self, taps) -> list:
        iq = (np.asarray(taps.iq_post_agc.re[:, self.rx_chan])
              + 1j * np.asarray(taps.iq_post_agc.im[:, self.rx_chan]))
        out = []
        for tag, payload in self.rx.feed(iq.astype(np.complex64)):
            if tag == "drm_fac":
                out.append((tag, repr(payload).encode()))
            else:
                out.append((tag, payload))
        return out
