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
- Coding: K=7 (171,133) convolutional code (shared Viterbi,
  `models/gps/galileo.py`) at rate 1/2 on SDC/MSC; the FAC block is
  the ETSI 72-bit parameter set (channel + service params + DRM
  CRC-8) rate-punctured to the 130 coded bits its 65 QPSK cells
  carry.  (Deviation from ETSI: the reference codes FAC with the
  punctured rate-1/4 MLC mother code, `dream/MLC/`; here the same
  r=1/2 K=7 code used elsewhere is punctured 6->5 — the cell layout
  and FAC bit content are spec-true, the FEC is not yet.)
- SDC and MSC are length+CRC-16 framed byte streams,
  block-interleaved, QPSK / 16-QAM.
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
from . import drm_tables
from ..models.gps.galileo import conv_encode_k7, viterbi_decode_k7
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
# bit <-> cell mapping
# ---------------------------------------------------------------------------

def qpsk_map(bits: np.ndarray) -> np.ndarray:
    b = bits.reshape(-1, 2).astype(np.int64)   # uint8 would wrap 1-2b
    return ((1 - 2 * b[:, 0]) + 1j * (1 - 2 * b[:, 1])) / np.sqrt(2)


def qpsk_soft(cells: np.ndarray) -> np.ndarray:
    soft = np.zeros(2 * len(cells))
    soft[0::2] = -np.real(cells) * np.sqrt(2)
    soft[1::2] = -np.imag(cells) * np.sqrt(2)
    return soft        # positive = bit 1


_QAM16_LVL = np.array([3, 1, -1, -3]) / np.sqrt(10)
# gray: bits (b0,b1) -> level index
_GRAY = {(0, 0): 0, (0, 1): 1, (1, 1): 2, (1, 0): 3}
_GRAY_INV = {v: k for k, v in _GRAY.items()}


def qam16_map(bits: np.ndarray) -> np.ndarray:
    b = bits.reshape(-1, 4).astype(np.int64)
    re = np.array([_QAM16_LVL[_GRAY[(int(x[0]), int(x[1]))]] for x in b])
    im = np.array([_QAM16_LVL[_GRAY[(int(x[2]), int(x[3]))]] for x in b])
    return re + 1j * im


def qam16_soft(cells: np.ndarray) -> np.ndarray:
    """Per-bit LLR-ish soft values (positive = 1), gray 16-QAM."""
    s = np.sqrt(10)
    re, im = np.real(cells) * s, np.imag(cells) * s

    def axis_soft(v):
        # levels: 3,1 -> b=0 ; -1,-3 -> b=1 ; inner bit: |v|<2 -> 1
        b_hi = -v                      # sign bit
        b_lo = 2.0 - np.abs(v)         # inner bit
        return b_hi, b_lo

    r_hi, r_lo = axis_soft(re)
    i_hi, i_lo = axis_soft(im)
    soft = np.zeros(4 * len(cells))
    soft[0::4], soft[1::4] = r_hi, r_lo
    soft[2::4], soft[3::4] = i_hi, i_lo
    return soft


def crc8(data_bits: np.ndarray) -> int:
    """DRM CRC-8 (ETSI ES 201 980 annex D): poly x^8+x^4+x^3+x^2+1,
    init all-ones, output inverted, MSB first (verified equivalent to
    Dream's `util/CRC.cpp` shift-register form)."""
    reg = 0xFF
    for b in data_bits:
        fb = ((reg >> 7) & 1) ^ int(b)
        reg = ((reg << 1) & 0xFF) ^ (0x1D if fb else 0)
    return reg ^ 0xFF


def interleave(x: np.ndarray, rows: int = 6) -> np.ndarray:
    n = (len(x) // rows) * rows
    head = x[:n].reshape(rows, -1).T.reshape(-1)
    return np.concatenate([head, x[n:]])


def deinterleave(x: np.ndarray, rows: int = 6) -> np.ndarray:
    n = (len(x) // rows) * rows
    head = x[:n].reshape(-1, rows).T.reshape(-1)
    return np.concatenate([head, x[n:]])


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


# FAC channel coding: 72 bits + 6 tail -> 156 coded bits, punctured
# 6->5 to the 130 bits carried by the 65 QPSK FAC cells
_FAC_KEEP = np.array([i % 6 != 5 for i in range(156)])
NUM_FAC_CELLS = drm_tables.NUM_FAC_CELLS


def fac_encode(bits72: np.ndarray) -> np.ndarray:
    coded = conv_encode_k7(np.concatenate(
        [np.asarray(bits72, np.uint8), np.zeros(6, np.uint8)]))
    return coded[_FAC_KEEP]


def fac_soft_decode(soft130: np.ndarray) -> dict | None:
    """130 soft coded bits (positive = 1) -> FAC dict or None."""
    full = np.zeros(156)
    full[_FAC_KEEP] = soft130             # punctured slots = erasures
    bits = viterbi_decode_k7(full, tail=True)
    return fac_unpack(bits[:72])


# ---------------------------------------------------------------------------
# Transmitter (loopback source / sig-gen)
# ---------------------------------------------------------------------------

class DrmTx:
    def __init__(self, service_id: int = 0xA1B2C3, label_idx: int = 7):
        self.service_id = service_id
        self.label_idx = label_idx

    def _coded(self, bits: np.ndarray) -> np.ndarray:
        return conv_encode_k7(
            np.concatenate([bits, np.zeros(6, np.uint8)]))

    def superframe(self, sdc_payload: bytes,
                   msc_payload: bytes) -> np.ndarray:
        """One 3-frame superframe of passband audio (no silence pad)."""
        sdc_bits = self._framed_bytes(sdc_payload)
        msc_bits = self._framed_bytes(msc_payload)
        # tile-to-fit FIRST, interleave LAST — the receiver
        # deinterleaves the full cell stream
        sdc_cells = qpsk_map(interleave(self._fit(
            self._coded(sdc_bits), self._count_cells(True) * 2)))
        msc_cells = qam16_map(interleave(self._fit(
            self._coded(msc_bits), self._count_cells(False) * 4)))
        si, mi = 0, 0
        out = []
        for f in range(FRAMES_PER_SUPER):
            fac_cells = qpsk_map(interleave(fac_encode(
                fac_pack(self.service_id, self.label_idx,
                         frame_idx=f)[:72])))
            fi = 0
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

    @staticmethod
    def _count_cells(sdc: bool) -> int:
        tot = 0
        for f in range(FRAMES_PER_SUPER):
            for sym in range(SYMS_PER_FRAME):
                tot += len(data_cells(sym, f, want_sdc=sdc))
        return tot


# ---------------------------------------------------------------------------
# Receiver
# ---------------------------------------------------------------------------

class DrmRx:
    """Streaming DRM receiver: 12 kHz real audio in; FAC dicts and
    SDC/MSC payloads out."""

    def __init__(self):
        self._audio = np.zeros(0, np.complex64)
        self._n0 = 0
        self.fac: dict | None = None
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
        soft = deinterleave(qpsk_soft(np.asarray(cells)))
        return fac_soft_decode(soft)

    def _demod_super(self, bb, start, cfo):
        sdc_cells, msc_cells, facs = [], [], []
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
                    msc_cells.append(spec[k % TU] / hmap[int(k)])
        out = [("drm_fac", facs[0])]
        sdc = self._decode_stream(qpsk_soft(np.asarray(sdc_cells)))
        if sdc is not None:
            out.append(("drm_sdc", sdc))
        msc = self._decode_stream(qam16_soft(np.asarray(msc_cells)))
        if msc is not None:
            out.append(("drm_msc", msc))
        return out

    @staticmethod
    def _decode_stream(soft: np.ndarray) -> bytes | None:
        soft = deinterleave(soft)
        n = len(soft) - (len(soft) % 2)
        bits = viterbi_decode_k7(soft[:n], tail=False)
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
