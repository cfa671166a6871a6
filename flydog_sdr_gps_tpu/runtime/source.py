"""ADC sample sources.

The reference ingests 125 Msps from the FPGA over SPI DMA
(`rx/data_pump.cpp`).  A TPU has no ADC; the source layer abstracts
where wideband samples come from:

- :class:`SyntheticSource` — host-side scene (tones/noise) for tests.
- :class:`FileSource` — raw int16 or float32 capture replay, looped.
- :class:`DeviceSceneSource` — the production-bench path: the scene is
  generated ON DEVICE by a jitted program (the host tunnel cannot
  sustain 500 MB/s; see SURVEY.md section 7 "125 Msps ingest").

All sources deliver float32 blocks, full scale +-1.0, and sanitize
non-finite values (a NaN would otherwise permanently poison streaming
filter state — the reference's analogous guard is the data-pump
overrun reset, `rx/data_pump.cpp:245-269`).
"""

from __future__ import annotations

import numpy as np

from ..numerology import ADC_CLOCK_NOM


class SampleSource:
    """Produces consecutive float32 ADC blocks; tracks a 48-bit sample
    counter (the reference's ``ticks_A`` timebase, `verilog/kiwi.v`)."""

    def __init__(self, adc_clock: float = ADC_CLOCK_NOM):
        self.adc_clock = adc_clock
        self.ticks = 0                 # 48-bit sample counter

    def next_block(self, n: int) -> np.ndarray:
        x = self._produce(n)
        if not np.all(np.isfinite(x)):
            x = np.nan_to_num(x, nan=0.0, posinf=1.0, neginf=-1.0)
        self.ticks = (self.ticks + n) % (1 << 48)
        return x

    def _produce(self, n: int) -> np.ndarray:
        raise NotImplementedError


class SyntheticSource(SampleSource):
    """Tones + noise scene, host-generated (tests / small setups)."""

    def __init__(self, tones=(), noise_rms: float = 0.0,
                 adc_clock: float = ADC_CLOCK_NOM, seed: int = 0):
        super().__init__(adc_clock)
        self.tones = list(tones)       # (freq_hz, amplitude) or
                                       # (freq_hz, amplitude, mod_fn)
        self.noise_rms = noise_rms
        self._rng = np.random.default_rng(seed)

    def _produce(self, n: int) -> np.ndarray:
        t = (self.ticks + np.arange(n, dtype=np.float64)) / self.adc_clock
        x = np.zeros(n, np.float64)
        for tone in self.tones:
            f, a = tone[0], tone[1]
            carrier = np.cos(2 * np.pi * ((f * t) % 1.0))
            if len(tone) > 2 and tone[2] is not None:
                carrier = carrier * tone[2](t)
            x += a * carrier
        if self.noise_rms:
            x += self.noise_rms * self._rng.standard_normal(n)
        return x.astype(np.float32)


class FileSource(SampleSource):
    """Replay a raw capture (int16 native-endian or float32), looped.

    The reference's GPS equivalent is GPS_SAMPLES_FROM_FILE
    (`gps/search.cpp:361-379`); this generalizes it to the wideband
    path.
    """

    def __init__(self, path: str, dtype: str = "int16",
                 adc_clock: float = ADC_CLOCK_NOM, loop: bool = True):
        super().__init__(adc_clock)
        self._data = np.fromfile(path, dtype=np.dtype(dtype))
        if dtype == "int16":
            self._data = (self._data.astype(np.float32) / 32768.0)
        else:
            self._data = self._data.astype(np.float32)
        if len(self._data) == 0:
            raise ValueError(f"empty capture {path}")
        self._pos = 0
        self.loop = loop

    def _produce(self, n: int) -> np.ndarray:
        out = np.zeros(n, np.float32)
        got = 0
        while got < n:
            take = min(n - got, len(self._data) - self._pos)
            if take <= 0:
                if not self.loop:
                    break
                self._pos = 0
                continue
            out[got:got + take] = self._data[self._pos:self._pos + take]
            self._pos += take
            got += take
        return out


class DeviceSceneSource:
    """Device-resident scene generator (production/bench ingest).

    ``make_block(ticks48) -> jax.Array`` runs jitted on device; the
    host only passes the 48-bit block start tick (as limbs), so no
    sample data ever crosses the host-device link.

    Tones are ``(freq_hz, amplitude)`` carriers,
    ``(freq_hz, amplitude, ("am", mod_freq_hz, depth))`` AM broadcast
    signals, or ``(freq_hz, amplitude, ("fsk", baud_audio_frac,
    tone_spacing_hz, symbols, cycle_syms))`` M-FSK transmissions (the
    modulating sinusoid / symbol clock are exact-integer NCOs so the
    scene stays phase-continuous forever — no float time variable that
    loses precision as ticks grow).

    FSK semantics (for decoder soak scenes, e.g. WSPR —
    ``baud_audio_frac`` = audio samples per symbol at the 12 kHz
    channel rate, 8192 for WSPR): the transmission repeats every
    ``cycle_syms`` symbol periods; symbols beyond ``len(symbols)``
    are idle (carrier off), so a WSPR cycle of 162 tx + N idle
    symbols mimics the even-minute transmission cadence.  Tone n sits
    at ``freq_hz + (symbols[n] - (M-1)/2) * tone_spacing_hz``.
    Symbol boundaries land mid-block at their exact sample (at most
    one per block: one symbol period is >= 85M ADC ticks, far longer
    than any block).
    """

    def __init__(self, tones=(), noise_rms: float = 0.0,
                 adc_clock: float = ADC_CLOCK_NOM,
                 block: int = 512 * 10416):
        import jax
        import jax.numpy as jnp
        from ..ops import nco
        from ..numerology import RX_DECIM_12K

        self.adc_clock = adc_clock
        self.block = block
        self.ticks = 0
        # per-tone phase carries kept as exact HOST integers: no
        # device round trips per block (the axon tunnel costs ~50 ms
        # per fetch, so the source must be fetch-free)
        self._nco = nco
        self._fcw_ints = []     # carrier fcw, then each AM mod fcw
        amps = []
        mods = []               # per tone: None or (mod_index, depth)
        self._fsk = []          # FSK transmitter states
        for tone in tones:
            f, a = tone[0], tone[1]
            if len(tone) > 2 and tone[2] is not None and \
                    tone[2][0] == "fsk":
                _kind, baud_frac, df, syms, cycle_syms = tone[2]
                m = int(max(syms)) + 1
                sym_ticks = int(baud_frac) * RX_DECIM_12K
                self._fsk.append(dict(
                    f0=f, amp=float(a), df=float(df),
                    syms=[int(s) for s in syms], m=m,
                    cycle=int(cycle_syms), sym_ticks=sym_ticks,
                    fcws=[nco.freq_to_fcw(
                        f + (s - (m - 1) / 2.0) * df, adc_clock)
                        for s in range(m)],
                    phi=0))
                continue
            self._fcw_ints.append(nco.freq_to_fcw(f, adc_clock))
            amps.append(a)
            mods.append(None)
        ci = 0
        for ti, tone in enumerate(tones):
            if len(tone) > 2 and tone[2] is not None and \
                    tone[2][0] == "fsk":
                continue
            if len(tone) > 2 and tone[2] is not None:
                kind, mf, depth = tone[2]
                assert kind == "am"
                mods[ci] = (len(self._fcw_ints), float(depth))
                self._fcw_ints.append(nco.freq_to_fcw(mf, adc_clock))
            ci += 1
        fcws = [nco.to_limbs([w])[0] for w in self._fcw_ints]
        n_fsk = len(self._fsk)
        self._noise = noise_rms
        self._phi_ints = [0 for _ in self._fcw_ints]
        self._key = 0

        def make(phis, key, fsk_args):
            x = jnp.zeros((block,), jnp.float32)
            two_pi = jnp.float32(2 * np.pi)
            for i, amp in enumerate(amps):
                ph = nco.phase_ramp_long(phis[i], fcws[i], block)
                carrier = jnp.cos(two_pi * ph)
                if mods[i] is not None:
                    mi, depth = mods[i]
                    mph = nco.phase_ramp_long(phis[mi], fcws[mi], block)
                    carrier = carrier * (1.0 + jnp.float32(depth)
                                         * jnp.sin(two_pi * mph))
                x = x + jnp.float32(amp) * carrier
            # FSK tones: two phase ramps (before/after the symbol
            # boundary at sample ``brk``) selected per sample — the
            # boundary phase carry keeps the waveform continuous
            for j in range(n_fsk):
                (phi0, phi_brk, fcw_a, fcw_b, brk, amp_a,
                 amp_b) = fsk_args[j]
                ramp_a = nco.phase_ramp_long(phi0, fcw_a, block)
                ramp_b = nco.phase_ramp_long(phi_brk, fcw_b, block)
                n_idx = jnp.arange(block)
                off = jnp.clip(n_idx - brk, 0, block - 1)
                ph = jnp.where(n_idx < brk, ramp_a,
                               jnp.take(ramp_b, off))
                ampv = jnp.where(n_idx < brk, amp_a, amp_b)
                x = x + ampv * jnp.cos(two_pi * ph)
            if noise_rms:
                k = jax.random.PRNGKey(key)
                x = x + noise_rms * jax.random.normal(k, (block,))
            return x

        self._make = jax.jit(make)

    def _fsk_block_args(self, st: dict) -> tuple:
        """Host-side FSK symbol clock for one block: boundary sample,
        before/after tone words and amplitudes, exact phase carries."""
        nco = self._nco
        t0 = self.ticks
        sym_ticks, cycle = st["sym_ticks"], st["cycle"]
        n_tx = len(st["syms"])

        def sym_of(tick):
            s = (tick // sym_ticks) % cycle
            return st["syms"][s] if s < n_tx else None
        s_a = sym_of(t0)
        b = ((t0 // sym_ticks) + 1) * sym_ticks    # next boundary
        brk = b - t0 if b - t0 < self.block else self.block
        s_b = sym_of(b) if brk < self.block else s_a
        fcw_a = st["fcws"][s_a if s_a is not None else 0]
        fcw_b = st["fcws"][s_b if s_b is not None else 0]
        phi0 = st["phi"]
        phi_brk = (phi0 + fcw_a * brk) % (1 << 48)
        st["phi"] = (phi_brk + fcw_b * (self.block - brk)) % (1 << 48)
        import jax.numpy as jnp
        return (jnp.asarray(nco.to_limbs([phi0])[0]),
                jnp.asarray(nco.to_limbs([phi_brk])[0]),
                jnp.asarray(nco.to_limbs([fcw_a])[0]),
                jnp.asarray(nco.to_limbs([fcw_b])[0]),
                jnp.int32(brk),
                jnp.float32(st["amp"] if s_a is not None else 0.0),
                jnp.float32(st["amp"] if s_b is not None else 0.0))

    def fsk_cycle_pos_s(self, idx: int = 0) -> tuple[float, float]:
        """(seconds into the FSK cycle, cycle length in seconds) at
        the CURRENT tick — lets a decoder align its capture to the
        transmission cadence (the reference aligns WSPR/FT8 captures
        to even UTC minutes; stream time is this framework's
        timebase)."""
        st = self._fsk[idx]
        cyc = st["sym_ticks"] * st["cycle"]
        return (self.ticks % cyc) / self.adc_clock, cyc / self.adc_clock

    def next_block(self, n: int | None = None):
        import jax.numpy as jnp  # noqa: F401
        assert n is None or n == self.block
        phis = [jnp.asarray(self._nco.to_limbs([p])[0])
                for p in self._phi_ints]
        fsk_args = tuple(self._fsk_block_args(st) for st in self._fsk)
        x = self._make(phis, self._key, fsk_args)
        self._key += 1
        for i, fcw in enumerate(self._fcw_ints):
            self._phi_ints[i] = (self._phi_ints[i]
                                 + fcw * self.block) % (1 << 48)
        self.ticks = (self.ticks + self.block) % (1 << 48)
        return x



class Int24FileSource(SampleSource):
    """Replay a packed signed-24-bit little-endian capture — the
    FPGA's native RXO wire format (`RXO_BITS=24`, converted s24->float
    in `rx/data_pump.cpp:145-208`).  Uses the native converter
    (`runtime/native/datapump.c`) when built, numpy otherwise."""

    def __init__(self, path: str, scale: float = 2.0 ** -23,
                 iq_swap: bool = False,
                 adc_clock: float = ADC_CLOCK_NOM, loop: bool = True):
        super().__init__(adc_clock)
        raw = np.fromfile(path, dtype=np.uint8)
        n = (len(raw) // 3) * 3
        if n == 0:
            raise ValueError(f"empty capture {path}")
        from . import native
        if native.s24_to_f32 is not None:
            self._data = native.s24_to_f32(raw[:n], scale, iq_swap)
        else:  # pragma: no cover
            b = raw[:n].reshape(-1, 3).astype(np.int32)
            v = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
            v = (v << 8) >> 8
            self._data = (v * scale).astype(np.float32)
            if iq_swap:
                d = self._data.reshape(-1, 2)
                self._data = d[:, ::-1].reshape(-1)
        self._pos = 0
        self.loop = loop

    _produce = FileSource._produce


class ThreadedSource(SampleSource):
    """Decouple ingest from dispatch: a producer thread pulls blocks
    from ``inner`` into a native SPSC ring; ``next_block`` pops.

    This is the data-pump split of the reference (SPI helper process +
    `data_pump` task, `platform/common/spi_dev.cpp:168`,
    `rx/data_pump.cpp:292`): production never blocks on the consumer,
    overruns drop the oldest block and are counted.
    """

    def __init__(self, inner: SampleSource, block: int,
                 nblocks: int = 32):
        super().__init__(inner.adc_clock)
        from . import native
        if native.NativeRing is None:  # pragma: no cover
            raise RuntimeError("native ring unavailable (no compiler)")
        import threading
        self.inner = inner
        self.block = block
        self.ring = native.NativeRing(block, nblocks)
        self._target_fill = max(nblocks * 3 // 4, 1)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self) -> None:
        while not self._stop.is_set():
            if self.ring.fill >= self._target_fill:
                self._stop.wait(0.002)
                continue
            self.ring.push(self.inner.next_block(self.block))

    def _produce(self, n: int) -> np.ndarray:
        assert n == self.block
        while True:
            x = self.ring.pop()
            if x is not None:
                return x
            import time
            time.sleep(0.001)

    @property
    def overruns(self) -> int:
        return self.ring.overruns

    def close(self) -> None:
        self._stop.set()
        self._thread.join(timeout=2)
