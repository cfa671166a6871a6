"""ShardedStreamEngine: the production multi-chip engine must behave
exactly like the single-device StreamEngine — same audio, same control
plane (SET retunes, clock-discipline retune_all), same checkpointing —
while running the shard_map step over a (time, chan) mesh.
"""

import numpy as np
import pytest

from flydog_sdr_gps_tpu import parallel
from flydog_sdr_gps_tpu.models import rx_channel as rx
from flydog_sdr_gps_tpu.ops import demod
from flydog_sdr_gps_tpu.runtime import (ShardedStreamEngine,
                                        StreamEngine, SyntheticSource)


def _mk_source():
    return SyntheticSource(tones=((7.100e6, 0.3), (14.2018e6, 0.2)),
                           noise_rms=1e-3, seed=11)


def _params():
    return rx.RxParams(num_channels=8, audio_block=128)


def test_sharded_engine_matches_single_device():
    params = _params()
    eng_a = StreamEngine(params, _mk_source())
    mesh = parallel.make_mesh(time=2, chan=4)
    eng_b = ShardedStreamEngine(_params(), _mk_source(), mesh=mesh)

    for eng in (eng_a, eng_b):
        eng.set_channel(0, freq_hz=7.100e6, mode=demod.MODE_AM)
        eng.set_channel(1, freq_hz=14.2e6, mode=demod.MODE_USB)

    for i in range(3):
        taps_a = eng_a.run_block()
        taps_b = eng_b.run_block()
    a = np.asarray(taps_a.audio)
    b = np.asarray(taps_b.audio)
    np.testing.assert_allclose(b, a, atol=3e-3)
    np.testing.assert_allclose(np.asarray(taps_b.smeter_dbm),
                               np.asarray(taps_a.smeter_dbm), atol=0.2)

    # control plane mid-stream: retune one channel on both engines
    for eng in (eng_a, eng_b):
        eng.set_channel(1, freq_hz=14.1e6, mode=demod.MODE_LSB,
                        passband=(-2700.0, -300.0))
    for i in range(2):
        taps_a = eng_a.run_block()
        taps_b = eng_b.run_block()
    np.testing.assert_allclose(np.asarray(taps_b.audio),
                               np.asarray(taps_a.audio), atol=3e-3)

    # clock-discipline feedback path (GPS retunes every NCO)
    for eng in (eng_a, eng_b):
        eng.retune_all(params.adc_clock * (1 + 0.4e-6))
    taps_a = eng_a.run_block()
    taps_b = eng_b.run_block()
    np.testing.assert_allclose(np.asarray(taps_b.audio),
                               np.asarray(taps_a.audio), atol=3e-3)


def test_sharded_engine_checkpoint_roundtrip(tmp_path):
    mesh = parallel.make_mesh(time=1, chan=8)
    eng = ShardedStreamEngine(_params(), _mk_source(), mesh=mesh)
    eng.set_channel(2, freq_hz=14.2e6, mode=demod.MODE_USB)
    for _ in range(2):
        eng.run_block()
    p = str(tmp_path / "snap.pkl")
    eng.save_state(p)

    eng2 = ShardedStreamEngine(_params(), _mk_source(), mesh=mesh)
    eng2.load_state(p)
    assert eng2.seq == eng.seq
    assert eng2.ctl[2].freq_hz == pytest.approx(14.2e6)
    taps = eng2.run_block()
    assert np.isfinite(np.asarray(taps.audio)).all()


def test_server_over_mesh_serves_matching_audio():
    """The "run_server --mesh" gate: a live WS client hears the same
    tone through the sharded engine as through the single-device one."""
    import asyncio
    import struct
    aiohttp = pytest.importorskip("aiohttp")
    from flydog_sdr_gps_tpu.server import KiwiServer

    PORT = 18082

    async def stream_audio(engine):
        server = KiwiServer(engine, port=PORT, realtime=False)
        runner = await server.start()
        try:
            async with aiohttp.ClientSession() as session:
                ws = await session.ws_connect(
                    f"http://127.0.0.1:{PORT}/42/SND")
                await ws.send_str("SET auth t=kiwi p=")
                await ws.send_str("SET compression=0")
                await ws.send_str("SET mod=usb low_cut=300 "
                                  "high_cut=2700 freq=14200.00")
                audio = []
                while len(audio) < 20:
                    m = await asyncio.wait_for(ws.receive(), 30)
                    if m.type != aiohttp.WSMsgType.BINARY or \
                            m.data[:3] != b"SND":
                        continue
                    pcm = np.frombuffer(m.data[10:], ">i2")
                    audio.append(pcm.astype(np.float64) / 32768.0)
                await ws.close()
                return np.concatenate(audio)
        finally:
            await server.stop()
            await runner.cleanup()

    mesh = parallel.make_mesh(time=2, chan=4)
    a_single = asyncio.run(stream_audio(
        StreamEngine(_params(), _mk_source())))
    a_mesh = asyncio.run(stream_audio(
        ShardedStreamEngine(_params(), _mk_source(), mesh=mesh)))

    def tone_freq(a):
        a = a[1024:]
        spec = np.abs(np.fft.rfft(a * np.hanning(len(a))))
        return np.fft.rfftfreq(len(a), 1 / 12000.0)[np.argmax(spec)]

    # both hear the 14.2018 MHz tone at ~1.8 kHz audio
    assert abs(tone_freq(a_single) - 1800.0) < 40
    assert abs(tone_freq(a_mesh) - 1800.0) < 40
    # same seeded source => same waveform up to a capture-start offset
    # (which block the WS client lands on — and where the AGC attack
    # falls in its capture — is timing-dependent; sample-exact engine
    # equivalence is proven in test_sharded_engine_matches_single_device).
    # Align by cross-correlation and require the settled tails to be
    # the same waveform.
    s, m = a_single, a_mesh
    L = min(len(s), len(m)) // 3
    d = int(np.argmax(np.correlate(m[:3 * L], s[L:2 * L], "valid"))) - L
    i0, i1 = max(0, -d), min(len(s), len(m) - d)
    assert i1 - i0 > L, f"no overlap after alignment (d={d})"
    k0 = i0 + (i1 - i0) // 2
    ma, sa = m[k0 + d:i1 + d], s[k0:i1]
    rho = float(np.dot(ma, sa) /
                (np.linalg.norm(ma) * np.linalg.norm(sa) + 1e-12))
    assert rho > 0.98, f"aligned tail correlation {rho:.4f}"


def test_scaling_report_runs():
    mesh = parallel.make_mesh(time=2, chan=2,
                              devices=__import__("jax").devices()[:4])
    eng = ShardedStreamEngine(_params(), _mk_source(), mesh=mesh)
    rep = eng.scaling_report(iters=2)
    assert rep["devices"] == 4 and rep["step_seconds"] > 0
