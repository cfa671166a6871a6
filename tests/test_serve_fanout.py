"""Serving fan-out fast path: one encode per (format, channel, endian)
group, batched native ADPCM, off-path bucket compiles, and the
fetch-stall recovery ladder.

Reference behaviors under test:
- one ADPCM encode per channel shared by listeners and campers
  (`rx/rx_sound.cpp:1121-1139`, `c2s_sound_camp`);
- a new listener must not stall live streams on a compile (the
  reference has no compiles; its analogue is that channel setup work
  happens on the new conn's task only);
- wedged-runtime escalation: data-pump reset then kiwi_restart()
  (`rx/data_pump.cpp:245-269`, `main.cpp:90-101`).
"""

import asyncio
import struct
import time

import numpy as np
import pytest

aiohttp = pytest.importorskip("aiohttp")

from flydog_sdr_gps_tpu.models import rx_channel as rx
from flydog_sdr_gps_tpu.ops import adpcm
from flydog_sdr_gps_tpu.runtime import StreamEngine, SyntheticSource
from flydog_sdr_gps_tpu.server import KiwiServer, packets

PORT = 18078


def test_encode_batch_parity():
    """Batched native encode == per-stream reference encode."""
    rng = np.random.default_rng(7)
    k, n = 5, 256
    samples = (rng.normal(0, 8000, (k, n))).astype(np.int16)
    states = np.zeros((k, 2), np.int32)
    out = adpcm.encode_batch(samples, states)
    for i in range(k):
        st = adpcm.AdpcmState()
        ref = adpcm._encode_py(samples[i], st)
        np.testing.assert_array_equal(out[i], ref)
        assert (int(states[i, 0]), int(states[i, 1])) == \
            (st.predictor, st.index)
    # stream continuity: a second batch call continues each stream
    samples2 = (rng.normal(0, 8000, (k, n))).astype(np.int16)
    out2 = adpcm.encode_batch(samples2, states)
    st = adpcm.AdpcmState()
    adpcm._encode_py(samples[0], st)
    ref2 = adpcm._encode_py(samples2[0], st)
    np.testing.assert_array_equal(out2[0], ref2)


def _bare_server(port=PORT, **kw):
    params = rx.RxParams(num_channels=4, audio_block=128)
    src = SyntheticSource(tones=((14.201e6, 0.5),), noise_rms=0.001)
    eng = StreamEngine(params, src)
    return KiwiServer(eng, port=port, realtime=False, **kw)


def test_encode_payloads_groups():
    """_encode_payloads: adpcm payload continues the per-channel
    stream; s16/iq/stereo groups match the packets helpers.  Tap
    arrays are (bucket, block) channel-row-major (the packed fused
    fetch layout)."""
    server = _bare_server()
    n = 128
    rng = np.random.default_rng(3)
    audio = rng.normal(0, 0.1, (2, n)).astype(np.float32)
    audio2 = rng.normal(0, 0.1, (2, n)).astype(np.float32)
    iq_re = rng.normal(0, 0.1, (2, n)).astype(np.float32)
    iq_im = rng.normal(0, 0.1, (2, n)).astype(np.float32)
    chmap = {0: 0, 3: 1}
    keys = {("adpcm", 0, False), ("adpcm", 3, False),
            ("s16", 0, True), ("iq", 3, False), ("stereo", 0, False)}
    p1 = server._encode_payloads(audio, audio2, iq_re, iq_im, chmap,
                                 keys)
    assert set(p1) == keys
    # adpcm payload decodes back to the channel's s16 audio
    dec = adpcm.AdpcmState()
    got = adpcm.decode(np.frombuffer(p1[("adpcm", 0, False)],
                                     np.uint8), dec)
    want = np.clip(audio[0] * 32767.0, -32768, 32767
                   ).astype(np.int16)
    # ADPCM is lossy; verify it tracks (correlation), exact equality
    # is with the reference encoder:
    st = adpcm.AdpcmState()
    exact = adpcm.encode(want, st).tobytes()
    assert p1[("adpcm", 0, False)] == exact
    # white noise is ADPCM's worst case; the byte-exact check above
    # is the real assertion, the correlation is a sanity bound
    assert np.corrcoef(got, want)[0, 1] > 0.8
    # second block continues the shared per-channel codec state
    p2 = server._encode_payloads(audio, audio2, iq_re, iq_im, chmap,
                                 {("adpcm", 0, False)})
    exact2 = adpcm.encode(want, st).tobytes()
    assert p2[("adpcm", 0, False)] == exact2
    # uncompressed groups match the framing helpers byte-for-byte
    assert p1[("s16", 0, True)] == packets.audio_payload_s16(
        audio[0], True)
    assert p1[("iq", 3, False)] == packets.iq_payload_s16(
        iq_re[1], iq_im[1], False)
    assert p1[("stereo", 0, False)] == packets.iq_payload_s16(
        audio[0], audio2[0], False)


async def _snd_client(session, port, ts, freq, out):
    ws = await session.ws_connect(
        f"http://127.0.0.1:{port}/{ts}/SND")
    await ws.send_str("SET auth t=kiwi p=")
    await ws.send_str(f"SET mod=usb low_cut=300 high_cut=2700 "
                      f"freq={freq}")
    await ws.send_str("SET compression=1")
    out["ws"] = ws
    dec = adpcm.AdpcmState()
    while True:
        m = await ws.receive()
        if m.type != aiohttp.WSMsgType.BINARY:
            if m.type in (aiohttp.WSMsgType.CLOSE,
                          aiohttp.WSMsgType.CLOSED,
                          aiohttp.WSMsgType.ERROR):
                return
            continue
        if m.data[:3] == b"SND":
            out.setdefault("t_first", time.monotonic())
            out["pkts"] = out.get("pkts", 0) + 1
            out.setdefault("stamps", []).append(time.monotonic())
            out.setdefault("audio", []).append(adpcm.decode(
                np.frombuffer(m.data[10:], np.uint8), dec))


def test_offpath_bucket_compile():
    """Client #2 (bucket growth) must not stall client #1's stream:
    the grown bucket compiles in the background while the loop keeps
    serving the warm bucket."""
    async def scenario():
        server = _bare_server(port=PORT + 1)
        eng = server.engine
        real_prewarm = eng.prewarm_gather
        delay = 0.8

        def slow_prewarm(bucket):
            time.sleep(delay)           # simulated remote compile
            real_prewarm(bucket)

        eng.prewarm_gather = slow_prewarm
        runner = await server.start()
        try:
            async with aiohttp.ClientSession() as session:
                s1, s2 = {}, {}
                t1 = asyncio.create_task(
                    _snd_client(session, PORT + 1, "c1", 14200.0, s1))
                # wait until client 1 streams steadily (bucket 1 warm)
                t0 = time.monotonic()
                while s1.get("pkts", 0) < 5:
                    await asyncio.sleep(0.02)
                    assert time.monotonic() - t0 < 30
                assert 1 in server._warm_buckets
                t_join = time.monotonic()
                t2 = asyncio.create_task(
                    _snd_client(session, PORT + 1, "c2", 14201.0, s2))
                # client 2's first packet requires the off-path
                # bucket-2 compile to finish
                while s2.get("pkts", 0) < 1:
                    await asyncio.sleep(0.02)
                    assert time.monotonic() - t_join < 30
                assert s2["t_first"] - t_join >= delay * 0.5
                # client 1 kept streaming THROUGH the compile window:
                # packets arrived during (t_join, t_join + delay)
                during = [t for t in s1["stamps"]
                          if t_join < t < t_join + delay]
                assert len(during) >= 2, \
                    "stream 1 stalled during the off-path compile"
                assert 2 in server._warm_buckets
                t1.cancel()
                t2.cancel()
        finally:
            await server.stop()
            await runner.cleanup()

    asyncio.run(scenario())


def test_watchdog_escalation():
    """A wedged device fetch escalates: streaming-state reset, then
    client kick + restart request (not an eternal warning loop)."""
    async def scenario():
        server = _bare_server(port=PORT + 2)
        server.stall_warn_s = 0.1
        server.stall_reset_blocks = 2
        server.stall_restart_blocks = 3

        def wedged_get(_fetch):
            time.sleep(60)

        server._device_get = wedged_get
        runner = await server.start()
        try:
            t0 = time.monotonic()
            while not server.restart_requested:
                await asyncio.sleep(0.05)
                assert time.monotonic() - t0 < 20, \
                    "watchdog never escalated to restart"
            # the reset step of the ladder fired too
            t0 = time.monotonic()
            while server.engine.resets < 1:
                await asyncio.sleep(0.05)
                assert time.monotonic() - t0 < 10
        finally:
            await server.stop()
            await runner.cleanup()

    asyncio.run(scenario())


def test_campers_share_payload():
    """A MON camper receives the same shared-channel stream without
    claiming a channel of its own."""
    async def scenario():
        server = _bare_server(port=PORT + 3)
        runner = await server.start()
        try:
            async with aiohttp.ClientSession() as session:
                s1 = {}
                t1 = asyncio.create_task(
                    _snd_client(session, PORT + 3, "own", 14200.0, s1))
                while s1.get("pkts", 0) < 3:
                    await asyncio.sleep(0.02)
                ws = await session.ws_connect(
                    f"http://127.0.0.1:{PORT + 3}/camp/MON")
                await ws.send_str("SET auth t=kiwi p=")
                await ws.send_str("SET compression=1")
                camp_pkts = 0
                t0 = time.monotonic()
                while camp_pkts < 3 and time.monotonic() - t0 < 20:
                    m = await ws.receive(timeout=10)
                    if m.type == aiohttp.WSMsgType.BINARY and \
                            m.data[:3] == b"SND":
                        camp_pkts += 1
                assert camp_pkts >= 3
                # camper shares the owner's channel (no extra claim)
                chans = {c.rx_chan for c in server.conns.values()
                         if c.rx_chan is not None}
                assert len(chans) == 1
                t1.cancel()
                await ws.close()
        finally:
            await server.stop()
            await runner.cleanup()

    asyncio.run(scenario())


def test_camp_retarget():
    """MON camper picks its target channel with 'SET camp=<ch>'
    (rx/rx_monitor.cpp c2s_mon target selection)."""
    async def scenario():
        server = _bare_server(port=PORT + 4)
        runner = await server.start()
        try:
            async with aiohttp.ClientSession() as session:
                s1, s2 = {}, {}
                t1 = asyncio.create_task(
                    _snd_client(session, PORT + 4, "o1", 14200.0, s1))
                t2 = asyncio.create_task(
                    _snd_client(session, PORT + 4, "o2", 14201.0, s2))
                while s1.get("pkts", 0) < 2 or s2.get("pkts", 0) < 2:
                    await asyncio.sleep(0.02)
                ws = await session.ws_connect(
                    f"http://127.0.0.1:{PORT + 4}/c/MON")
                await ws.send_str("SET auth t=kiwi p=")
                await ws.send_str("SET camp=1")
                saw_ack = False
                t0 = time.monotonic()
                while time.monotonic() - t0 < 15:
                    m = await ws.receive(timeout=10)
                    if m.type != aiohttp.WSMsgType.BINARY:
                        continue
                    if m.data.startswith(b"MSG") and \
                            b"camp=1" in m.data:
                        saw_ack = True
                    if saw_ack and m.data[:3] == b"SND":
                        break
                assert saw_ack
                camper = server.conns.get("c")
                assert camper is not None and camper.rx_chan == 1 \
                    and camper.camping
                # retarget to an unoccupied channel is refused
                await ws.send_str("SET camp=3")
                t0 = time.monotonic()
                refused = False
                while time.monotonic() - t0 < 10:
                    m = await ws.receive(timeout=5)
                    if m.type == aiohttp.WSMsgType.BINARY and \
                            m.data.startswith(b"MSG") and \
                            b"camp=-1" in m.data:
                        refused = True
                        break
                assert refused and camper.rx_chan == 1
                t1.cancel()
                t2.cancel()
                await ws.close()
        finally:
            await server.stop()
            await runner.cleanup()

    asyncio.run(scenario())
