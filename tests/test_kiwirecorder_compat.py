"""kiwirecorder-style client conformance.

The most widely used external client of the reference is
kiwiclient/kiwirecorder: it connects to `/{ts}/SND`, performs the
documented SET volley, and expects the MSG parameter volley
(audio_init / audio_rate / sample_rate) before s16 audio packets.
This test speaks that exact sequence — including SETs this server
implements as tolerated no-ops (AR OK, gen, genattn, lms_autonotch)
— and verifies a recorder would capture coherent audio.
"""

import asyncio
import struct

import numpy as np
import pytest

aiohttp = pytest.importorskip("aiohttp")

from flydog_sdr_gps_tpu.models import rx_channel as rx
from flydog_sdr_gps_tpu.runtime import StreamEngine, SyntheticSource
from flydog_sdr_gps_tpu.server import KiwiServer

PORT = 18079


async def scenario():
    params = rx.RxParams(num_channels=2, audio_block=128)
    src = SyntheticSource(tones=((14.0716e6, 0.5),), noise_rms=0.001)
    eng = StreamEngine(params, src)
    server = KiwiServer(eng, port=PORT, realtime=False,
                        wf_enabled=False)
    runner = await server.start()
    try:
        async with aiohttp.ClientSession() as s:
            ws = await s.ws_connect(
                f"http://127.0.0.1:{PORT}/kiwirec/SND")
            # the kiwirecorder SET volley, in its order
            await ws.send_str("SET auth t=kiwi p=")
            msgs = {}
            # collect the MSG parameter volley it requires
            for _ in range(40):
                m = await asyncio.wait_for(ws.receive(), timeout=30)
                if m.type != aiohttp.WSMsgType.BINARY:
                    continue
                if m.data[:3] == b"MSG":
                    for tok in m.data[4:].decode().split():
                        if "=" in tok:
                            k, v = tok.split("=", 1)
                            msgs[k] = v
                    if "sample_rate" in msgs:
                        break
            assert msgs.get("audio_init") == "0"
            assert msgs.get("audio_rate") == "12000"
            assert abs(float(msgs["sample_rate"]) - 12000.0) < 1.0
            await ws.send_str("SET AR OK in=12000 out=44100")
            await ws.send_str("SET squelch=0 max=0")
            await ws.send_str("SET lms_autonotch=0")
            await ws.send_str("SET genattn=0")
            await ws.send_str("SET gen=0 mix=-1")
            await ws.send_str("SET mod=usb low_cut=300 high_cut=2700 "
                              "freq=14070.000")
            await ws.send_str("SET agc=1 hang=0 thresh=-100 slope=6 "
                              "decay=1000 manGain=50")
            await ws.send_str("SET compression=0")
            await ws.send_str("SET ident_user=kiwirecorder.py")
            await ws.send_str("SET keepalive")

            pcm = []
            seqs = []
            while len(pcm) < 24:
                m = await asyncio.wait_for(ws.receive(), timeout=60)
                if m.type != aiohttp.WSMsgType.BINARY or \
                        m.data[:3] != b"SND":
                    continue
                flags = m.data[3]
                assert not (flags & 0x10)          # compression off
                (seq,) = struct.unpack("<I", m.data[4:8])
                seqs.append(seq)
                pcm.append(np.frombuffer(m.data[10:], ">i2"))
            # contiguous sequence numbers (recorder gap detection)
            assert all(b - a == 1 for a, b in zip(seqs, seqs[1:]))
            audio = np.concatenate(pcm).astype(np.float64) / 32768
            audio = audio[len(audio) // 2:]
            w = np.abs(np.fft.rfft(audio * np.hanning(len(audio))))
            f_peak = np.argmax(w) * 12000 / len(audio)
            # 14.0716 MHz carrier at 14.070 USB dial -> 1600 Hz tone
            assert abs(f_peak - 1600.0) < 40.0, f_peak
            await ws.close()
    finally:
        await server.stop()
        await runner.cleanup()


def test_kiwirecorder_set_volley_and_audio():
    asyncio.run(asyncio.wait_for(scenario(), timeout=180))
