"""End-to-end server test: WS client tunes a channel and hears a tone.

This is the build plan's "minimum end-to-end slice" gate (SURVEY.md
section 7 step 3): synthetic ADC stream -> DDC -> demod -> WebSocket
out, driven through the KiwiSDR wire protocol.
"""

import asyncio
import struct

import numpy as np
import pytest

aiohttp = pytest.importorskip("aiohttp")

from flydog_sdr_gps_tpu.models import rx_channel as rx
from flydog_sdr_gps_tpu.ops import adpcm
from flydog_sdr_gps_tpu.runtime import StreamEngine, SyntheticSource
from flydog_sdr_gps_tpu.server import KiwiServer, packets

PORT = 18073


def make_server():
    params = rx.RxParams(num_channels=2, audio_block=128)
    src = SyntheticSource(tones=((14.201e6, 0.5),), noise_rms=0.001)
    eng = StreamEngine(params, src)
    return KiwiServer(eng, port=PORT, realtime=False)


async def ws_connect(session, stream):
    return await session.ws_connect(
        f"http://127.0.0.1:{PORT}/1234567890/{stream}")


async def scenario():
    server = make_server()
    runner = await server.start()
    try:
        async with aiohttp.ClientSession() as session:
            # --- REST /status ---
            async with session.get(
                    f"http://127.0.0.1:{PORT}/status") as r:
                text = await r.text()
                assert "users_max=2" in text
                assert "status=active" in text

            # --- SND stream ---
            ws = await ws_connect(session, "SND")
            await ws.send_str("SET auth t=kiwi p=")
            await ws.send_str("SET ident_user=pytest")
            await ws.send_str(
                "SET mod=usb low_cut=300 high_cut=2700 freq=14200.00")
            await ws.send_str("SET compression=1")

            msgs = {}
            audio = []
            smeters = []
            seqs = []
            dec = adpcm.AdpcmState()
            for _ in range(80):
                m = await asyncio.wait_for(ws.receive(), timeout=30)
                if m.type != aiohttp.WSMsgType.BINARY:
                    continue
                data = m.data
                tag = data[:3]
                if tag == b"MSG":
                    for tok in data[4:].decode().split():
                        if "=" in tok:
                            k, v = tok.split("=", 1)
                            msgs[k] = v
                elif tag == b"SND":
                    flags = data[3]
                    (seq,) = struct.unpack("<I", data[4:8])
                    (sm,) = struct.unpack(">H", data[8:10])
                    seqs.append(seq)
                    smeters.append(sm / 10.0 - 127.0)
                    assert flags & packets.SND_FLAG_COMPRESSED
                    audio.append(adpcm.decode(
                        np.frombuffer(data[10:], np.uint8), dec))
                    if len(audio) >= 24:
                        break
            await ws.close()

            assert msgs.get("badp") == "0"
            assert "audio_rate" in msgs and int(msgs["audio_rate"]) == 12000
            assert seqs == list(range(len(seqs)))
            a = np.concatenate(audio).astype(np.float64) / 32768.0
            a = a[1024:]                     # group delay + AGC settle
            spec = np.abs(np.fft.rfft(a * np.hanning(len(a))))
            f = np.fft.rfftfreq(len(a), 1 / 12000.77)
            peak = f[np.argmax(spec)]
            assert abs(peak - 1000.0) < 40, peak
            assert max(smeters) > -40        # strong tone registers

            # --- W/F stream ---
            ws2 = await ws_connect(session, "W/F")
            await ws2.send_str("SET auth t=kiwi p=")
            await ws2.send_str("SET zoom=4 start=1000000")
            rows = []
            for _ in range(40):
                m = await asyncio.wait_for(ws2.receive(), timeout=30)
                if m.type != aiohttp.WSMsgType.BINARY:
                    continue
                if m.data[:4] == b"W/F ":
                    x_bin, fz, seq = struct.unpack("<III", m.data[4:16])
                    assert fz & 0xFFFF == 4
                    if fz & packets.WF_FLAGS_COMPRESSION:
                        st = adpcm.AdpcmState()
                        row = adpcm.decode_u8(
                            np.frombuffer(m.data[16:], np.uint8),
                            st)[packets.ADPCM_PAD:]
                    else:
                        row = np.frombuffer(m.data[16:], np.uint8)
                    assert len(row) == 1024
                    rows.append(row)
                    if len(rows) >= 3:
                        break
            await ws2.close()
            assert len(rows) >= 1

            # --- EXT stream: attach the S_meter extension ---
            ws3 = await ws_connect(session, "EXT")
            await ws3.send_str("SET auth t=kiwi p=")
            await ws3.send_str("SET ext_switch_to_client=S_meter "
                               "first_time=1")
            got_ready = got_data = False
            for _ in range(30):
                m = await asyncio.wait_for(ws3.receive(), timeout=30)
                if m.type != aiohttp.WSMsgType.BINARY:
                    continue
                if m.data.startswith(b"EXT ready"):
                    got_ready = True
                if m.data.startswith(b"EXT smeter "):
                    (dbm,) = struct.unpack("<f", m.data[11:15])
                    assert -180.0 < dbm < 10.0
                    got_data = True
                    break
            await ws3.close()
            assert got_ready and got_data

            # --- /users shows the (now disconnected) channels freed ---
            async with session.get(
                    f"http://127.0.0.1:{PORT}/users") as r:
                users = await r.json()
            assert isinstance(users, list)
    finally:
        await server.stop()
        await runner.cleanup()


def test_end_to_end_ws_audio_and_waterfall():
    asyncio.run(scenario())


# ---------------------------------------------------------------- web UI

async def webui_scenario():
    """Drive the server exactly as the embedded web UI's JS does
    (`server/webui.py`): ADPCM-compressed SND (the reference's
    primary wire format, `rx/rx_sound.cpp:1121-1139`), compressed W/F
    rows at zoom>0, UI tuning formula."""
    server = make_server()
    runner = await server.start()
    try:
        async with aiohttp.ClientSession() as session:
            # the UI page itself
            async with session.get(
                    f"http://127.0.0.1:{PORT}/") as resp:
                page = await resp.text()
            assert "audio_btn" in page and "W/F" in page
            assert "AUDIO_RATE = 12000" in page
            assert "UI_SRATE = 30000000" in page
            # GPS sky map panel + URL tuning params (?f=7040usbz8)
            assert 'id="sky"' in page and "drawSky" in page
            assert "URLSearchParams" in page

            # /gps REST behind the sky map (enabled:false without a
            # receiver attached)
            async with session.get(
                    f"http://127.0.0.1:{PORT}/gps") as resp:
                gst = await resp.json()
            assert gst["enabled"] is False

            snd = await ws_connect(session, "SND")
            await snd.send_str("SET auth t=kiwi p=")
            await snd.send_str("SET compression=1")
            # scene tone at 14.201 MHz; tune 800 Hz below -> 800 Hz
            await snd.send_str(
                "SET mod=usb low_cut=300 high_cut=2700 freq=14200.200")

            wf = await ws_connect(session, "W/F")
            await wf.send_str("SET auth t=kiwi p=")
            # UI formula: start = (cf - span/2) / (ui_srate / (1024<<14))
            zoom = 5
            span = 30e6 / 2 ** zoom
            cf = max(span / 2, min(14.201e6, 30e6 - span / 2))
            start = (cf - span / 2) / (30e6 / (1024 << 14))
            await wf.send_str(f"SET zoom={zoom} start={start:.0f}")

            pcm = []
            need_pkts = 30
            row = None
            async def pump(ws, handler):
                while True:
                    m = await asyncio.wait_for(ws.receive(), timeout=60)
                    if m.type != aiohttp.WSMsgType.BINARY:
                        continue
                    if handler(m.data):
                        return
            snd_st = adpcm.AdpcmState()
            def on_snd(data):
                if not data.startswith(b"SND"):
                    return False
                flags = data[3]
                assert flags & packets.SND_FLAG_COMPRESSED
                pcm.append(adpcm.decode(
                    np.frombuffer(data[10:], np.uint8), snd_st))
                return len(pcm) >= need_pkts
            def on_wf(data):
                nonlocal row
                if not data.startswith(b"W/F "):
                    return False
                zoom_flags = struct.unpack("<I", data[8:12])[0]
                # zoom>0 rows ride ADPCM with a fresh codec state and
                # a 10-byte pad (`rx_waterfall.cpp:1625-1628`)
                assert zoom_flags & packets.WF_FLAGS_COMPRESSION
                dec = adpcm.decode_u8(
                    np.frombuffer(data[16:], np.uint8),
                    adpcm.AdpcmState())
                row = dec[packets.ADPCM_PAD:packets.ADPCM_PAD + 1024]
                return True
            await asyncio.gather(pump(snd, on_snd), pump(wf, on_wf))

            audio = np.concatenate(pcm).astype(np.float64) / 32768.0
            audio = audio[len(audio) // 2:]          # skip AGC attack
            w = np.abs(np.fft.rfft(audio * np.hanning(len(audio))))
            f = np.argmax(w) * 12000.0 / len(audio)
            # USB at 14.201 MHz hears the 14.2018 tone at ~800 Hz
            assert abs(f - 800.0) < 40, f
            # WF row: peak near the center pixel (cf = signal freq)
            pk = int(np.argmax(row))
            assert abs(pk - 512) < 24, pk
            assert row.max() > np.median(row) + 30
    finally:
        await server.stop()
        await runner.cleanup()


def test_webui_protocol():
    asyncio.get_event_loop_policy().new_event_loop().run_until_complete(
        webui_scenario())


async def wf_audio_fallback_scenario():
    """wf_enabled=False (rx14.wf0 analogue): W/F stream serves
    audio-FFT rows instead of wideband waterfall."""
    params = rx.RxParams(num_channels=2, audio_block=128)
    src = SyntheticSource(tones=((14.201e6, 0.5),), noise_rms=0.001)
    eng = StreamEngine(params, src)
    server = KiwiServer(eng, port=PORT + 1, realtime=False,
                        wf_enabled=False)
    runner = await server.start()
    try:
        async with aiohttp.ClientSession() as session:
            snd = await session.ws_connect(
                f"http://127.0.0.1:{PORT + 1}/777/SND")
            await snd.send_str("SET auth t=kiwi p=")
            await snd.send_str(
                "SET mod=usb low_cut=300 high_cut=2700 freq=14200.2")
            wf = await session.ws_connect(
                f"http://127.0.0.1:{PORT + 1}/777/W/F")
            await wf.send_str("SET auth t=kiwi p=")
            rows = []
            for _ in range(200):
                m = await asyncio.wait_for(wf.receive(), timeout=60)
                if m.type != aiohttp.WSMsgType.BINARY:
                    continue
                if m.data[:4] == b"W/F ":
                    rows.append(np.frombuffer(m.data[16:16 + 1024],
                                              np.uint8))
                    if len(rows) >= 3:
                        break
            assert len(rows) >= 3
            row = rows[-1].astype(float)
            # 800 Hz demod tone -> bin ~ 800/(6000/1024) = 137
            pk = int(np.argmax(row))
            assert abs(pk - 137) < 10, pk
    finally:
        await server.stop()
        await runner.cleanup()


def test_wf_audio_fallback():
    asyncio.get_event_loop_policy().new_event_loop().run_until_complete(
        wf_audio_fallback_scenario())


async def iq_mode_scenario():
    """IQ mode end-to-end: the SND packet grows the GPS-timestamp
    header and carries interleaved s16 IQ (regression: the batched
    fetch indices once broke only when need_iq was True)."""
    server = make_server()
    runner = await server.start()
    try:
        async with aiohttp.ClientSession() as session:
            ws = await ws_connect(session, "SND")
            await ws.send_str("SET auth t=kiwi p=")
            await ws.send_str(
                "SET mod=iq low_cut=-5000 high_cut=5000 freq=14200.00")
            pkts = []
            for _ in range(60):
                m = await asyncio.wait_for(ws.receive(), timeout=30)
                if m.type != aiohttp.WSMsgType.BINARY:
                    continue
                if m.data[:3] == b"SND":
                    pkts.append(m.data)
                    if len(pkts) >= 8:
                        break
            assert len(pkts) >= 8
            flags = pkts[-1][3]
            assert flags & packets.SND_FLAG_MODE_IQ
            # IQ header: flags u8, seq u32, smeter u16, gps hdr 10 B
            payload = pkts[-1][20:]
            iq = np.frombuffer(payload, ">i2").astype(np.float64)
            assert len(iq) % 2 == 0 and len(iq) > 0
            zre, zim = iq[0::2], iq[1::2]
            # the 14.201 MHz tone at a 14.200 MHz IQ center: a rotating
            # phasor at ~1 kHz -> both rails carry energy
            assert zre.std() > 50 and zim.std() > 50
            z = zre + 1j * zim
            w = np.abs(np.fft.fft(z * np.hanning(len(z))))
            f = np.fft.fftfreq(len(z), 1 / 12000.0)
            peak = f[np.argmax(w)]
            assert abs(peak - 1000.0) < 60, peak
    finally:
        await server.stop()
        await runner.cleanup()


def test_iq_mode_snd_stream():
    asyncio.get_event_loop_policy().new_event_loop().run_until_complete(
        iq_mode_scenario())


async def ext_panel_scenario():
    """UI extension panel path: switch an extension on over the SND
    socket and receive EXT frames on it."""
    server = make_server()
    runner = await server.start()
    try:
        async with aiohttp.ClientSession() as session:
            async with session.get(f"http://127.0.0.1:{PORT}/") as r:
                page = await r.text()
            assert '"S_meter"' in page      # ext list embedded in UI
            ws = await ws_connect(session, "SND")
            await ws.send_str("SET auth t=kiwi p=")
            await ws.send_str(
                "SET mod=usb low_cut=300 high_cut=2700 freq=14200.00")
            await ws.send_str("SET ext_switch_to_client=S_meter")
            got_ready, got_meter = False, False
            for _ in range(80):
                m = await asyncio.wait_for(ws.receive(), timeout=30)
                if m.type != aiohttp.WSMsgType.BINARY:
                    continue
                if m.data.startswith(b"EXT ready"):
                    got_ready = True
                elif m.data.startswith(b"EXT smeter "):
                    dbm = struct.unpack("<f", m.data[11:15])[0]
                    assert -130.0 < dbm < 10.0
                    got_meter = True
                    break
            assert got_ready and got_meter
    finally:
        await server.stop()
        await runner.cleanup()


def test_extension_panel_over_snd():
    asyncio.get_event_loop_policy().new_event_loop().run_until_complete(
        ext_panel_scenario())


def test_ajax_endpoints_ver_smeter_adc_dx():
    """The remaining AJAX surface (`rx/rx_server_ajax.cpp:68-88`):
    /VER, /s-meter, /adc, /dx."""
    async def run():
        server = make_server()
        from flydog_sdr_gps_tpu.utils.dx import DxLabel
        server.dx.upsert(DxLabel(14100.0, "usb", "AJAXLBL", ""))
        runner = await server.start()
        try:
            async with aiohttp.ClientSession() as s:
                base = f"http://127.0.0.1:{PORT}"
                ver = await (await s.get(base + "/VER")).json()
                assert set(ver) == {"maj", "min"}

                ws = await ws_connect(s, "SND")
                await ws.send_str("SET auth t=kiwi p=")
                await ws.send_str("SET mod=usb low_cut=300 "
                                  "high_cut=2700 freq=14200.0")
                for _ in range(80):
                    m = await asyncio.wait_for(ws.receive(),
                                               timeout=30)
                    if m.type == aiohttp.WSMsgType.BINARY and \
                            m.data[:3] == b"SND":
                        break
                sm = await (await s.get(base + "/s-meter")).json()
                assert sm and sm[0]["freq"] == 14200.0
                assert sm[0]["dbm"] is None or sm[0]["dbm"] < 0

                adc = await (await s.get(base + "/adc")).json()
                assert adc["blocks"] >= 1 and "adc_ov" in adc

                dx = await (await s.get(
                    base + "/dx?min=14000&max=14200")).json()
                assert any(r[2] == "AJAXLBL" for r in dx["dx"])
                await ws.close()
        finally:
            await server.stop()
            await runner.cleanup()
    asyncio.run(asyncio.wait_for(run(), timeout=120))
