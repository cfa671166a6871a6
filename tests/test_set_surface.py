"""The full 36-command common SET surface (`rx/rx_cmd.h:23-27`,
`rx/rx_cmd.cpp`).

Covers the commands added beyond the tune/audio core: OPTIONS,
BROWSER, GEO_JSON, WF_COMP, NEED_STATUS, GET_CONFIG, STATS_UPD,
GET_USERS, GET_DX_SIZE, DX_FILTER (applied to MARKER replies),
NOCACHE, DEVL, IS_ADMIN, GET_AUTHKEY, CLK_ADJ, KICK_ADMINS,
NOTIFY_MSG, SERVER DE CLIENT.
"""

import asyncio
import json

import numpy as np
import pytest

aiohttp = pytest.importorskip("aiohttp")

from flydog_sdr_gps_tpu.models import rx_channel as rx
from flydog_sdr_gps_tpu.runtime import StreamEngine, SyntheticSource
from flydog_sdr_gps_tpu.server import KiwiServer
from flydog_sdr_gps_tpu.utils import dx as dx_mod

PORT = 18087


def make_server(**kw):
    params = rx.RxParams(num_channels=2, audio_block=128)
    src = SyntheticSource(tones=((14.201e6, 0.5),), noise_rms=0.001)
    eng = StreamEngine(params, src)
    srv = KiwiServer(eng, port=PORT, realtime=False)
    for k, v in kw.items():
        setattr(srv, k, v)
    return srv


async def ws_connect(session, stream, ts="111"):
    return await session.ws_connect(
        f"http://127.0.0.1:{PORT}/{ts}/{stream}")


async def wait_msg(ws, key: bytes, tries=30):
    """Receive until a 'MSG <key>=' frame arrives; return its value."""
    for _ in range(tries):
        m = await asyncio.wait_for(ws.receive(), 5)
        if m.type != aiohttp.WSMsgType.BINARY:
            continue
        if m.data.startswith(b"MSG ") and key + b"=" in m.data:
            body = m.data[4:].decode()
            for tok in body.split(" ", 1):
                pass
            k, _, v = body.partition("=")
            if k.encode() == key:
                return v
    return None


def test_info_and_debug_commands():
    async def scenario():
        server = make_server()
        server.dx.upsert(dx_mod.DxLabel(7038.6, "usb", "WSPR", "beacon"))
        server.dx.upsert(dx_mod.DxLabel(14070.0, "usb", "PSK31", "digi"))
        runner = await server.start()
        try:
            async with aiohttp.ClientSession() as session:
                ws = await ws_connect(session, "SND")
                await ws.send_str("SERVER DE CLIENT test SND")
                await ws.send_str("SET auth t=kiwi p=")
                await ws.send_str("SET options=1")
                await ws.send_str("SET browser=Mozilla%2F5.0")
                await ws.send_str("SET geojson=%7B%22x%22%3A1%7D")
                # nocache/devl.* mutate server-global state: ignored
                # from a plain user connection (ADVICE r2: the
                # reference keeps them below the auth barrier)
                await ws.send_str("SET nocache=1")
                await ws.send_str("SET devl.p0=9.9")
                await asyncio.sleep(0.1)
                assert server.web_nocache is False
                assert "p0" not in server.devl
                await ws.send_str("SET dbug_v=1,2")
                await ws.send_str("SET OVERRIDE inactivity_timeout=0")

                # GET_CONFIG -> MSG config_cb={...}
                await ws.send_str("SET GET_CONFIG")
                cfg = await wait_msg(ws, b"config_cb")
                assert cfg is not None
                d = json.loads(cfg)
                assert d["r"] == 2 and d["g"] == 12

                # STATS_UPD -> MSG stats_cb={...}
                await ws.send_str("SET STATS_UPD ch=0")
                st = json.loads(await wait_msg(ws, b"stats_cb"))
                assert st["ac"] >= 1 and "ut" in st

                # GET_USERS (non-admin: no IPs)
                await ws.send_str("SET ident_user=tester")
                await ws.send_str("SET GET_USERS")
                users = json.loads(await wait_msg(ws, b"user_cb"))
                assert users and users[0]["n"] == "tester"
                assert "a" not in users[0]

                # need_status -> owner status line
                await ws.send_str("SET need_status=1")
                assert await wait_msg(ws, b"status_msg_html")

                # GET_DX_SIZE
                await ws.send_str("SET GET_DX_SIZE")
                assert int(await wait_msg(ws, b"dx_size")) == 2

                # is_admin: plain user -> 0
                await ws.send_str("SET is_admin")
                assert (await wait_msg(ws, b"is_admin")) == "0"

                # local peer with no admin password configured may
                # become admin ("SET auth t=admin", is_local rule);
                # nocache/devl.* then take effect
                await ws.send_str("SET auth t=admin p=")
                await ws.send_str("SET is_admin")
                assert (await wait_msg(ws, b"is_admin")) == "1"
                await ws.send_str("SET nocache=1")
                await ws.send_str("SET devl.p0=1.5")

                await asyncio.sleep(0.1)
                conn = list(server.conns.values())[0]
                assert conn.options == 1
                assert conn.browser == "Mozilla/5.0"
                assert conn.geojson == '{"x":1}'
                assert server.web_nocache is True
                assert server.devl.get("p0") == 1.5
        finally:
            await server.stop()
            await runner.cleanup()
    asyncio.run(scenario())


def test_dx_filter_applies_to_marker():
    async def scenario():
        server = make_server()
        server.dx.upsert(dx_mod.DxLabel(7038.6, "usb", "WSPR", "beacon"))
        server.dx.upsert(dx_mod.DxLabel(14070.0, "usb", "PSK31", "digi"))
        server.dx.upsert(dx_mod.DxLabel(14074.0, "usb", "FT8", "digi"))
        runner = await server.start()
        try:
            async with aiohttp.ClientSession() as session:
                ws = await ws_connect(session, "W/F")
                await ws.send_str("SET auth t=kiwi p=")
                await ws.send_str("SET DX_FILTER i=psk n= c=0 w=0 g=0")
                await ws.send_str(
                    "SET MARKER db=0 min=7000.0 max=15000.0 zoom=4 "
                    "width=1024")
                mkr = json.loads(await wait_msg(ws, b"mkr"))
                idents = [r.get("i") for r in mkr[1:]]
                assert idents == ["PSK31"]
                # notes filter, then clear
                await ws.send_str("SET DX_FILTER i= n=digi c=0 w=0 g=0")
                await ws.send_str(
                    "SET MARKER db=0 min=7000.0 max=15000.0 zoom=4 "
                    "width=1024")
                mkr = json.loads(await wait_msg(ws, b"mkr"))
                assert [r.get("i") for r in mkr[1:]] == ["PSK31", "FT8"]
                await ws.send_str("SET DX_FILTER i= n= c=0 w=0 g=0")
                await ws.send_str(
                    "SET MARKER db=0 min=7000.0 max=15000.0 zoom=4 "
                    "width=1024")
                mkr = json.loads(await wait_msg(ws, b"mkr"))
                assert len(mkr) - 1 == 3
        finally:
            await server.stop()
            await runner.cleanup()
    asyncio.run(scenario())


def test_admin_commands_on_stream():
    async def scenario():
        server = make_server()
        runner = await server.start()
        try:
            async with aiohttp.ClientSession() as session:
                ws = await ws_connect(session, "SND")
                await ws.send_str("SET auth t=admin p=")
                await ws.send_str("SET is_admin")
                assert (await wait_msg(ws, b"is_admin")) == "1"

                # admin sees IPs in GET_USERS
                await ws.send_str("SET GET_USERS")
                users = json.loads(await wait_msg(ws, b"user_cb"))
                assert users and "a" in users[0]

                # get_authkey
                await ws.send_str("SET get_authkey")
                key = await wait_msg(ws, b"authkey_cb")
                # utils/security.py:generate_authkey -> token_hex(32) = 64 hex
                # chars (reference: rx/rx_cmd.cpp:2149-2160 uses its own size).
                assert key and len(key) == 64 and server.authkey == key

                # clk_adj within the ppm window retunes the NCOs
                eng = server.engine
                before = np.asarray(eng.tuning.dphi1).copy()
                await ws.send_str("SET clk_adj=1000")
                await asyncio.sleep(0.3)
                after = np.asarray(eng.tuning.dphi1)
                assert not np.array_equal(before, after)
                # out-of-window adjust is refused
                await ws.send_str("SET clk_adj=99999999")
                await asyncio.sleep(0.2)
                assert np.array_equal(after,
                                      np.asarray(eng.tuning.dphi1))
        finally:
            await server.stop()
            await runner.cleanup()
    asyncio.run(scenario())


def test_kick_admins_closes_admin_stream():
    async def scenario():
        server = make_server()
        runner = await server.start()
        try:
            async with aiohttp.ClientSession() as session:
                admin = await session.ws_connect(
                    f"http://127.0.0.1:{PORT}/111/ADMIN")
                await admin.send_str("SET auth p=")
                await asyncio.wait_for(admin.receive(), 5)
                assert len(server.admin_wss) == 1

                ws = await ws_connect(session, "SND", ts="222")
                await ws.send_str("SET auth t=kiwi p=")
                await ws.send_str("SET kick_admins")

                async def admin_closed():
                    async for _ in admin:
                        pass
                await asyncio.wait_for(admin_closed(), 5)
                assert len(server.admin_wss) == 0
        finally:
            await server.stop()
            await runner.cleanup()
    asyncio.run(scenario())


def test_wf_comp_disables_waterfall_adpcm():
    async def scenario():
        server = make_server()
        runner = await server.start()
        try:
            async with aiohttp.ClientSession() as session:
                ws = await ws_connect(session, "W/F")
                await ws.send_str("SET auth t=kiwi p=")
                await ws.send_str("SET zoom=4 start=1000000")
                await ws.send_str("SET wf_comp=0")
                await asyncio.sleep(0.1)
                conn = list(server.conns.values())[0]
                assert conn.wf_comp is False
                # uncompressed rows are exactly 1024 bins
                for _ in range(40):
                    m = await asyncio.wait_for(ws.receive(), 30)
                    if m.type == aiohttp.WSMsgType.BINARY and \
                            m.data.startswith(b"W/F "):
                        assert len(m.data) > 1024
                        break
        finally:
            await server.stop()
            await runner.cleanup()
    asyncio.run(scenario())


def test_dx_filter_match_modes():
    lab = dx_mod.DxLabel(7038.6, "usb", "WSPR beacon", "10 mW")
    assert dx_mod.filter_match(lab, "wspr", "")
    assert not dx_mod.filter_match(lab, "wspr", "", case=True)
    assert dx_mod.filter_match(lab, "WSPR*", "", wild=True)
    assert dx_mod.filter_match(lab, "", r"\d+ mW", grep=True)
    assert not dx_mod.filter_match(lab, "", r"^\d+ W$", grep=True)
    assert dx_mod.filter_match(lab, "", "")


def test_transverter_freq_offset():
    """cfg freq_offset: clients tune DISPLAY frequency; the DDC mixes
    at display - offset (`rx/rx_util.cpp` freq_offset_kHz), /status
    reports the offset, and out-of-span tunes are refused."""
    async def run():
        from flydog_sdr_gps_tpu.utils import Config
        params = rx.RxParams(num_channels=2, audio_block=128)
        src = SyntheticSource(tones=((14.201e6, 0.5),),
                              noise_rms=0.001)
        cfg = Config()
        cfg.set("freq_offset", 116000.0)      # 2 m transverter (kHz)
        server = KiwiServer(StreamEngine(params, src), cfg=cfg,
                            port=PORT + 8, realtime=False)
        runner = await server.start()
        try:
            async with aiohttp.ClientSession() as s:
                txt = await (await s.get(
                    f"http://127.0.0.1:{PORT + 8}/status")).text()
                assert "freq_offset=116000.0" in txt
                ws = await s.ws_connect(
                    f"http://127.0.0.1:{PORT + 8}/off/SND")
                await ws.send_str("SET auth t=kiwi p=")
                await asyncio.sleep(0.3)
                ch = server.conns["off"].rx_chan
                # display 130.2018 MHz -> hardware 14.2018 MHz
                await ws.send_str("SET mod=usb low_cut=300 "
                                  "high_cut=2700 freq=130201.8")
                await asyncio.sleep(0.4)
                assert abs(server.engine.ctl[ch].freq_hz
                           - 14.2018e6) < 1.0
                # a display tune whose hardware freq is negative is
                # refused (channel keeps its tuning)
                await ws.send_str("SET mod=usb low_cut=300 "
                                  "high_cut=2700 freq=100000.0")
                await asyncio.sleep(0.4)
                assert abs(server.engine.ctl[ch].freq_hz
                           - 14.2018e6) < 1.0
                await ws.close()
        finally:
            await server.stop()
            await runner.cleanup()
    asyncio.run(asyncio.wait_for(run(), timeout=120))
