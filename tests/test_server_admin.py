"""Admin stream, MON camping, blacklist, /snr endpoint."""

import asyncio
import json

import numpy as np
import pytest

aiohttp = pytest.importorskip("aiohttp")

from flydog_sdr_gps_tpu.models import rx_channel as rx
from flydog_sdr_gps_tpu.runtime import StreamEngine, SyntheticSource
from flydog_sdr_gps_tpu.server import KiwiServer
from flydog_sdr_gps_tpu.utils import Config

PORT = 18074


async def scenario():
    params = rx.RxParams(num_channels=2, audio_block=128)
    src = SyntheticSource(tones=((14.201e6, 0.5),), noise_rms=0.001)
    eng = StreamEngine(params, src)
    cfg = Config()
    server = KiwiServer(eng, cfg=cfg, port=PORT, realtime=False)
    runner = await server.start()
    try:
        async with aiohttp.ClientSession() as s:
            # --- ADMIN stream: config get/set/save + log + stats ---
            ws = await s.ws_connect(f"http://127.0.0.1:{PORT}/1/ADMIN")
            await ws.send_str("SET auth t=admin p=")
            m = await ws.receive()
            assert b"badp=0" in m.data
            await ws.send_str("SET get_config")
            m = await ws.receive()
            assert m.data.startswith(b"CFG ")
            doc = json.loads(m.data[4:])
            assert doc["rx_name"] == "flydog_sdr_gps_tpu"
            await ws.send_str("SET set_config key=rx_name value=newname")
            m = await ws.receive()
            assert b"cfg_seq=" in m.data
            assert cfg.string("rx_name") == "newname"
            await ws.send_str("SET stats")
            m = await ws.receive()
            assert b"blocks=" in m.data
            await ws.send_str("SET log n=5")
            m = await ws.receive()
            assert m.data.startswith(b"LOG ")
            await ws.send_str("SET blacklist_add cidr=10.1.2.0/24")
            m = await ws.receive()
            assert b"blacklist_len=1" in m.data
            await ws.close()

            assert server.ip_blocked("10.1.2.99")
            assert not server.ip_blocked("10.1.3.1")

            # --- MON camping: SND conn first, then MON shares it ---
            ws_snd = await s.ws_connect(f"http://127.0.0.1:{PORT}/2/SND")
            await ws_snd.send_str("SET auth t=kiwi p=")
            ws_mon = await s.ws_connect(f"http://127.0.0.1:{PORT}/3/MON")
            await ws_mon.send_str("SET auth t=kiwi p=")
            got_mon_snd = False
            for _ in range(40):
                m = await asyncio.wait_for(ws_mon.receive(), timeout=30)
                if m.type != aiohttp.WSMsgType.BINARY:
                    continue
                if m.data[:3] == b"SND":
                    got_mon_snd = True
                    break
            assert got_mon_snd
            # camper shares channel 0 with the SND conn
            mon_conn = server.conns["3"]
            snd_conn = server.conns["2"]
            assert mon_conn.rx_chan == snd_conn.rx_chan
            await ws_mon.close()
            await asyncio.sleep(0.1)
            # owner's channel still in use after camper leaves
            assert eng.ctl[snd_conn.rx_chan].in_use
            await ws_snd.close()

            # --- /snr ---
            server.snr_measure(np.random.default_rng(0)
                               .normal(-100, 5, 1024))
            async with s.get(f"http://127.0.0.1:{PORT}/snr") as r:
                hist = await r.json()
            assert len(hist) == 1 and "snr" in hist[0]
    finally:
        await server.stop()
        await runner.cleanup()


def test_admin_mon_blacklist_snr():
    asyncio.run(scenario())


def test_admin_page_and_auth_gate():
    async def run():
        import aiohttp
        from test_server import make_server, PORT
        server = make_server()
        runner = await server.start()
        try:
            async with aiohttp.ClientSession() as session:
                async with session.get(
                        f"http://127.0.0.1:{PORT}/admin") as r:
                    page = await r.text()
                assert "ADMIN" in page and "get_config" in page
                # commands BEFORE auth are refused
                ws = await session.ws_connect(
                    f"http://127.0.0.1:{PORT}/99/ADMIN")
                await ws.send_str("SET stats")
                m = await asyncio.wait_for(ws.receive(), timeout=10)
                assert b"badp=1" in m.data
                await ws.send_str("SET auth p=")
                m = await asyncio.wait_for(ws.receive(), timeout=10)
                assert b"badp=0" in m.data
                await ws.send_str("SET stats")
                m = await asyncio.wait_for(ws.receive(), timeout=10)
                assert b"blocks=" in m.data
        finally:
            await server.stop()
            await runner.cleanup()
    asyncio.get_event_loop_policy().new_event_loop().run_until_complete(
        run())


async def restart_scenario():
    """Admin 'SET restart' kicks users, sets restart_requested, and
    releases wait_restart() (the run_server.py driver re-execs);
    'SET kick_all' force-drops every connection."""
    params = rx.RxParams(num_channels=2, audio_block=128)
    src = SyntheticSource(tones=((14.201e6, 0.5),), noise_rms=0.001)
    eng = StreamEngine(params, src)
    server = KiwiServer(eng, cfg=Config(), port=PORT + 3,
                        realtime=False)
    runner = await server.start()
    try:
        async with aiohttp.ClientSession() as s:
            url = f"http://127.0.0.1:{PORT + 3}"
            ws_snd = await s.ws_connect(f"{url}/21/SND")
            await ws_snd.send_str("SET auth t=kiwi p=")
            await asyncio.sleep(0.2)
            assert "21" in server.conns

            adm = await s.ws_connect(f"{url}/22/ADMIN")
            await adm.send_str("SET auth t=admin p=")
            m = await adm.receive()
            assert b"badp=0" in m.data

            # kick_all drops the SND user but keeps serving
            await adm.send_str("SET kick_all")
            m = await adm.receive()
            assert b"kicked=1" in m.data
            await asyncio.sleep(0.2)
            assert "21" not in server.conns

            # restart: wait_restart() must unblock
            waiter = asyncio.create_task(server.wait_restart())
            await adm.send_str("SET restart")
            m = await adm.receive()
            assert b"restarting=1" in m.data
            await asyncio.wait_for(waiter, timeout=5)
            assert server.restart_requested
            await adm.close()
    finally:
        await server.stop()
        await runner.cleanup()


def test_admin_restart_and_kick_all():
    asyncio.run(restart_scenario())


def test_hashed_admin_password_and_hmac_token():
    """Admin auth against a $p5$ hashed stored password, then a live
    HMAC token signed with the authkey (support/security.cpp +
    CMD_GET_AUTHKEY semantics)."""
    async def run():
        import aiohttp
        from flydog_sdr_gps_tpu.utils import security
        params = rx.RxParams(num_channels=2, audio_block=128)
        src = SyntheticSource(tones=((14.201e6, 0.5),), noise_rms=0.001)
        eng = StreamEngine(params, src)
        cfg = Config()
        cfg.set("admin_password", security.hash_password("s3cret",
                                                         iters=1000))
        server = KiwiServer(eng, cfg=cfg, port=PORT + 7,
                            realtime=False)
        runner = await server.start()
        try:
            async with aiohttp.ClientSession() as s:
                url = f"http://127.0.0.1:{PORT + 7}"
                adm = await s.ws_connect(f"{url}/31/ADMIN")
                await adm.send_str("SET auth p=wrong")
                m = await adm.receive()
                assert b"badp=1" in m.data
                await adm.send_str("SET auth p=s3cret")
                m = await adm.receive()
                assert b"badp=0" in m.data
                await adm.close()

                # SND-side admin auth with an HMAC token: fetch the
                # authkey via an authed SND admin, then use a token
                snd = await s.ws_connect(f"{url}/32/SND")
                await snd.send_str("SET auth t=kiwi p=")
                await snd.send_str("SET auth t=admin p=s3cret")
                await snd.send_str("SET get_authkey")
                authkey = None
                for _ in range(10):
                    m = await asyncio.wait_for(snd.receive(), timeout=10)
                    if b"authkey_cb=" in m.data:
                        authkey = m.data.split(b"authkey_cb=")[1] \
                            .split()[0].decode()
                        break
                assert authkey and authkey == server.authkey
                tok = security.make_token(authkey)
                snd2 = await s.ws_connect(f"{url}/33/SND")
                await snd2.send_str("SET auth t=kiwi p=")
                await snd2.send_str("SET auth t=admin p=" + tok)
                await snd2.send_str("SET is_admin")
                ok = False
                for _ in range(10):
                    m = await asyncio.wait_for(snd2.receive(), timeout=10)
                    if b"is_admin=" in m.data:
                        ok = b"is_admin=1" in m.data
                        break
                assert ok
        finally:
            await server.stop()
            await runner.cleanup()
    asyncio.get_event_loop_policy().new_event_loop().run_until_complete(
        run())


async def admin_tabs_scenario():
    """Round-4 admin depth: connection inspector, DX label editor,
    GPS tab, update tab (`ui/admin.cpp:325` surface)."""
    params = rx.RxParams(num_channels=2, audio_block=128)
    src = SyntheticSource(tones=((14.201e6, 0.5),), noise_rms=0.001)
    eng = StreamEngine(params, src)
    server = KiwiServer(eng, cfg=Config(), port=PORT + 6,
                        realtime=False)
    runner = await server.start()
    try:
        async with aiohttp.ClientSession() as s:
            base = f"http://127.0.0.1:{PORT + 6}"
            ws = await s.ws_connect(f"{base}/1/ADMIN")
            await ws.send_str("SET auth t=admin p=")
            assert b"badp=0" in (await ws.receive()).data

            # one live user to inspect + kick
            snd = await s.ws_connect(f"{base}/u1/SND")
            await snd.send_str("SET auth t=kiwi p=")
            await snd.send_str("SET ident_user=insp")
            await asyncio.sleep(0.3)

            await ws.send_str("SET users")
            m = await ws.receive()
            assert m.data.startswith(b"USERS ")
            rows = json.loads(m.data[6:])
            assert any(r["n"] == "insp" and r["ip"] for r in rows)

            # DX editor: add, list, delete
            await ws.send_str(
                "SET dx_upd g=-1 f=7040.1 m=usb i=TESTLBL n=note")
            assert b"dx_seq=" in (await ws.receive()).data
            await ws.send_str("SET dx_list")
            m = await ws.receive()
            assert m.data.startswith(b"DXL ")
            labels = json.loads(m.data[4:])
            hit = [r for r in labels if r[3] == "TESTLBL"]
            assert hit and hit[0][1] == 7040.1
            await ws.send_str(f"SET dx_upd g={hit[0][0]} f=-1")
            assert b"dx_seq=" in (await ws.receive()).data

            # GPS tab (disabled in this server: honest status)
            await ws.send_str("SET gps")
            m = await ws.receive()
            assert m.data.startswith(b"GPS ")
            assert json.loads(m.data[4:])["enabled"] is False

            # update tab: status reports the installed version and a
            # no-egress check fails gracefully with a fail reason
            await ws.send_str("SET update_status")
            m = await ws.receive()
            assert m.data.startswith(b"UPD ")
            st = json.loads(m.data[4:])
            assert st["v1"] == 0 and st["i"] == 0
            await ws.send_str("SET update_check")
            m = await ws.receive()
            st = json.loads(m.data[4:])
            assert st["f"] != 0          # egress-gated: fails, no crash

            # kick by ts
            await ws.send_str("SET kick ts=u1")
            assert b"kicked=1" in (await ws.receive()).data
            await asyncio.sleep(0.2)
            assert "u1" not in server.conns
    finally:
        await server.stop()
        await runner.cleanup()


def test_admin_tabs():
    asyncio.run(asyncio.wait_for(admin_tabs_scenario(), timeout=120))


async def backup_restore_scenario():
    """Admin backup/restore: config + DX labels + prefs round-trip
    (the reference's backup tab, `ui/admin.cpp`)."""
    from urllib.parse import quote
    params = rx.RxParams(num_channels=2, audio_block=128)
    src = SyntheticSource(tones=((14.201e6, 0.5),), noise_rms=0.001)
    server = KiwiServer(StreamEngine(params, src), cfg=Config(),
                        port=PORT + 7, realtime=False)
    runner = await server.start()
    try:
        async with aiohttp.ClientSession() as s:
            ws = await s.ws_connect(
                f"http://127.0.0.1:{PORT + 7}/1/ADMIN")
            await ws.send_str("SET auth t=admin p=")
            assert b"badp=0" in (await ws.receive()).data
            # seed state, take a backup
            await ws.send_str("SET set_config key=rx_name value=backme")
            await ws.receive()
            await ws.send_str("SET dx_upd g=-1 f=5000.5 m=cw i=BKUP")
            await ws.receive()
            await ws.send_str("SET backup")
            m = await ws.receive()
            assert m.data.startswith(b"BAK ")
            bundle = json.loads(m.data[4:])
            assert bundle["cfg"]["rx_name"] == "backme"
            assert any(r[2] == "BKUP" for r in bundle["dx"])

            # wipe, then restore
            await ws.send_str("SET set_config key=rx_name value=wiped")
            await ws.receive()
            server.dx.labels = []
            await ws.send_str("SET restore data=" + quote(
                json.dumps(bundle)))
            m = await ws.receive()
            assert b"restored=1" in m.data
            assert server.cfg.string("rx_name") == "backme"
            assert any(l.ident == "BKUP" for l in server.dx.labels)
    finally:
        await server.stop()
        await runner.cleanup()


def test_backup_restore():
    asyncio.run(asyncio.wait_for(backup_restore_scenario(),
                                 timeout=120))


def test_mfg_stream_and_discovery():
    """MFG factory stream (`ui/mfg.cpp` c2s_mfg): auth, id report,
    serial-number write; /DIS discovery line
    (`rx_server_ajax.cpp:384-389`); /PIX photo upload with authkey
    gate (`rx_server_ajax.cpp:109-160`)."""
    async def scenario():
        params = rx.RxParams(num_channels=2, audio_block=128)
        src = SyntheticSource(tones=((14.201e6, 0.5),),
                              noise_rms=0.001)
        eng = StreamEngine(params, src)
        cfg = Config()
        server = KiwiServer(eng, cfg=cfg, port=PORT + 2,
                            realtime=False)
        runner = await server.start()
        base = f"http://127.0.0.1:{PORT + 2}"
        try:
            async with aiohttp.ClientSession() as s:
                # MFG: unauthed ops refused
                ws = await s.ws_connect(f"{base}/1/MFG")
                await ws.send_str("SET set_serno=42")
                m = await ws.receive()
                assert b"badp=1" in m.data
                # auth (no admin pwd set -> local peer allowed)
                await ws.send_str("SET auth t=admin p=")
                m = await ws.receive()
                assert b"badp=0" in m.data
                m = await ws.receive()       # id report
                assert b"serno=" in m.data and b"ver_maj=" in m.data
                await ws.send_str("SET eeprom_write=1 serno=1234 "
                                  "model=2")
                m = await ws.receive()
                assert b"serno=1234" in m.data
                assert cfg.int("serno") == 1234
                await ws.send_str("SET set_serno=77")
                m = await ws.receive()
                assert b"next_serno=77" in m.data
                await ws.close()

                # /DIS (local peer): "serno ip ip port nm mac"
                async with s.get(f"{base}/DIS") as r:
                    line = await r.text()
                assert line.split()[0] == "1234"
                assert line.split()[3] == str(PORT + 2)

                # /PIX: requires a live authkey
                png = b"\x89PNG\r\n\x1a\n" + b"\x00" * 64
                fd = aiohttp.FormData()
                fd.add_field("photo", png, filename="p.png")
                async with s.post(f"{base}/PIX?wrongkey",
                                  data=fd) as r:
                    assert await r.text() == "1"
                from flydog_sdr_gps_tpu.utils import security
                server.authkey = security.generate_authkey()
                fd = aiohttp.FormData()
                fd.add_field("photo", png, filename="p.png")
                async with s.post(f"{base}/PIX?{server.authkey}",
                                  data=fd) as r:
                    assert await r.text() == "0"
                async with s.get(f"{base}/photo") as r:
                    assert await r.read() == png
                # non-image content rejected
                server.authkey = security.generate_authkey()
                fd = aiohttp.FormData()
                fd.add_field("photo", b"not an image",
                             filename="p.txt")
                async with s.post(f"{base}/PIX?{server.authkey}",
                                  data=fd) as r:
                    assert await r.text() == "2"
        finally:
            await server.stop()
            await runner.cleanup()

    asyncio.run(scenario())


def test_gps_iq_logger_endpoint():
    """/gps?iq=<prn>: the per-channel prompt-IQ logger (CmdIQLogGet
    analogue, `gps/solve.cpp:585-599`)."""
    import collections

    class FakeCh:
        iq_log = collections.deque([(100.0, -3.0), (98.0, 2.5)])

    class FakeMgr:
        channels = {7: FakeCh()}

    class FakeGps:
        mgr = FakeMgr()
        engine = object()         # already bound

        def status(self):
            return {"tracking": 1, "fixes": 0, "fix": None}

        async def run(self):
            await asyncio.sleep(3600)

        def stop(self):
            pass

    async def scenario():
        params = rx.RxParams(num_channels=2, audio_block=128)
        src = SyntheticSource(tones=((14.201e6, 0.5),),
                              noise_rms=0.001)
        eng = StreamEngine(params, src)
        server = KiwiServer(eng, port=PORT + 3, realtime=False,
                            gps=FakeGps())
        runner = await server.start()
        try:
            async with aiohttp.ClientSession() as s:
                async with s.get(
                        f"http://127.0.0.1:{PORT + 3}/gps?iq=7") as r:
                    d = json.loads(await r.text())
                assert d["prn"] == 7
                assert d["iq"] == [[100.0, -3.0], [98.0, 2.5]]
                async with s.get(
                        f"http://127.0.0.1:{PORT + 3}/gps?iq=9") as r:
                    d = json.loads(await r.text())
                assert d["iq"] == []
        finally:
            await server.stop()
            await runner.cleanup()

    asyncio.run(scenario())


def test_admin_services_and_authkey():
    """Admin 'services' status command (network tab data) and
    get_authkey (photo-upload key) over the ADMIN stream."""
    async def scenario():
        params = rx.RxParams(num_channels=2, audio_block=128)
        src = SyntheticSource(tones=((14.201e6, 0.5),),
                              noise_rms=0.001)
        eng = StreamEngine(params, src)
        server = KiwiServer(eng, cfg=Config(), port=PORT + 4,
                            realtime=False)
        from flydog_sdr_gps_tpu.server.services import \
            default_services
        server.services = default_services(server, cfg=server.cfg,
                                           egress_allowed=False)
        runner = await server.start()
        try:
            async with aiohttp.ClientSession() as s:
                ws = await s.ws_connect(
                    f"http://127.0.0.1:{PORT + 4}/a/ADMIN")
                await ws.send_str("SET auth t=admin p=")
                m = await ws.receive()
                assert b"badp=0" in m.data
                await ws.send_str("SET services")
                m = await ws.receive()
                assert m.data.startswith(b"SVC ")
                rows = json.loads(m.data[4:])
                names = {r["name"] for r in rows}
                assert "snr_measure" in names
                assert "registry_checkin" in names
                await ws.send_str("SET get_authkey")
                m = await ws.receive()
                assert b"authkey_cb=" in m.data
                assert server.authkey is not None
        finally:
            await server.stop()
            await runner.cleanup()

    asyncio.run(scenario())


def test_admin_page_has_round5_tabs():
    from flydog_sdr_gps_tpu.server import webui
    for frag in ('data-t="network"', 'data-t="webpage"',
                 'data-t="public"', "ddns_hostname", "photo",
                 "public_listing"):
        assert frag in webui.ADMIN_PAGE, frag
