"""Service scheduler + password auth."""

import asyncio
import time

import pytest

from flydog_sdr_gps_tpu.server.services import ServiceScheduler


def test_scheduler_runs_and_reports():
    async def scenario():
        sched = ServiceScheduler()
        hits = []
        sched.register("fast", 0.01, lambda: hits.append(1))

        def boom():
            raise RuntimeError("nope")
        sched.register("broken", 0.01, boom)
        sched.register("disabled", 0.01,
                       lambda: hits.append("NO"), enabled=False)
        sched.start()
        await asyncio.sleep(0.05)
        await sched.stop()
        st = {s["name"]: s for s in sched.status()}
        assert hits and "NO" not in hits
        assert st["fast"]["ok"] is True
        assert st["broken"]["ok"] is False and "nope" in \
            st["broken"]["error"]
        assert st["disabled"]["runs"] == 0
    asyncio.run(scenario())


def test_password_auth():
    aiohttp = pytest.importorskip("aiohttp")
    from flydog_sdr_gps_tpu.models import rx_channel as rx
    from flydog_sdr_gps_tpu.runtime import StreamEngine, SyntheticSource
    from flydog_sdr_gps_tpu.server import KiwiServer
    from flydog_sdr_gps_tpu.utils import Config

    async def scenario():
        params = rx.RxParams(num_channels=2, audio_block=128)
        eng = StreamEngine(params, SyntheticSource())
        cfg = Config()
        cfg.set("user_password", "sekrit")
        server = KiwiServer(eng, cfg=cfg, port=18077, realtime=False)
        runner = await server.start()
        try:
            async with aiohttp.ClientSession() as s:
                ws = await s.ws_connect("http://127.0.0.1:18077/9/SND")
                await ws.send_str("SET auth t=kiwi p=wrong")
                m = await ws.receive()
                assert b"badp=1" in m.data
                await ws.send_str("SET auth t=kiwi p=sekrit")
                m = await ws.receive()
                assert b"badp=0" in m.data
                await ws.close()
                # root page serves
                async with s.get("http://127.0.0.1:18077/") as r:
                    body = await r.text()
                    assert "flydog_sdr_gps_tpu" in body
        finally:
            await server.stop()
            await runner.cleanup()
    asyncio.run(scenario())
