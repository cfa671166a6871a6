"""Autorun background decoders (`rx/rx_util.cpp` arun_* semantics):
idle channels get claimed by WSPR/FT8 decoder instances with zero
clients connected; a real user preempts them; spots are logged with
the upload hook egress-gated.
"""

import asyncio

import pytest

aiohttp = pytest.importorskip("aiohttp")

from flydog_sdr_gps_tpu.models import rx_channel as rx
from flydog_sdr_gps_tpu.ops import demod
from flydog_sdr_gps_tpu.runtime import StreamEngine, SyntheticSource
from flydog_sdr_gps_tpu.server import KiwiServer
from flydog_sdr_gps_tpu.server.autorun import parse_spec

PORT = 18081


def test_parse_spec():
    assert parse_spec("wspr:7038.6") == [("wspr", 7038.6)]
    assert parse_spec("ft8:14074") == [("FT8", 14074.0)]
    [(name, f)] = parse_spec("WSPR:7.0386M")
    assert name == "wspr" and f == pytest.approx(7038.6)
    assert parse_spec("wspr:7038600") == [("wspr", 7038.6)]
    # alternating FT8/FT4 slots on one channel
    assert parse_spec("ft8/ft4:14074/14080") == \
        [("FT8", 14074.0), ("FT4", 14080.0)]
    assert parse_spec("ft8/ft4:14074") == \
        [("FT8", 14074.0), ("FT4", 14074.0)]
    with pytest.raises(ValueError):
        parse_spec("nosuch:123")
    with pytest.raises(ValueError):
        parse_spec("ft8/ft4:1/2/3")


def make_server():
    params = rx.RxParams(num_channels=2, audio_block=128)
    src = SyntheticSource(tones=((7.040e6, 0.2),), noise_rms=1e-3)
    eng = StreamEngine(params, src)
    return KiwiServer(eng, port=PORT, realtime=False,
                      autorun=["wspr:7038.6", "FT8:14074"])


def test_autorun_claims_decodes_and_yields():
    async def scenario():
        server = make_server()
        runner = await server.start()
        try:
            # --- with zero clients, autorun claims both channels ---
            for _ in range(100):
                if len(server.autorun.channels) == 2:
                    break
                await asyncio.sleep(0.1)
            assert len(server.autorun.channels) == 2
            wspr_unit = server.autorun.units[0]
            assert wspr_unit.ext is not None
            ch = wspr_unit.rx_chan
            assert server.engine.ctl[ch].in_use
            assert abs(server.engine.ctl[ch].freq_hz - 7038600.0) < 1
            assert server.engine.ctl[ch].mode == demod.MODE_USB

            # --- taps flow into the decoder front-end ---
            # (poll: the fused step+gather program compiles on the
            # first subscribed block, several seconds on CPU)
            s0 = wspr_unit.ext._samples
            for _ in range(300):
                if wspr_unit.ext._samples > s0:
                    break
                await asyncio.sleep(0.1)
            assert wspr_unit.ext._samples > s0

            # --- decode messages become logged spots (upload gated) ---
            unit = server.autorun.units[1]
            unit.ext.process_block = lambda taps: [
                ("ft8_decode", b"CQ K1ABC FN42 1230.0")]
            for _ in range(50):
                if server.autorun.spots:
                    break
                await asyncio.sleep(0.1)
            assert server.autorun.spots
            assert server.autorun.spots[0]["ext"] == "FT8"
            assert "K1ABC" in server.autorun.spots[0]["text"]
            assert server.autorun.uploads_gated >= 1
            async with aiohttp.ClientSession() as session:
                async with session.get(
                        f"http://127.0.0.1:{PORT}/status") as r:
                    text = await r.text()
                assert "autorun=2" in text
                assert "spots=" in text

                # --- a real user preempts an autorun channel ---
                ws = await session.ws_connect(
                    f"http://127.0.0.1:{PORT}/777/SND")
                await ws.send_str("SET auth t=kiwi p=")
                await asyncio.sleep(0.3)
                conns = list(server.conns.values())
                assert conns and conns[0].rx_chan is not None
                assert len(server.autorun.channels) == 1
                await ws.close()
            # --- after the user leaves, autorun re-claims ---
            for _ in range(100):
                if len(server.autorun.channels) == 2:
                    break
                await asyncio.sleep(0.1)
            assert len(server.autorun.channels) == 2
        finally:
            await server.stop()
            await runner.cleanup()
    asyncio.run(scenario())
