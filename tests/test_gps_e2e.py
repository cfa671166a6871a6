"""GPS end to end: a synthetic multi-satellite sky drives the LIVE
server to a position fix and a measurable NCO retune.

This is the reference's defining loop (`gps/gps.cpp:40` ->
`init/clk.cpp:117-275` -> `rx/rx_sound.cpp:334-344`): cold search ->
track -> LNAV decode -> ephemeris -> position solve -> clock
discipline -> every DDC NCO retuned — all COLD START (no assisted
ephemerides; everything is decoded from the tracked bits).
"""

import asyncio
import time

import numpy as np
import pytest

aiohttp = pytest.importorskip("aiohttp")

from flydog_sdr_gps_tpu.models import rx_channel as rx
from flydog_sdr_gps_tpu.models.gps import ephemeris, manager, scene
from flydog_sdr_gps_tpu.runtime import (GpsReceiver, StreamEngine,
                                        SyntheticSource)
from flydog_sdr_gps_tpu.server import KiwiServer

PORT = 18077
RX_LLA = (47.37, 8.54, 450.0)
# t0 picked so the first three full subframes are ids 1, 2, 3 (eph
# complete ~19.5 s in) and the first boundary lands 1.3 s after start
T0 = 345628.7


def make_scene(n_sats=4, clock_ppm=0.4, seed=3):
    rx_pos = scene.ecef_from_lla(*RX_LLA)
    ephs = scene.visible_constellation(rx_pos, T0, n_sats=n_sats,
                                       min_el=25.0, seed=seed)
    sky = scene.GpsScene(rx_pos, ephs, T0, duration=40.0,
                         clock_ppm=clock_ppm, noise=0.8,
                         amplitude=0.55, seed=seed)
    return rx_pos, ephs, sky


# ---------------------------------------------------------------------------
# fast sub-checks of the scene fixtures themselves
# ---------------------------------------------------------------------------

def test_lnav_bitstream_round_trip():
    """The scene's LNAV stream decodes back to the (quantized)
    ephemeris, with TOW events dating every subframe."""
    e = scene.make_ephemeris(7, T0, 1.1, 0.3, af0=1.5e-5, af1=3e-12)
    t_b0, bits = scene.lnav_bitstream(e, T0, 40.0)
    assert t_b0 % 6.0 == 0.0
    asm = ephemeris.SubframeAssembler(prn=7)
    asm.feed(bits)
    assert asm.eph.complete()
    assert asm.subframes >= 5
    # TOW events: bit index i starts at SV time t_b0 + 0.02*i, and the
    # HOW says the NEXT subframe starts at tow_next
    for (_sub, start_bit, tow_next) in asm.events:
        t_start = t_b0 + 0.02 * start_bit
        assert abs((t_start + 6.0) - tow_next) < 1e-9
    for f in ("sqrt_a", "e", "m0", "omega0", "af0"):
        assert abs(getattr(asm.eph, f) - getattr(e, f)) < 1e-6 * max(
            1.0, abs(getattr(e, f)))


def test_scene_acquisition_matches_truth():
    """Cold search on the scene finds each planted satellite at the
    geometric code phase and Doppler."""
    from flydog_sdr_gps_tpu.models.gps import acquisition
    rx_pos, ephs, sky = make_scene(n_sats=4)
    acq = acquisition.AcqParams()
    raw = sky.next_block(acq.n_raw)
    cands = acquisition.acquire_all(acq, raw, prns=tuple(ephs) + (13,))
    by_prn = {c["prn"]: c for c in cands}
    for prn in ephs:
        c = by_prn[prn]
        assert c["snr"] > 30.0, (prn, c)
        tau = sky.true_delay(prn, T0)
        clk = ephs[prn].sat_pos(T0 - tau)[1]
        # code phase of the signal at sample 0: the SV-time chip index
        # (data[0] = code[cp], the tracking handoff convention)
        expect_cp = ((T0 - tau + clk) * 1.023e6) % 1023.0
        err = (c["code_phase"] - expect_cp + 511.5) % 1023.0 - 511.5
        assert abs(err) < 1.5, (prn, c["code_phase"], expect_cp)
    assert by_prn[13]["snr"] < 25.0      # absent sat stays below


# ---------------------------------------------------------------------------
# the flagship: live server cold start to fix + retune
# ---------------------------------------------------------------------------

async def _gps_server_scenario():
    rx_pos, ephs, sky = make_scene(n_sats=4, clock_ppm=0.4)
    mgr = manager.GpsManager(
        max_chans=4, prns=tuple(ephs) + (13,), min_snr=28.0)
    gps = GpsReceiver(sky, mgr, chunk_seconds=0.2, solve_interval=0.4,
                      search_interval=30.0)

    params = rx.RxParams(num_channels=2, audio_block=128)
    src = SyntheticSource(tones=((14.201e6, 0.5),), noise_rms=0.001)
    eng = StreamEngine(params, src)
    server = KiwiServer(eng, port=PORT, realtime=True, gps=gps)
    runner = await server.start()
    try:
        async with aiohttp.ClientSession() as session:
            # live SND connection tuned to 14.2 MHz
            ws = await session.ws_connect(
                f"http://127.0.0.1:{PORT}/987654/SND")
            await ws.send_str("SET auth t=kiwi p=")
            await ws.send_str(
                "SET mod=usb low_cut=300 high_cut=2700 freq=14200.00")
            dphi_before = np.asarray(eng.tuning.dphi1[0]).copy()

            # wait (IF-time budget 26 s) for the cold-start fix
            deadline = time.time() + 900
            while time.time() < deadline:
                st = gps.status()
                if st["fixes"] > 0 and gps.retunes > 0:
                    break
                if mgr.ticks / mgr.tp.fs > 26.0:
                    break
                await asyncio.sleep(1.0)
            st = gps.status()
            assert st["tracking"] == 4, st
            assert st["fixes"] > 0, st
            # every ephemeris was decoded live from the tracked bits
            assert len(mgr.ephemerides()) == 4
            # fix accuracy vs scene truth
            fix_err = np.linalg.norm(mgr.last_fix - rx_pos)
            assert fix_err < 60.0, fix_err
            # clock discipline recovered the injected +0.4 ppm
            assert gps.retunes >= 1
            assert abs(st["clock_ppm"] - 0.4) < 0.15, st["clock_ppm"]
            # ... and the live channel's NCO actually moved
            dphi_after = np.asarray(eng.tuning.dphi1[0])
            assert not np.array_equal(dphi_before, dphi_after)

            # /status surfaces the fix (`rx_server_ajax.cpp:538`)
            async with session.get(
                    f"http://127.0.0.1:{PORT}/status") as r:
                text = await r.text()
            assert "gps_good=4" in text
            assert "gps=(47.3" in text
            # /gps JSON has per-sat az/el for the sky map
            async with session.get(
                    f"http://127.0.0.1:{PORT}/gps") as r:
                gj = await r.json()
            assert gj["enabled"] and len(gj["sats"]) == 4
            assert all("az" in s and "el" in s for s in gj["sats"])
            assert all(s["el"] > 20.0 for s in gj["sats"])
            await ws.close()
    finally:
        await server.stop()
        await runner.cleanup()


def test_server_gps_cold_start_fix_and_retune():
    asyncio.run(_gps_server_scenario())
