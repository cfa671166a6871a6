"""Verify drive: exercise a LIVE server over HTTP/WS like the web UI."""
import os, sys, asyncio, json
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import numpy as np
import aiohttp

PORT = int(sys.argv[1]) if len(sys.argv) > 1 else 8077

async def main():
    async with aiohttp.ClientSession() as s:
        base = f"http://127.0.0.1:{PORT}"
        page = await (await s.get(base + "/")).text()
        assert 'id="sky"' in page and "URLSearchParams" in page
        print("page ok: sky canvas + URL params present")
        sttxt = await (await s.get(base + "/status")).text()
        st = dict(ln.split("=", 1) for ln in sttxt.splitlines()
                  if "=" in ln)
        print("status:", {k: st.get(k) for k in
              ("gps_good", "fixes", "gps", "users")})
        g = await (await s.get(base + "/gps")).json()
        if g.get("enabled", True):
            sats = [(x["prn"], x.get("az"), x.get("el"), x["snr"])
                    for x in g.get("sats", [])]
            print("gps:", g.get("tracking"), "tracked, fixes",
                  g.get("fixes"), "ppm", g.get("clock_ppm"),
                  "fix", g.get("fix"))
            print("sats az/el:", sats)
        else:
            print("gps: disabled (no --gps)")

        ws = await s.ws_connect(f"{base}/77/SND")
        await ws.send_str("SET auth t=kiwi p=")
        await ws.send_str("SET compression=0")
        await ws.send_str("SET mod=usb low_cut=300 high_cut=2700 "
                          "freq=14200.200")
        pcm = []
        import time as _time
        last_ka = _time.time()
        while len(pcm) < 24:
            if _time.time() - last_ka > 5.0:
                # the real client's keepalive timer — without it the
                # policy loop kicks us during a first-boot compile
                await ws.send_str("SET keepalive")
                last_ka = _time.time()
            try:
                m = await asyncio.wait_for(ws.receive(), timeout=5)
            except asyncio.TimeoutError:
                continue
            if m.type == aiohttp.WSMsgType.BINARY and \
               m.data[:3] == b"SND":
                pcm.append(np.frombuffer(m.data[10:], ">i2"))
        a = np.concatenate(pcm).astype(np.float64) / 32768
        a = a[len(a)//2:]
        w = np.abs(np.fft.rfft(a * np.hanning(len(a))))
        f = np.argmax(w) * 12000 / len(a)
        print(f"USB audio tone at {f:.0f} Hz (want ~1600: scene tone 14.2018 MHz)")
        assert abs(f - 1600) < 50
        await ws.close()

        wf = await s.ws_connect(f"{base}/78/W/F")
        await wf.send_str("SET auth t=kiwi p=")
        await wf.send_str("SET MARKER db=0 min=6000 max=16000 zoom=2 "
                          "width=1024")
        labels = None
        for _ in range(20):
            m = await asyncio.wait_for(wf.receive(), timeout=30)
            if m.type == aiohttp.WSMsgType.BINARY and \
               m.data[:3] == b"MSG" and b"mkr=" in m.data:
                labels = json.loads(m.data[8:])
                break
        print("dx labels:", [(r.get("f"), r.get("i")) for r in labels
                             if "f" in r])
        assert any("f" in r for r in labels)
        await wf.close()
        print("LIVE DRIVE OK")

asyncio.run(main())
