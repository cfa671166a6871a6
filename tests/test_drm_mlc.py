"""DRM multilevel-coding chain vs the ETSI/Dream reference math.

Golden values below were computed BY HAND from the standard's
formulas (and cross-checked against Dream's
`dream/MLC/ChannelCode.cpp` / `BlockInterleaver.cpp` /
`EnergyDispersal.cpp` semantics), so these tests are not circular
with the implementation.
"""

import numpy as np

from flydog_sdr_gps_tpu.extensions import drm_mlc as m


def test_fac_puncture_table():
    """FAC: 72 bits, rate id 6 (R=3/5), N=65 cells -> 78 steps all
    cycling [0011, 0001, 0011] (no special tailbits for FAC,
    ChannelCode.cpp:140), totalling exactly 130 transmitted bits."""
    t = m.gen_punct_table(True, 65, 0, 72, 0, m.RATE_FAC, 0)
    assert len(t) == 78
    cyc = [m.PP_0011, m.PP_0001, m.PP_0011]
    assert t == [cyc[i % 3] for i in range(78)]
    assert sum(len(m._EMIT[pp]) for pp in t) == 130


def test_sdc_tailbit_pattern_selection():
    """SDC QPSK rate 1/2: tailbit index = (2N-12) mod 2 = 0 ->
    pattern row 0 = six PP_0011 steps (12 tail bits)."""
    n = 207
    t = m.gen_punct_table(False, n, 0, (2 * n - 12) // 2, 0,
                          m.RATE_SDC4, 0)
    assert t[-6:] == [m.PP_0011] * 6
    assert sum(len(m._EMIT[pp]) for pp in t) == 2 * n


def test_mother_code_generators():
    """Impulse response of the 4 generator outputs must equal the
    taps of 133/171/145/133 octal (standard K=7 polynomials)."""
    pp = [m.PP_1111] * 13          # rate 1/4, no puncturing
    coded = m.conv_encode(np.array([1, 0, 0, 0, 0, 0, 0], np.uint8),
                          pp)
    streams = coded.reshape(-1, 4).T
    for j, g in enumerate((0o133, 0o171, 0o145, 0o133)):
        taps = [int(c) for c in f"{g:07b}"]
        assert streams[j][:7].tolist() == taps, (j, streams[j][:7])


def test_interleaver_perm_golden():
    """ETSI 7.3.3 permutation for n=130, t0=21: s=256, q=63;
    hand-computed first entries 0, 63, 106, 4 (241 skipped >= n)."""
    p = m.interleaver_perm(130, 21)
    assert p[0] == 0 and p[1] == 63 and p[2] == 106 and p[3] == 4
    assert sorted(p.tolist()) == list(range(130))   # a permutation


def test_energy_dispersal_prbs():
    """PRBS x^9+x^5+1 from all-ones: first 16 bits via an independent
    Fibonacci-LFSR computation."""
    state = [1] * 9                 # s[0] newest ... s[8] oldest
    want = []
    for _ in range(16):
        b = state[4] ^ state[8]     # taps 5 and 9
        want.append(b)
        state = [b] + state[:8]
    got = m.energy_dispersal(np.zeros(16, np.uint8)).tolist()
    assert got == want
    # self-inverse
    rng = np.random.default_rng(0)
    x = rng.integers(0, 2, 100).astype(np.uint8)
    assert np.array_equal(m.energy_dispersal(m.energy_dispersal(x)), x)


def test_qam_tables_match_etsi_normalisation():
    assert np.allclose(m.QAM16, np.array([3, -1, 1, -3]) / np.sqrt(10))
    assert np.isclose(m.QAM64[0], 1.0801234497, atol=1e-9)
    assert np.isclose(m.QAM64[3], -0.7715167498, atol=1e-9)


def test_mlc_roundtrip_with_noise_all_schemes():
    rng = np.random.default_rng(7)
    for chan, n, lv, prot in (("fac", 65, 1, 0), ("sdc", 207, 1, 0),
                              ("sdc", 207, 2, 0), ("msc", 800, 2, 1),
                              ("msc", 800, 3, 1)):
        p = m.MlcParams(chan, n, levels=lv, protection=prot)
        bits = rng.integers(0, 2, p.total_bits).astype(np.uint8)
        cells = p.encode(bits)
        assert len(cells) == n
        noisy = cells + 0.08 * (rng.standard_normal(n)
                                + 1j * rng.standard_normal(n))
        assert np.array_equal(p.decode(noisy), bits), (chan, lv)


def test_drm_loopback_64qam():
    """End-to-end OFDM loopback with the 3-level 64-QAM MSC."""
    from flydog_sdr_gps_tpu.extensions import drm
    tx = drm.DrmTx(service_id=0x00BEEF, label_idx=2, msc_qam=64)
    sdc, msc = b"sixtyfour", b"MSC 64-QAM payload"
    bb = tx.superframe(sdc, msc).astype(np.complex128)
    rng = np.random.default_rng(3)
    sig = np.concatenate([np.zeros(500), bb, bb, np.zeros(2000)])
    sig = sig + 0.005 * (rng.standard_normal(len(sig))
                         + 1j * rng.standard_normal(len(sig)))
    rx = drm.DrmRx()
    got = []
    for i in range(0, len(sig) - 511, 512):
        got.extend(rx.feed(sig[i:i + 512].astype(np.complex64)))
    d = dict((t, p) for t, p in got)
    assert d.get("drm_sdc") == sdc and d.get("drm_msc") == msc
    assert d["drm_fac"]["msc_qam"] == 64


def test_audio_super_frame_roundtrip():
    """ETSI 5.3.1 audio super frame: borders (incl. mod-4096 wrap),
    grouped CRCs, payload padding."""
    from flydog_sdr_gps_tpu.extensions import drm_audio as da
    rng = np.random.default_rng(5)
    frames = [rng.integers(0, 256, n).astype(np.uint8).tobytes()
              for n in (120, 95, 130, 88, 60)]
    sf = da.build_super_frame(frames, total_len=700)
    assert len(sf) == 700
    got = da.parse_super_frame(sf)
    assert got is not None and len(got) == 5
    for k in range(4):
        au, ok = got[k]
        assert ok and au == frames[k]
    au, ok = got[4]                       # last frame zero-padded
    assert ok and au.startswith(frames[4])
    # corrupt one payload byte -> exactly that frame's CRC fails
    bad = bytearray(sf)
    bad[20 + 5 + 3] ^= 0xFF               # inside frame 0's payload
    got = da.parse_super_frame(bytes(bad))
    assert got[0][1] is False and got[1][1] is True
    # inconsistent borders -> None
    junk = bytearray(sf)
    junk[0] = 0xFF
    junk[1] = 0xFF
    assert da.parse_super_frame(bytes(junk)) is None


def test_drm_audio_service_loopback():
    """End-to-end: AAC access units -> audio super frames -> MLC ->
    OFDM -> receiver -> validated AUs (the full DRM audio path minus
    the vendored AAC codec)."""
    from flydog_sdr_gps_tpu.extensions import drm
    rng = np.random.default_rng(6)
    per_frame = [[rng.integers(0, 256, 90 + 10 * k).astype(
        np.uint8).tobytes() for k in range(5)] for _ in range(3)]
    tx = drm.DrmTx(service_id=0x00AD10, label_idx=1)
    bb = tx.superframe(b"audio svc", per_frame).astype(np.complex128)
    sig = np.concatenate([np.zeros(600), bb, bb, np.zeros(2000)])
    sig = sig + 0.004 * (rng.standard_normal(len(sig))
                         + 1j * rng.standard_normal(len(sig)))
    rx = drm.DrmRx(msc_audio=True)
    got = []
    for i in range(0, len(sig) - 511, 512):
        got.extend(rx.feed(sig[i:i + 512].astype(np.complex64)))
    aus = [p for t, p in got if t == "drm_audio_frame"]
    want = [au for fr in per_frame for au in fr]
    # every non-padded AU of the superframe decodes CRC-clean
    hits = sum(1 for w in want if any(a.startswith(w) for a in aus))
    assert hits >= 14, (hits, len(aus))


def test_drm_long_interleaver_loopback():
    """SI_LONG (ETSI 7.6 D=5): each multiplex frame spreads over 5
    transmitted frames; the receiver's cross-superframe ring
    reconstructs them with a 4-frame lag."""
    from flydog_sdr_gps_tpu.extensions import drm
    tx = drm.DrmTx(service_id=0x00C0DE,
                   label_idx=4, interleaver="long")
    sdc, msc = b"long ilv", b"LONG interleaver payload"
    sfs = [tx.superframe(sdc, msc).astype(np.complex128)
           for _ in range(4)]                 # STATE carries across
    rng = np.random.default_rng(9)
    sig = np.concatenate([np.zeros(700)] + sfs + [np.zeros(3000)])
    sig = sig + 0.004 * (rng.standard_normal(len(sig))
                         + 1j * rng.standard_normal(len(sig)))
    rx = drm.DrmRx()
    got = []
    for i in range(0, len(sig) - 511, 512):
        got.extend(rx.feed(sig[i:i + 512].astype(np.complex64)))
    d = dict((t, p) for t, p in got)
    assert d["drm_fac"]["interleaver_short"] is False
    assert d.get("drm_sdc") == sdc
    assert d.get("drm_msc") == msc
