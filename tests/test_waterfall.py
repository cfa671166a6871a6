"""Waterfall: tone lands on the right pixel, zoom narrows the span."""

import numpy as np
import jax.numpy as jnp
import pytest

from flydog_sdr_gps_tpu.models import waterfall as wf
from flydog_sdr_gps_tpu.numerology import ADC_CLOCK_NOM, UI_SRATE_30M


def run_wf(zoom, cf, x_blocks):
    params = wf.WfParams(zoom=zoom)
    br, bi, dphi = wf.tune(params, cf)
    st = wf.init_state(params)
    for x in x_blocks:
        st = wf.wf_ingest(params, st, jnp.asarray(x), jnp.asarray(br),
                          jnp.asarray(bi), jnp.asarray(dphi))
    row = np.asarray(wf.wf_frame(params, st))
    return params, row


def expected_pixel(params, f_tone, cf):
    """Pixel where a tone at f_tone should appear (center = px/2)."""
    return params.out_px / 2 + (f_tone - cf) / params.span * params.out_px


@pytest.mark.parametrize("zoom", [0, 4])
def test_tone_pixel_position(zoom):
    cf = 10.0e6
    params0 = wf.WfParams(zoom=zoom)
    f_tone = cf + 0.21 * params0.span          # 21% right of center
    n = 5_332_992                              # one rx-block worth
    nblk = params0.ingest_blocks(n)
    t = np.arange(n * nblk, dtype=np.float64)
    x = (0.5 * np.cos(2 * np.pi * ((f_tone / ADC_CLOCK_NOM * t) % 1.0))
         ).astype(np.float32)
    params, row = run_wf(zoom, cf, [x[i * n * nblk:(i + 1) * n * nblk]
                                    for i in range(1)])
    peak = int(np.argmax(row))
    expect = expected_pixel(params, f_tone, cf)
    assert abs(peak - expect) < 3, (peak, expect)
    # dynamic range: peak well above the empty-floor pixels
    floor = np.median(row)
    assert row[peak] - floor > 40, (row[peak], floor)


def test_zoom_narrows_span():
    p0 = wf.WfParams(zoom=0)
    p5 = wf.WfParams(zoom=5)
    assert p5.span == p0.span / 32
    assert p5.total_decim == p0.total_decim * 32
    assert p0.span == UI_SRATE_30M


def test_deep_zoom_ingest_blocks():
    n = 5_332_992
    assert wf.WfParams(zoom=0).ingest_blocks(n) == 1
    assert wf.WfParams(zoom=11).ingest_blocks(n) == 1
    assert wf.WfParams(zoom=12).ingest_blocks(n) == 2
    assert wf.WfParams(zoom=14).ingest_blocks(n) == 8


def test_streaming_ring_continuity():
    """Two half-blocks must fill the ring identically to one block."""
    zoom = 2
    cf = 7.0e6
    params = wf.WfParams(zoom=zoom)
    n = 1_333_248 * 2   # divisible by base*2^zoom
    rng = np.random.default_rng(0)
    x = (0.1 * rng.standard_normal(n)).astype(np.float32)
    _, row_a = run_wf(zoom, cf, [x])
    _, row_b = run_wf(zoom, cf, [x[:n // 2], x[n // 2:]])
    np.testing.assert_allclose(row_a, row_b, atol=1e-3)


def test_row_u8_quantization():
    row = jnp.asarray([-10.0, -300.0, 0.0, 5.0])
    u8 = np.asarray(wf.wf_row_u8(row))
    assert list(u8) == [245, 0, 255, 255]
