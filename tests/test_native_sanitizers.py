"""Sanitizer builds of the native (C) runtime components.

Reference analogue: the USE_ASAN / valgrind build modes
(`support/sanitizer.h`, `main.cpp:303-309`) that run the C++ host
under memory-error detection.  This repo's native surface is
`runtime/native/{adpcm,datapump}.c`; here each is compiled with
`-fsanitize=address,undefined -fno-sanitize-recover` into a small
self-checking harness and executed — any heap overflow, UB, or leak
in the codec/ring hot paths fails the test.

Skipped when no compiler supports ASAN (gate, not a stub: in this
build image gcc does).
"""

import os
import subprocess

import pytest

NATIVE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "flydog_sdr_gps_tpu", "runtime",
    "native")

HARNESS = r"""
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

/* the components under test */
void adpcm_encode(const int16_t *in, uint8_t *out, int n, int32_t *st);
void adpcm_decode(const uint8_t *in, int16_t *out, int n, int32_t *st);

typedef struct ring ring_t;
ring_t *dp_ring_new(int64_t block, int64_t nblocks);
void dp_ring_free(ring_t *r);
int dp_ring_push(ring_t *r, const float *x);
int dp_ring_pop(ring_t *r, float *out);
int64_t dp_ring_fill(const ring_t *r);
int64_t dp_ring_overruns(const ring_t *r);
void dp_s24_to_f32(const uint8_t *in, float *out, int64_t n,
                   float scale, int iq_swap);

int main(void) {
    /* ADPCM round trip at awkward sizes (odd tails, full scale) */
    for (int n = 2; n <= 4096; n = n * 3 + 2) {
        int m = n & ~1;
        int16_t *pcm = malloc(m * sizeof(int16_t));
        uint8_t *enc = malloc(m / 2);
        int16_t *dec = malloc(m * sizeof(int16_t));
        int32_t st1[2] = {0, 0}, st2[2] = {0, 0};
        for (int i = 0; i < m; i++)
            pcm[i] = (int16_t)((i * 2654435761u) >> 16);
        adpcm_encode(pcm, enc, m, st1);
        adpcm_decode(enc, dec, m, st2);
        free(pcm); free(enc); free(dec);
    }
    /* SPSC ring: fill, overrun, drain */
    ring_t *r = dp_ring_new(256, 4);
    float *blk = malloc(256 * sizeof(float));
    for (int i = 0; i < 256; i++) blk[i] = i * 0.5f;
    for (int k = 0; k < 9; k++) dp_ring_push(r, blk);
    if (dp_ring_overruns(r) == 0) { fprintf(stderr, "no overrun?\n");
        return 1; }
    float *out = malloc(256 * sizeof(float));
    while (dp_ring_fill(r) > 0) dp_ring_pop(r, out);
    dp_ring_free(r);
    free(blk); free(out);
    /* s24 conversion with iq swap */
    uint8_t raw[4 * 3];
    for (int i = 0; i < 12; i++) raw[i] = (uint8_t)(i * 37);
    float f[4];
    dp_s24_to_f32(raw, f, 4, 1.0f / 8388608.0f, 1);
    printf("sanitizer harness ok\n");
    return 0;
}
"""


def _have_asan() -> bool:
    try:
        r = subprocess.run(["gcc", "-fsanitize=address", "-x", "c",
                            "-", "-o", "/dev/null"],
                           input="int main(void){return 0;}",
                           text=True, capture_output=True, timeout=60)
        return r.returncode == 0
    except FileNotFoundError:
        return False


@pytest.mark.skipif(not _have_asan(), reason="no ASAN-capable gcc")
def test_native_code_under_asan_ubsan(tmp_path):
    harness = tmp_path / "harness.c"
    harness.write_text(HARNESS)
    exe = tmp_path / "harness"
    cmd = ["gcc", "-O1", "-g", "-fsanitize=address,undefined",
           "-fno-sanitize-recover=all", "-o", str(exe), str(harness),
           os.path.join(NATIVE, "adpcm.c"),
           os.path.join(NATIVE, "datapump.c"), "-lpthread"]
    build = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=120)
    assert build.returncode == 0, build.stderr
    run = subprocess.run(
        [str(exe)], capture_output=True, text=True, timeout=120,
        env=dict(os.environ,
                 ASAN_OPTIONS="detect_leaks=1:abort_on_error=0"))
    assert run.returncode == 0, (run.stdout, run.stderr)
    assert "sanitizer harness ok" in run.stdout
