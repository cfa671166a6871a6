"""Cross-implementation DRM mode-B encode oracle (Dream transmitter).

Builds the ENCODE side of the reference's vendored Dream 2.1.1
(`/root/reference/extensions/DRM/dream`, an INDEPENDENT third-party
DRM implementation, GPL) into a CLI that emits a complete mode B /
SO_3 transmission: Dream's real FAC/SDC bit encoders, multilevel
coding (energy dispersal, punctured convolutional code, bit
interleavers, QAM mapping), MSC cell interleaver, ETSI 8.4 cell
mapping with pilots, and OFDM modulation — none of it written by this
repo.  The repo's full receive chain is then required to decode it:
OFDM sync -> cell demap -> MLC decode -> ETSI FAC/SDC parse -> audio
super frame -> AU CRC (r4 verdict Missing #2 / next-step #2).

MSC content: the oracle builds valid ETSI 5.3.1 audio super frames
whose AU payloads are deterministic pseudo-data (the vendored FDK-AAC
codec is out of scope), with per-AU DRM CRC-8 computed by Dream's own
CCRC class.

Nothing from Dream is copied into the repo; sources compile out of
the read-only reference tree into ``build/`` (same pattern as
tools/ft8_oracle.py).  Sound/Qt/receiver-GUI layers are not needed by
the encode path; tiny shim headers satisfy their includes.
"""

from __future__ import annotations

import os
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DREAM = "/root/reference/extensions/DRM/dream"
BUILD = os.path.join(REPO, "build", "drm_oracle")
EXE = os.path.join(BUILD, "drm_oracle")

# Dream sources needed by the encode path (compiled from the
# read-only tree; Parameter.cpp is copied into BUILD so the shim
# DRMReceiver.h next to it wins the quoted-include search).
_SRCS = [
    "FAC/FAC.cpp",
    "SDC/SDCTransmit.cpp",
    "SDC/audioparam.cpp",
    "MLC/MLC.cpp",
    "MLC/ConvEncoder.cpp",
    "MLC/BitInterleaver.cpp",
    "MLC/EnergyDispersal.cpp",
    "MLC/QAMMapping.cpp",
    "MLC/ChannelCode.cpp",
    "MLC/Metric.cpp",
    "MLC/ViterbiDecoder.cpp",
    "interleaver/SymbolInterleaver.cpp",
    "interleaver/BlockInterleaver.cpp",
    "OFDMcellmapping/CellMappingTable.cpp",
    "OFDMcellmapping/OFDMCellMapping.cpp",
    "OFDM.cpp",
    "tables/TableCarMap.cpp",
    "tables/TableFAC.cpp",
    "util/CRC.cpp",
    "util/Utilities.cpp",
    "util/Settings.cpp",
    "util/FileTyper.cpp",
    "Version.cpp",
    "util/Vector.cpp",
    "matlib/MatlibStdToolbox.cpp",
    "matlib/MatlibSigProToolbox.cpp",
]

# minimal fftw3 API used by Dream's matlib, backed by a naive DFT
# (plan sizes here are tiny: Tu=1024-point OFDM IFFT)
_FFTW_H = r"""
#ifndef DRM_ORACLE_FFTW3_SHIM_H
#define DRM_ORACLE_FFTW3_SHIM_H
/* Minimal fftw3f-compatible shim for the Dream encode oracle: naive
 * O(n^2) DFT, plenty for a few hundred 1024-pt OFDM symbols. */
#ifdef __cplusplus
extern "C" {
#endif
typedef float fftwf_complex[2];
typedef struct fftwf_plan_s *fftwf_plan;
#define FFTW_FORWARD  (-1)
#define FFTW_BACKWARD (+1)
#define FFTW_R2HC 0
#define FFTW_HC2R 1
#define FFTW_ESTIMATE (1U << 6)
#define FFTW_DESTROY_INPUT (1U << 0)
fftwf_plan fftwf_plan_dft_1d(int n, fftwf_complex *in,
                             fftwf_complex *out, int sign,
                             unsigned flags);
fftwf_plan fftwf_plan_r2r_1d(int n, float *in, float *out,
                             int kind, unsigned flags);
void fftwf_execute(const fftwf_plan p);
void fftwf_destroy_plan(fftwf_plan p);
#ifdef __cplusplus
}
#endif
#endif
"""

_FFTW_C = r"""
#include "fftw3.h"
#include <stdlib.h>
#include <math.h>

struct fftwf_plan_s {
    int n, sign, kind, r2r;
    fftwf_complex *ci, *co;
    float *ri, *ro;
};

fftwf_plan fftwf_plan_dft_1d(int n, fftwf_complex *in,
                             fftwf_complex *out, int sign,
                             unsigned flags)
{
    (void)flags;
    struct fftwf_plan_s *p = (struct fftwf_plan_s *)calloc(1, sizeof *p);
    p->n = n; p->sign = sign; p->ci = in; p->co = out; p->r2r = 0;
    return p;
}

fftwf_plan fftwf_plan_r2r_1d(int n, float *in, float *out, int kind,
                             unsigned flags)
{
    (void)flags;
    struct fftwf_plan_s *p = (struct fftwf_plan_s *)calloc(1, sizeof *p);
    p->n = n; p->kind = kind; p->ri = in; p->ro = out; p->r2r = 1;
    return p;
}

void fftwf_execute(const fftwf_plan p)
{
    int n = p->n, k, t;
    if (!p->r2r) {
        double *acc = (double *)malloc(sizeof(double) * 2 * n);
        for (k = 0; k < n; k++) {
            double sr = 0, si = 0;
            for (t = 0; t < n; t++) {
                double ang = p->sign * 2.0 * M_PI * (double)k * t / n;
                double c = cos(ang), s = sin(ang);
                double xr = p->ci[t][0], xi = p->ci[t][1];
                sr += xr * c - xi * s;
                si += xr * s + xi * c;
            }
            acc[2 * k] = sr; acc[2 * k + 1] = si;
        }
        for (k = 0; k < n; k++) {
            p->co[k][0] = (float)acc[2 * k];
            p->co[k][1] = (float)acc[2 * k + 1];
        }
        free(acc);
    } else if (p->kind == FFTW_R2HC) {
        /* halfcomplex: r0..r_{n/2}, i_{(n+1)/2-1}..i_1 */
        double *acc = (double *)malloc(sizeof(double) * 2 * (n / 2 + 1));
        for (k = 0; k <= n / 2; k++) {
            double sr = 0, si = 0;
            for (t = 0; t < n; t++) {
                double ang = -2.0 * M_PI * (double)k * t / n;
                sr += p->ri[t] * cos(ang);
                si += p->ri[t] * sin(ang);
            }
            acc[2 * k] = sr; acc[2 * k + 1] = si;
        }
        for (k = 0; k <= n / 2; k++)
            p->ro[k] = (float)acc[2 * k];
        for (k = 1; k < (n + 1) / 2; k++)
            p->ro[n - k] = (float)acc[2 * k + 1];
        free(acc);
    } else {  /* HC2R */
        for (t = 0; t < n; t++) {
            double s = p->ri[0];
            for (k = 1; k < (n + 1) / 2; k++) {
                double ang = 2.0 * M_PI * (double)k * t / n;
                s += 2.0 * (p->ri[k] * cos(ang)
                            - p->ri[n - k] * sin(ang));
            }
            if (n % 2 == 0) {
                double ang = 2.0 * M_PI * (double)(n / 2) * t / n;
                s += p->ri[n / 2] * cos(ang);
            }
            p->ro[t] = (float)s;
        }
    }
}

void fftwf_destroy_plan(fftwf_plan p) { free(p); }
"""

# Parameter.cpp touches CDRMReceiver only through a nullptr-guarded
# pointer; a stub class keeps the whole receiver stack out.
_DRMRECEIVER_H = r"""
#ifndef DRM_ORACLE_DRMRECEIVER_SHIM_H
#define DRM_ORACLE_DRMRECEIVER_SHIM_H
/* ERecMode comes from Parameter.h, which Parameter.cpp includes
 * before this shim */
class CDRMReceiver
{
public:
    ERecMode GetReceiverMode() { return RM_DRM; }
    void InitsForAudParam() {}
    void InitsForDataParam() {}
    void InitsForInterlDepth() {}
    void InitsForMSC() {}
    void InitsForMSCCodSche() {}
    void InitsForMSCDemux() {}
    void InitsForNoDecBitsSDC() {}
    void InitsForSDCCodSche() {}
    void InitsForSpectrumOccup() {}
    void InitsForWaveMode() {}
};
#endif
"""

_SHIM_HEADERS = {
    "fftw3.h": _FFTW_H,
    # kiwi host-integration headers pulled in by the vendored tree
    "DRM_main.h": "#include <cstdio>\n"
                  "#define drm_next_task(s) do {} while (0)\n"
                  "#define MEASURE_TIME(a, b, expr) "
                  "do { expr; } while (0)\n",
    "printf.h": "#include <cstdio>\n#include <cstdlib>\n"
                "#define kiwi_exit exit\n",
    "kiwi_assert.h": "#include <cassert>\n",
}

with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "drm_oracle_main.cpp")) as _f:
    _MAIN_CPP = _f.read()


def build(verbose: bool = False) -> str | None:
    """Compile the oracle (cached); returns exe path or None."""
    if os.path.exists(EXE):
        return EXE
    os.makedirs(BUILD, exist_ok=True)
    for name, text in _SHIM_HEADERS.items():
        with open(os.path.join(BUILD, name), "w") as f:
            f.write(text)
    with open(os.path.join(BUILD, "fftw_shim.c"), "w") as f:
        f.write(_FFTW_C)
    with open(os.path.join(BUILD, "main.cpp"), "w") as f:
        f.write(_MAIN_CPP)
    with open(os.path.join(BUILD, "DRMReceiver.h"), "w") as f:
        f.write(_DRMRECEIVER_H)
    # Parameter.cpp compiled FROM the build dir so the stub
    # DRMReceiver.h (same dir) wins the quoted-include search
    with open(os.path.join(DREAM, "Parameter.cpp")) as f:
        par = f.read()
    with open(os.path.join(BUILD, "Parameter.cpp"), "w") as f:
        f.write(par)
    srcs = [os.path.join(BUILD, "main.cpp"),
            os.path.join(BUILD, "Parameter.cpp"),
            os.path.join(BUILD, "fftw_shim.c")]
    srcs += [os.path.join(DREAM, s) for s in _SRCS]
    cmd = (["g++", "-O2", "-w", "-std=c++11", "-DHAVE_STDINT_H=1",
            "-I", BUILD, "-I", DREAM, "-o", EXE]
           + srcs + ["-lm"])
    try:
        r = subprocess.run(cmd, capture_output=True, timeout=600,
                           text=True)
    except (FileNotFoundError, subprocess.TimeoutExpired):
        return None
    if r.returncode != 0:
        if verbose:
            print(r.stderr[-8000:])
        return None
    return EXE


def generate(out_path: str, n_superframes: int = 5,
             interleaver: str = "short") -> dict | None:
    """Run the oracle: writes interleaved float32 (re,im) pairs at
    48 kHz (signal centered at the 6 kHz virtual IF) to ``out_path``;
    returns the manifest (service id/label, per-frame MSC payload hex,
    stream length) parsed from its stdout.  ``interleaver`` selects
    Dream's SI_SHORT (400 ms) or SI_LONG (2 s, D=5) MSC cell
    interleaving."""
    exe = build()
    if exe is None:
        return None
    r = subprocess.run([exe, out_path, str(n_superframes),
                        interleaver],
                       capture_output=True, text=True, timeout=300)
    if r.returncode != 0:
        return None
    man: dict = {"msc_frames": []}
    for line in r.stdout.splitlines():
        k, _, v = line.partition("=")
        if k == "msc":
            man["msc_frames"].append(bytes.fromhex(v))
        elif k in ("service_id", "stream_len_b", "n_frames",
                   "sample_rate", "if_hz"):
            man[k] = int(v, 0)
        else:
            man[k] = v
    return man


if __name__ == "__main__":
    import sys
    path = build(verbose=True)
    print("exe:", path)
    if path and len(sys.argv) > 1:
        print(generate(sys.argv[1]))
