"""DRM cell mapping vs the reference algorithm, value for value.

`_reference_make_table` below is a literal Python transcription of
Dream's `CCellMappingTable::MakeTable`
(`/root/reference/extensions/DRM/dream/OFDMcellmapping/CellMappingTable.cpp:41-496`,
the ETSI ES 201 980 section 8.4 algorithm): per-carrier scan with FAC
counter, scattered-pilot counter seeding, phase formula, precedence
rules.  The package's vectorized builder (`drm_tables.make_cell_map`)
must reproduce its kinds matrix and pilot values exactly for every
supported (mode, spectrum occupancy)."""

import numpy as np
import pytest

from flydog_sdr_gps_tpu.extensions import drm_tables as dt


def _reference_make_table(mode: str, so: int):
    """Literal transcription of Dream MakeTable (scan order, counters,
    truncating division) — deliberately NOT sharing code with the
    package builder."""
    x, y, k0 = dt.SCAT_CONST[mode]
    w = dt.SCAT_W[mode]
    z = dt.SCAT_Z[mode]
    q = dt.SCAT_Q[mode]
    col = {"A": 0, "B": 1, "C": 2, "D": 3}[mode]
    kmin = dt.CARRIER_KMIN[so][col]
    kmax = dt.CARRIER_KMAX[so][col]
    nsym_frame = dt.MODE_NUMEROLOGY[mode][3]
    nsym_super = nsym_frame * 3
    ncar = kmax - kmin + 1
    fac = dt.FAC_CELLS[mode]
    timepil = dt.TIME_PILOTS[mode]
    freqpil = dt.FREQ_PILOTS[mode]
    gain = dt.SCAT_GAIN[mode][so]
    kinds = np.zeros((nsym_super, ncar), np.int32)
    pilots = np.zeros((nsym_super, ncar), np.complex128)

    def polar(amp, ph):
        return amp * np.exp(2j * np.pi * (ph % 1024) / 1024.0)

    def trunc_div(a, b):
        return int(a / b)            # C float-to-int truncation

    fac_counter = 0
    time_counter = 0
    freq_counter = 0
    ntime = len(timepil)
    for isym in range(nsym_super):
        fsym = isym % nsym_frame
        if fsym == 0:
            fac_counter = 0
        scat_counter = trunc_div(
            kmin - int(x / 2 + 0.5) - x * (fsym % y), x * y)
        for car in range(kmin, kmax + 1):
            i = car - kmin
            kinds[isym][i] = dt.CM_MSC
            if mode in ("A", "B"):
                if isym in (0, 1):
                    kinds[isym][i] = dt.CM_SDC
            else:
                if isym in (0, 1, 2):
                    kinds[isym][i] = dt.CM_SDC
            if fac_counter < dt.NUM_FAC_CELLS:
                fs_, fk = fac[fac_counter]
                if fs_ * ncar + fk == fsym * ncar + car:
                    fac_counter += 1
                    kinds[isym][i] = dt.CM_FAC
            # scattered pilots
            if car == int(x / 2 + 0.5) + x * ((fsym % y)) + \
                    x * y * scat_counter:
                scat_counter += 1
                kinds[isym][i] = dt.CM_SCAT_PI
                inn = fsym % y
                im = int(fsym / y)
                ip = trunc_div(car - k0 - inn * x, x * y)
                ph = (4 * z[inn][im] + ip * w[inn][im]
                      + ip * ip * (1 + fsym) * q) % 1024
                boosted = car in gain
                if boosted:
                    pilots[isym][i] = polar(2.0, ph)
                    kinds[isym][i] |= dt.CM_BOOSTED_PI
                else:
                    pilots[isym][i] = polar(np.sqrt(2.0), ph)
            # time pilots
            if fsym == 0:
                tk, tph = timepil[time_counter]
                if tk == car:
                    if kinds[isym][i] & dt.CM_SCAT_PI:
                        kinds[isym][i] |= dt.CM_TI_PI
                    else:
                        kinds[isym][i] = dt.CM_TI_PI
                    pilots[isym][i] = polar(np.sqrt(2.0), tph)
                    time_counter = (time_counter + 1) % ntime
            # freq pilots
            pk, pph = freqpil[freq_counter]
            if pk == car:
                if kinds[isym][i] & (dt.CM_TI_PI | dt.CM_SCAT_PI):
                    kinds[isym][i] |= dt.CM_FRE_PI
                else:
                    kinds[isym][i] = dt.CM_FRE_PI
                special = (mode == "D" and freq_counter != 2
                           and fsym % 2 == 1)
                pilots[isym][i] = polar(
                    np.sqrt(2.0), (pph + 512) % 1024 if special else pph)
                freq_counter = (freq_counter + 1) % 3
            if car == 0:
                kinds[isym][i] = dt.CM_DC
                pilots[isym][i] = 0.0
            if mode == "A" and car in (-1, 1):
                kinds[isym][i] = dt.CM_DC
                pilots[isym][i] = 0.0
    return kinds, pilots


@pytest.mark.parametrize("mode,so", [
    ("A", 3), ("B", 2), ("B", 3), ("C", 3), ("D", 3), ("B", 0),
    ("A", 5), ("B", 5), ("C", 5), ("D", 5)])
def test_cell_map_matches_reference_algorithm(mode, so):
    cm = dt.make_cell_map(mode, so)
    kinds, pilots = _reference_make_table(mode, so)
    assert cm.kinds.shape == kinds.shape
    mism = np.argwhere(cm.kinds != kinds)
    assert mism.size == 0, (mode, so, mism[:10],
                            cm.kinds[tuple(mism[0])] if mism.size else 0,
                            kinds[tuple(mism[0])] if mism.size else 0)
    assert np.allclose(cm.pilots, pilots, atol=1e-12), (mode, so)


def test_mode_b_so3_known_structure():
    """Spot checks against the ETSI / Dream table values directly."""
    cm = dt.make_cell_map("B", 3)
    assert (cm.kmin, cm.kmax) == (-103, 103)
    assert cm.tu == 256 and cm.guard == 64           # 12 kHz mode B
    assert cm.syms_per_frame == 15
    # 65 FAC cells per frame at the table positions
    fac_pos = [(s % 15, k) for s in range(15, 30)
               for k in cm.cells_of(dt.CM_FAC, s)]
    assert tuple(fac_pos) == dt.FAC_CELLS["B"]
    # frequency pilots at 16/48/64 in every symbol with table phases
    for sym in (0, 7, 29, 44):
        for (k, ph) in dt.FREQ_PILOTS["B"]:
            v = cm.pilots[sym, k - cm.kmin]
            assert np.isclose(np.angle(v),
                              np.angle(np.exp(2j * np.pi * ph / 1024)),
                              atol=1e-9), (sym, k)
    # known cell counts: SDC = 322 cells (mode B, 10 kHz channel),
    # MSC cells per superframe consistent with N_MUX ~ 2337/frame
    assert cm.count(dt.CM_SDC) == 322
    assert cm.count(dt.CM_FAC) == 3 * 65
    assert 3 * 2337 <= cm.count(dt.CM_MSC) <= 3 * 2338
    # boosted pilots only at the four edge carriers
    boosted = set()
    for sym in range(cm.syms_per_super):
        boosted |= set(cm.cells_of(dt.CM_BOOSTED_PI, sym).tolist())
    assert boosted == {-103, -101, 101, 103}
    # scattered pilots follow k ≡ 1 + 2*(s mod 3) (mod 6)
    for sym in (0, 1, 2, 3, 16, 31):
        ks = cm.cells_of(dt.CM_SCAT_PI, sym)
        assert all((k - 1 - 2 * (sym % 15 % 3)) % 6 == 0 for k in ks)
