"""DX label database: storage, range query, edits."""

from flydog_sdr_gps_tpu.utils.dx import DxDatabase, DxLabel


def test_dx_round_trip(tmp_path):
    p = tmp_path / "dx.json"
    db = DxDatabase(str(p))
    db.upsert(DxLabel(7100.0, "lsb", "40m net"))
    db.upsert(DxLabel(14230.0, "usb", "SSTV"))
    db.upsert(DxLabel(9980.0, "am", "WWCR"))
    db.save()

    db2 = DxDatabase(str(p))
    assert [l.freq_khz for l in db2.labels] == [7100.0, 9980.0, 14230.0]
    got = db2.in_range(9000.0, 14500.0)
    assert [l.ident for l in got] == ["WWCR", "SSTV"]


def test_dx_upsert_replaces_and_delete():
    db = DxDatabase()
    db.upsert(DxLabel(7100.0, "lsb", "net"))
    db.upsert(DxLabel(7100.0, "usb", "net"))      # same freq+ident
    assert len(db.labels) == 1 and db.labels[0].mode == "usb"
    seq = db.seq
    assert db.delete(7100.0) == 1
    assert db.labels == [] and db.seq == seq + 1


def test_eibi_builtin_database():
    """The shipped EiBi snapshot (pkgs/EiBi analogue): thousands of
    real labels, sorted, queryable by span, with mode heuristics."""
    from flydog_sdr_gps_tpu.utils import eibi
    from flydog_sdr_gps_tpu.utils.dx import DxDatabase
    db = DxDatabase()
    n = eibi.load_builtin(db)
    assert n > 10000
    labels = db.in_range(7200, 7600)          # 41 m broadcast band
    assert len(labels) > 50
    freqs = [l.freq_khz for l in labels]
    assert freqs == sorted(freqs)
    assert all(7200 <= f <= 7600 for f in freqs)
    assert any(l.mode == "am" and l.ident for l in labels)
    # typed classification: RTTY/FSK utilities are CW-class, not AM
    # (a plain " CW" substring test would wrongly catch e.g.
    # "San Francisco Radio CWP", an aero station — the old heuristic
    # bug the eibi_proc.cpp mapping fixed)
    fsk = [l for l in db.labels if "RTTY" in l.ident]
    assert fsk and all(l.mode == "cw" for l in fsk)
    aero = [l for l in db.labels if "Volmet" in l.ident]
    assert aero and all(l.mode == "usb" for l in aero)


def test_eibi_typed_classification():
    """The explicit eibi_proc.cpp category->type/mode mapping
    (pkgs/EiBi/eibi_proc.cpp:379-459) replaced the name-substring
    heuristic: utility stations get correct modes."""
    from flydog_sdr_gps_tpu.utils.eibi import classify
    assert classify(6604.0, "New York Volmet", "E") == ("aero", "usb")
    assert classify(8416.5, "Tokyo RTTY", "") == ("fsk", "cw")
    assert classify(4271.0, "XSQ ALE", "") == ("ale", "usb")
    assert classify(7880.0, "HM01 Spy Numbers", "S") == ("spy", "usb")
    assert classify(2187.5, "Lyngby Radio", "") == ("marine", "usb")
    assert classify(6000.0, "Radio Habana Cuba", "S") == \
        ("bcast", "am")
    assert classify(3330.0, "CHU", "-TS") == ("time", "amn")
    assert classify(77.5, "DCF77", "-TS") == ("time", "cw")
    assert classify(10000.0, "WWV", "-TS") == ("time", "amn")
    assert classify(11318.0, "Shanwick Radio", "E") == ("aero", "usb")
    assert classify(13270.0, "Gander Aeradio", "") == ("aero", "usb")
    # -CW / -TY language markers
    assert classify(4202.0, "DAN", "-CW")[1] == "cw"
    assert classify(7646.0, "DDK3 Fax", "-TY") == ("fax", "usb")
