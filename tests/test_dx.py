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
    # utility heuristics: ALE/CW entries are not AM
    cw = [l for l in db.labels if "-CW" in l.ident.upper()
          or " CW" in l.ident.upper()]
    assert cw and all(l.mode == "cw" for l in cw)
