"""EiBi shortwave-schedule database loader.

Reference: `pkgs/EiBi/` ships the EiBi HF broadcast/utility schedule
(semicolon CSV, one row per transmission:
``kHz;Time(UTC);Days;ITU;Station;Lng;Target;Remarks;P;Start;Stop``),
preprocessed by `pkgs/EiBi/eibi_proc.cpp` into `EiBi.h` and merged
into the DX label layer by `init/dx.cpp:768-800` (dx_eibi_init).

Here the CSV parses directly into :class:`~.dx.DxLabel` rows; a
converted snapshot ships as ``flydog_sdr_gps_tpu/data/eibi.json``
(DATA, not code: the EiBi list is Eike Bierwirth's freely
redistributable schedule, via the reference's
`pkgs/EiBi/sked-current.csv`) so a fresh install shows thousands of
real station labels instead of three synthetic ones.
"""

from __future__ import annotations

import json
import os

from .dx import DxDatabase, DxLabel

DATA_JSON = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "data", "eibi.json")


def _mode_of(station: str, remarks: str) -> str:
    """Mode heuristic like the reference's EiBi type mapping
    (eibi_proc.cpp categories): schedules are AM broadcast unless the
    entry marks a utility emission."""
    s = (station + " " + remarks).upper()
    if "ALE" in s:
        return "usb"
    if "-CW" in s or " CW" in s:
        return "cw"
    if "RTTY" in s or "FSK" in s or "NAVTEX" in s or "DGPS" in s:
        return "usb"
    if "FAX" in s:
        return "usb"
    if "VOLMET" in s or "USB" in s:
        return "usb"
    return "am"


def parse_csv(path: str, max_rows: int | None = None) -> list[DxLabel]:
    """Parse an EiBi kiwi-format CSV into labels (header skipped)."""
    out = []
    # current files are UTF-8; older seasons were latin-1
    with open(path, "rb") as f:
        raw = f.read()
    try:
        text = raw.decode("utf-8")
    except UnicodeDecodeError:
        text = raw.decode("latin-1")
    import io
    with io.StringIO(text) as f:
        for ln in f:
            parts = ln.rstrip("\n").split(";")
            if len(parts) < 5:
                continue
            try:
                freq = float(parts[0])
            except ValueError:
                continue                      # header row
            time_utc, days = parts[1], parts[2]
            station = parts[4].strip()
            target = parts[6].strip() if len(parts) > 6 else ""
            notes = time_utc
            if days:
                notes += " " + days
            if target:
                notes += " → " + target
            out.append(DxLabel(freq_khz=freq,
                               mode=_mode_of(station,
                                             parts[7] if len(parts) > 7
                                             else ""),
                               ident=station, notes=notes))
            if max_rows and len(out) >= max_rows:
                break
    out.sort(key=lambda l: l.freq_khz)
    return out


def convert_csv_to_json(csv_path: str, json_path: str = DATA_JSON
                        ) -> int:
    labels = parse_csv(csv_path)
    os.makedirs(os.path.dirname(json_path), exist_ok=True)
    with open(json_path, "w") as f:
        json.dump({"dx": [l.to_json() for l in labels]}, f,
                  separators=(",", ":"))
    return len(labels)


def load_builtin(db: DxDatabase) -> int:
    """Merge the shipped snapshot into ``db`` (keeps user labels);
    returns the number of EiBi labels added (0 if no snapshot)."""
    if not os.path.exists(DATA_JSON):
        return 0
    with open(DATA_JSON) as f:
        rows = json.load(f)["dx"]
    labels = [DxLabel.from_json(r) for r in rows]
    with db._lock:
        db.labels = sorted(db.labels + labels,
                           key=lambda l: l.freq_khz)
        db.seq += 1
    return len(labels)
