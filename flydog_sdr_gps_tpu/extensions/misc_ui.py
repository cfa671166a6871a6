"""Client-side / preset extensions.

Several reference extensions have no server-side DSP at all — their
`ext_register()` entry just names a JS bundle (`extensions/ext.cpp`
registry): **colormap**, **iframe**, **prefs**, **devl**, **example**,
and **waterfall** (the scope view).  **digi_modes** is a preset layer
over the FSK machinery; **s4285** (MIL-STD PSK modem) and **DRM**
register here as placeholders pending their decoder families.

They are registered here so the EXT-stream inventory matches the
reference's; each serves whatever tiny server behavior it has
(preference storage, preset application).
"""

from __future__ import annotations

import json

from . import Extension, ext_register
from .fsk import FskExt


@ext_register
class ColormapExt(Extension):
    """Client-side only (waterfall palette editor)."""
    name = "colormap"


@ext_register
class IframeExt(Extension):
    """Client-side only (admin-configured embedded page)."""
    name = "iframe"

    def command(self, cmd: dict) -> list:
        if "get" in cmd:
            url = ""
            cfg = getattr(self.engine, "cfg", None)
            if cfg is not None:
                url = cfg.string("iframe_url", "")
            return [("iframe", url.encode())]
        return []


@ext_register
class PrefsExt(Extension):
    """Per-user preference storage (`extensions/prefs`)."""
    name = "prefs"

    _store: dict = {}

    def command(self, cmd: dict) -> list:
        if "set" in cmd and "key" in cmd:
            self._store[cmd["key"]] = cmd.get("value", "")
            return [("prefs", b"ok")]
        if "get" in cmd and "key" in cmd:
            return [("prefs",
                     str(self._store.get(cmd["key"], "")).encode())]
        if "export" in cmd:
            return [("prefs", json.dumps(self._store).encode())]
        return []


@ext_register
class ExampleExt(Extension):
    """The reference's skeleton extension (`extensions/example`)."""
    name = "example"

    def command(self, cmd: dict) -> list:
        return [("example", b"pong")] if "ping" in cmd else []


@ext_register
class DevlExt(Extension):
    """Developer scratch extension (`extensions/devl`): exposes the
    event-trace ring for live profiling."""
    name = "devl"

    def command(self, cmd: dict) -> list:
        if "trace" in cmd:
            from ..utils.trace import get_trace
            dump = "\n".join(get_trace().dump(int(cmd.get("n", 50))))
            return [("trace", dump.encode())]
        return []


@ext_register
class WaterfallScopeExt(Extension):
    """`extensions/waterfall` — scope/controls view over the same WF
    data the W/F stream already carries (client-rendered)."""
    name = "waterfall"


@ext_register
class DigiModesExt(FskExt):
    """`extensions/digi_modes` — preset center/shift/baud bundles over
    the FSK demodulator (CW/RTTY/SITOR/ALE presets on the client)."""
    name = "digi_modes"

    PRESETS = {
        "rtty45": dict(center=1000.0, shift=170.0, baud=45.45),
        "rtty50": dict(center=1000.0, shift=170.0, baud=50.0),
        "rtty75": dict(center=1000.0, shift=450.0, baud=75.0),
        "sitorb": dict(center=1000.0, shift=170.0, baud=100.0),
    }

    def command(self, cmd: dict) -> list:
        preset = cmd.get("preset")
        if preset in self.PRESETS:
            self.start(**self.PRESETS[preset])
            return [("digi", preset.encode())]
        return super().command(cmd)
