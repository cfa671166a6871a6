"""Mesh construction helpers."""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(time: int = 1, chan: int | None = None,
              devices=None) -> Mesh:
    """Build a (time, chan) mesh over the available devices.

    ``time`` shards ADC blocks in time (halo-exchange front half);
    ``chan`` shards the DDC channel axis.  Defaults: all devices on the
    channel axis (the production layout — channels are embarrassingly
    parallel).
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if chan is None:
        chan = n // time
    if time * chan != n:
        raise ValueError(f"time*chan = {time}*{chan} != {n} devices")
    arr = np.asarray(devices).reshape(time, chan)
    return Mesh(arr, ("time", "chan"))


def mesh_shape(mesh: Mesh) -> tuple[int, int]:
    return mesh.shape["time"], mesh.shape["chan"]
