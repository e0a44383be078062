"""Device-mesh construction helpers."""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(shape=None, axis_names=("cells",), devices=None) -> Mesh:
    """Build a Mesh over the available devices.

    ``shape=None`` puts all devices on the first axis.  For multi-axis
    meshes pass e.g. shape=(4, 2), axis_names=('cells', 'ap').
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    assert int(np.prod(shape)) == n, (shape, n)
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def default_mesh(axis_name="cells") -> Mesh:
    return make_mesh(axis_names=(axis_name,))
