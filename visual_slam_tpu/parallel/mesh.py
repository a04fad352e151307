"""Device-mesh helpers."""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(axis_names=("seq", "lm"), shape=None, devices=None) -> Mesh:
    """Build a mesh over the available devices.

    Default factorization puts sequences (data parallel) on the first axis
    and landmark shards (BA model parallel) on the second; with a single
    axis name the mesh is 1-D over all devices.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if isinstance(axis_names, str):
        axis_names = (axis_names,)
    if shape is None:
        if len(axis_names) == 1:
            shape = (n,)
        else:
            # Split into two roughly-square factors.
            a = 1
            for f in range(int(np.sqrt(n)), 0, -1):
                if n % f == 0:
                    a = f
                    break
            shape = (a, n // a) + (1,) * (len(axis_names) - 2)
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names)
