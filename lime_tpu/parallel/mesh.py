"""Device mesh construction."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(n_devices: Optional[int] = None,
              axes: Tuple[str, str] = ("sp", "dp"),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    """Build a 2D (sp, dp) mesh over the first ``n_devices`` devices.

    Default shape puts the larger factor on ``sp`` (the position stream is
    the long dimension).  A single device yields a degenerate 1x1 mesh so
    the sharded pipeline also runs unmodified on one chip.
    """
    devices = jax.devices()
    n = len(devices) if n_devices is None else n_devices
    devices = devices[:n]
    if shape is None:
        dp = 1
        for cand in range(int(np.sqrt(n)), 0, -1):
            if n % cand == 0:
                dp = cand
                break
        shape = (n // dp, dp)
    arr = np.asarray(devices).reshape(tuple(shape))
    return Mesh(arr, axes)
