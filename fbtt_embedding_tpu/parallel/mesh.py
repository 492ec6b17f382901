"""Device-mesh helpers for multi-chip TT-embedding sharding.

The reference is single-GPU (SURVEY §2.6: no distributed components exist);
this layer is net-new, designed per the TPU north star: TT cores + hot-row
cache sharded across chips over ICI, pooled embedding exchange via
all_to_all, dense tower data-parallel.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    shape: Optional[Tuple[int, ...]] = None,
    axis_names: Sequence[str] = ("dp", "mp"),
    devices=None,
) -> Mesh:
    """Build a mesh over the available devices.

    Default layout: 2-D ('dp', 'mp') with mp as the inner (fastest-ICI)
    axis — table/model parallel traffic (all_to_all) rides the innermost
    ring. With no shape given, devices split evenly: mp gets the largest
    power-of-two factor <= sqrt(n), dp the rest.
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if shape is None:
        if len(axis_names) == 1:
            shape = (n,)
        else:
            mp = 1
            while mp * 2 <= int(np.sqrt(n)) + 1 and n % (mp * 2) == 0:
                mp *= 2
            shape = (n // mp, mp)
    assert int(np.prod(shape)) == n, (shape, n)
    return Mesh(devices.reshape(shape), tuple(axis_names[: len(shape)]))
