"""Device mesh construction.

The reference's distributed runtime is torch.distributed/NCCL process groups
(utils.py:372-447). TPU-native equivalent: a single-controller
``jax.sharding.Mesh``; collectives are emitted by XLA over ICI. Axes:

* ``data``: batch / DP (gradients psum'd by pjit); also the ring axis for
  the SigLIP contrastive exchange (ICI is physically a torus, so the
  reference's hand-written NCCL ring rides the native topology here).
* ``model`` (optional): reserved for tensor/sequence sharding of the patch
  axis — temporal attention has no cross-patch interaction (SURVEY §5.7).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if data is None:
        data = len(devices) // model
    assert data * model <= len(devices), (data, model, len(devices))
    arr = np.array(devices[: data * model]).reshape(data, model)
    return Mesh(arr, ("data", "model"))
