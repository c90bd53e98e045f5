"""On-device RandomErasing (timm-port parity, jittable).

Reference: datasets/random_erasing.py (195 LoC): erase a random rectangle
with per-pixel gaussian noise ('pixel' mode) / constant, probability
``probability``, area ratio (0.02, 1/3), aspect (0.3, 1/0.3), after
normalization. Video modes (reference RandomErasing cube/frame splits):
'cube' erases the same region across all frames of a clip.

jit-friendly: the rectangle is sampled once (no retry loop — the area/aspect
draw is clamped into bounds, hitting the same distribution except for rare
extreme draws) and applied with a coordinate mask.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp


def random_erasing(
    rng,
    clip: jnp.ndarray,  # (T, H, W, C) float (already normalized)
    probability: float = 0.25,
    min_area: float = 0.02,
    max_area: float = 1 / 3,
    min_aspect: float = 0.3,
    mode: str = "pixel",
    cube: bool = True,
) -> jnp.ndarray:
    t, h, w, c = clip.shape
    k_p, k_area, k_asp, k_i, k_j, k_noise = jax.random.split(rng, 6)

    area = h * w
    target = area * jax.random.uniform(k_area, (), minval=min_area, maxval=max_area)
    log_asp = jax.random.uniform(
        k_asp, (), minval=math.log(min_aspect), maxval=math.log(1 / min_aspect)
    )
    aspect = jnp.exp(log_asp)
    eh = jnp.clip(jnp.round(jnp.sqrt(target * aspect)), 1, h - 1).astype(jnp.int32)
    ew = jnp.clip(jnp.round(jnp.sqrt(target / aspect)), 1, w - 1).astype(jnp.int32)
    i = jax.random.randint(k_i, (), 0, h)
    j = jax.random.randint(k_j, (), 0, w)
    i = jnp.minimum(i, h - eh)
    j = jnp.minimum(j, w - ew)

    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    region = (ys >= i) & (ys < i + eh) & (xs >= j) & (xs < j + ew)  # (H, W)

    if mode == "pixel":
        fill = jax.random.normal(k_noise, clip.shape, clip.dtype)
    elif mode == "const":
        fill = jnp.zeros_like(clip)
    else:
        raise ValueError(mode)

    if not cube:
        # independent region per frame: fold frame index into the key
        def per_frame(fr, key):
            return random_erasing(
                key, fr[None], probability=1.0, mode=mode, cube=True
            )[0]

        keys = jax.random.split(k_noise, t)
        erased = jax.vmap(per_frame)(clip, keys)
    else:
        erased = jnp.where(region[None, :, :, None], fill, clip)

    do = jax.random.bernoulli(k_p, probability)
    return jnp.where(do, erased, clip)
