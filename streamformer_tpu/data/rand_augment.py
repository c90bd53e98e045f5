"""On-device RandAugment for video clips.

Rebuild of the reference's timm-ported PIL RandAugment
(datasets/rand_augment.py, 514 LoC) as jittable XLA ops: the policy
(op set, magnitude mapping, config-string parsing like
``rand-m7-n4-mstd0.5-inc1``) matches the reference; pixel math runs on
device via streamformer_tpu.data.transforms (PIL-semantic color ops exact;
geometric ops bilinear inverse-warp with fill=128).

Per-clip application: one sampled (ops, magnitudes) per clip applied to all
frames — matching the reference, which builds one PIL transform per clip and
maps it over frames (datasets/kinetics_sparse.py:330-340).
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from streamformer_tpu.data import transforms as T

_MAX_LEVEL = 10.0

# default RandAugment op set (reference rand_augment.py _RAND_TRANSFORMS)
RAND_TRANSFORMS = [
    "AutoContrast",
    "Equalize",
    "Invert",
    "Rotate",
    "Posterize",
    "Solarize",
    "SolarizeAdd",
    "Color",
    "Contrast",
    "Brightness",
    "Sharpness",
    "ShearX",
    "ShearY",
    "TranslateXRel",
    "TranslateYRel",
]

# ops with increasing-severity magnitude mapping when inc=1
# (reference rand_augment.py _RAND_INCREASING_TRANSFORMS)
_POSTERIZE_INC = True


def _randomly_negate(rng, v):
    return jnp.where(jax.random.bernoulli(rng, 0.5), -v, v)


def _apply_op(name: str, x, level, rng, hparams):
    """x: (T,H,W,C) float [0,255]; level: traced scalar in [0,10]."""
    m = level / _MAX_LEVEL
    inc = hparams.get("inc", True)
    if name == "AutoContrast":
        return T.autocontrast(x)
    if name == "Equalize":
        return T.equalize(x)
    if name == "Invert":
        return T.invert(x)
    if name == "Rotate":
        deg = _randomly_negate(rng, m * 30.0)
        return T.rotate(x, deg)
    if name == "Posterize":
        # timm increasing: 4 - int(level/max*4) bits removed -> bits kept 4..8
        if inc:
            bits = 4 - jnp.floor(m * 4).astype(jnp.int32) + 4
        else:
            bits = jnp.floor(m * 4).astype(jnp.int32) + 4
        return T.posterize(x, bits)
    if name == "Solarize":
        thr = 256.0 - m * 256.0 if inc else m * 256.0
        return T.solarize(x, thr)
    if name == "SolarizeAdd":
        return T.solarize_add(x, m * 110.0)
    if name == "Color":
        f = 1.0 + _randomly_negate(rng, m * 0.9)
        return T.adjust_saturation(x, f)
    if name == "Contrast":
        f = 1.0 + _randomly_negate(rng, m * 0.9)
        return T.adjust_contrast(x, f)
    if name == "Brightness":
        f = 1.0 + _randomly_negate(rng, m * 0.9)
        return T.adjust_brightness(x, f)
    if name == "Sharpness":
        f = 1.0 + _randomly_negate(rng, m * 0.9)
        return T.adjust_sharpness(x, f)
    if name == "ShearX":
        return T.shear_x(x, _randomly_negate(rng, m * 0.3))
    if name == "ShearY":
        return T.shear_y(x, _randomly_negate(rng, m * 0.3))
    if name == "TranslateXRel":
        return T.translate_x(x, _randomly_negate(rng, m * 0.45) * x.shape[2])
    if name == "TranslateYRel":
        return T.translate_y(x, _randomly_negate(rng, m * 0.45) * x.shape[1])
    raise ValueError(name)


def parse_config(config_str: str) -> Dict:
    """Parse ``rand-m7-n4-mstd0.5-inc1`` (reference
    rand_augment_transform, rand_augment.py:466)."""
    parts = config_str.split("-")
    assert parts[0] == "rand", config_str
    cfg = {"magnitude": 10.0, "num_layers": 2, "mstd": 0.0, "inc": False, "p": 0.5}
    for p in parts[1:]:
        m = re.match(r"([a-z]+)([0-9.]+)", p)
        if not m:
            continue
        key, val = m.group(1), float(m.group(2))
        if key == "m":
            cfg["magnitude"] = val
        elif key == "n":
            cfg["num_layers"] = int(val)
        elif key == "mstd":
            cfg["mstd"] = val
        elif key == "inc":
            cfg["inc"] = bool(val)
        elif key == "p":
            cfg["p"] = val
    return cfg


def rand_augment(
    rng,
    clip: jnp.ndarray,
    config_str: str = "rand-m7-n4-mstd0.5-inc1",
    ops: Optional[List[str]] = None,
    op_indices: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Apply RandAugment to one clip (T,H,W,C) uint8/float -> float [0,255].

    num_layers ops chosen uniformly (with replacement, timm semantics), each
    applied with prob 0.5; magnitude jittered by N(0, mstd).

    jit note: op choice is data-dependent -> implemented with
    ``jax.lax.switch`` over the op table; every branch is compiled once.

    TPU note: under ``vmap`` a per-sample (batched) switch index makes XLA
    execute EVERY branch for every sample and select — ~30x the work
    (measured ~22 fps for the full augment at batch 8). Pass ``op_indices``
    ((num_layers,) int32 drawn OUTSIDE the vmap, shared across the batch) to
    keep the index unbatched so only the chosen branch runs; per-sample
    magnitude jitter and apply-probability keep their diversity.
    """
    cfg = parse_config(config_str)
    ops = ops or RAND_TRANSFORMS
    x = clip.astype(jnp.float32) if clip.dtype != jnp.float32 else clip

    hparams = {"inc": cfg["inc"]}
    branches = [
        (lambda name: (lambda operand: _apply_op(name, operand[0], operand[1], operand[2], hparams)))(n)
        for n in ops
    ]

    def layer(x, rng, i):
        k_op, k_mag, k_apply, k_neg = jax.random.split(rng, 4)
        if op_indices is not None:
            op_idx = op_indices[i]
        else:
            op_idx = jax.random.randint(k_op, (), 0, len(ops))
        mag = cfg["magnitude"]
        if cfg["mstd"] > 0:
            mag = mag + cfg["mstd"] * jax.random.normal(k_mag)
        level = jnp.clip(mag, 0.0, _MAX_LEVEL)
        out = jax.lax.switch(op_idx, branches, (x, level, k_neg))
        apply = jax.random.bernoulli(k_apply, cfg["p"])
        return jnp.where(apply, out, x)

    for i in range(cfg["num_layers"]):
        rng, sub = jax.random.split(rng)
        x = layer(x, sub, i)
    return jnp.clip(x, 0.0, 255.0)
