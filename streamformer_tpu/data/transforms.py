"""On-device video transforms (jittable XLA ops on uint8/float batches).

TPU-native redesign of the reference CPU transform stack
(datasets/video_transforms.py, 1379 LoC of PIL/torchvision ops +
datasets/volume_transforms.py ClipToTensor): decode happens on host; every
pixel op after raw frames runs on device so clips stream to the encoder
without host round-trips (SURVEY §7 "Preprocessing on device").

Conventions: clips are ``(T, H, W, C)`` uint8 or float32; batches add a
leading B. Augmentation parameters are sampled from a jax PRNG key and are
*per-clip* (constant across the T frames of a clip — video augs must be
temporally consistent, like the reference's Pair*/clip ops).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

IMAGENET_DEFAULT_MEAN = (0.485, 0.456, 0.406)
IMAGENET_DEFAULT_STD = (0.229, 0.224, 0.225)
# SigLIP / reference normalize(0.5) (extract_oad_feature.py:42-48 etc.)
SIGLIP_MEAN = (0.5, 0.5, 0.5)
SIGLIP_STD = (0.5, 0.5, 0.5)


def to_float(clip: jnp.ndarray) -> jnp.ndarray:
    """uint8 [0,255] -> float32 [0,1] (ClipToTensor semantics,
    datasets/volume_transforms.py:15-79, channel order preserved as HWC)."""
    if clip.dtype == jnp.uint8:
        return clip.astype(jnp.float32) / 255.0
    return clip.astype(jnp.float32)


def normalize(clip: jnp.ndarray, mean=SIGLIP_MEAN, std=SIGLIP_STD) -> jnp.ndarray:
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return (to_float(clip) - mean) / std


def to_model_input(clip: jnp.ndarray) -> jnp.ndarray:
    """(T, H, W, C) -> (T, C, H, W), the encoder's pixel_values layout."""
    return jnp.transpose(clip, (0, 3, 1, 2))


def resize(clip: jnp.ndarray, size: Tuple[int, int], method="bilinear"):
    """Resize all frames to (H, W). float output."""
    t, _, _, c = clip.shape
    out = jax.image.resize(
        to_float(clip), (t, size[0], size[1], c),
        method={"bilinear": "linear", "bicubic": "cubic", "nearest": "nearest"}[
            method
        ],
    )
    return out


def resize_short_side(clip: jnp.ndarray, short: int, method="bilinear"):
    """Resize keeping aspect so the short side == ``short`` (static shapes:
    output size computed from the static input shape)."""
    t, h, w, c = clip.shape
    if h <= w:
        nh, nw = short, max(1, int(round(w * short / h)))
    else:
        nh, nw = max(1, int(round(h * short / w))), short
    return resize(clip, (nh, nw), method)


def center_crop(clip: jnp.ndarray, size: Tuple[int, int]):
    t, h, w, c = clip.shape
    th, tw = size
    i, j = (h - th) // 2, (w - tw) // 2
    return clip[:, i : i + th, j : j + tw, :]


def crop_at(clip: jnp.ndarray, i, j, size: Tuple[int, int]):
    """Dynamic-offset crop with static output size (jit-safe)."""
    t, h, w, c = clip.shape
    return jax.lax.dynamic_slice(
        clip, (0, i, j, 0), (t, size[0], size[1], c)
    )


def random_crop(rng, clip: jnp.ndarray, size: Tuple[int, int]):
    t, h, w, c = clip.shape
    ri, rj = jax.random.split(rng)
    i = jax.random.randint(ri, (), 0, h - size[0] + 1)
    j = jax.random.randint(rj, (), 0, w - size[1] + 1)
    return crop_at(clip, i, j, size)


def horizontal_flip(clip: jnp.ndarray):
    return clip[:, :, ::-1, :]


def random_horizontal_flip(rng, clip: jnp.ndarray, p=0.5):
    do = jax.random.bernoulli(rng, p)
    return jnp.where(do, horizontal_flip(clip), clip)


def random_resized_crop(
    rng,
    clip: jnp.ndarray,
    size: Tuple[int, int],
    scale=(0.08, 1.0),
    ratio=(3.0 / 4.0, 4.0 / 3.0),
):
    """Inception-style random resized crop, temporally consistent.

    Reference recipe: spatial_sampling random_resized_crop scale (0.08, 1.0),
    ratio (3/4, 4/3) (datasets/kinetics_sparse.py:355-362,
    video_transforms.py RandomResizedCropAndInterpolation :666).

    Implemented as a crop-box + resize via jax.image.scale_and_translate so
    the output shape is static regardless of the sampled box.
    """
    t, h, w, c = clip.shape
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    area = h * w
    target_area = area * jax.random.uniform(k1, (), minval=scale[0], maxval=scale[1])
    log_ratio = jax.random.uniform(
        k2, (), minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1])
    )
    aspect = jnp.exp(log_ratio)
    cw = jnp.sqrt(target_area * aspect)
    ch = jnp.sqrt(target_area / aspect)
    # clamp to bounds (fallback to max inscribed box instead of retry loop —
    # the reference retries 10x then falls back; a clamp is jit-friendly and
    # hits the same distribution except in rare extreme draws)
    cw = jnp.clip(cw, 8.0, float(w))
    ch = jnp.clip(ch, 8.0, float(h))
    i = jax.random.uniform(k3, (), minval=0.0, maxval=1.0) * (h - ch)
    j = jax.random.uniform(k4, (), minval=0.0, maxval=1.0) * (w - cw)

    x = to_float(clip)
    # map crop box -> output size: scale = out/crop, translate = -box*scale
    sy = size[0] / ch
    sx = size[1] / cw
    out = jax.vmap(
        lambda f: jax.image.scale_and_translate(
            f,
            (size[0], size[1], c),
            (0, 1),
            jnp.stack([sy, sx]),
            jnp.stack([-i * sy, -j * sx]),
            method="linear",
        )
    )(x)
    return out


def random_short_side_scale_jitter(
    rng, clip: jnp.ndarray, min_size: int, max_size: int
):
    """Scale jitter then caller crops (reference
    video_transforms.py random_short_side_scale_jitter). Output short side is
    dynamic in the reference; here we resize to max_size and rely on the
    following random crop — distributionally close and static-shape."""
    return resize_short_side(clip, max_size)


# ---------------------------------------------------------------------------
# color ops (PIL-enhance semantics, used by RandAugment and color jitter)
# ---------------------------------------------------------------------------


def _blend(a, b, factor):
    """PIL ImageEnhance blend: out = b + factor * (a - b), clamped."""
    return jnp.clip(b + factor * (a - b), 0.0, 255.0)


def _gray_luma(x):
    """PIL convert('L') luma (ITU-R 601-2): L = 0.299R + 0.587G + 0.114B."""
    l = x[..., 0] * 0.299 + x[..., 1] * 0.587 + x[..., 2] * 0.114
    return l[..., None]


def adjust_brightness(x, factor):
    """x in [0,255] float. PIL Brightness: blend with black."""
    return _blend(x, jnp.zeros_like(x), factor)


def adjust_contrast(x, factor):
    """PIL Contrast: blend with the mean of the grayscale image."""
    mean = jnp.mean(jnp.round(_gray_luma(x)), axis=(-3, -2, -1), keepdims=True)
    return _blend(x, jnp.broadcast_to(mean, x.shape), factor)


def adjust_saturation(x, factor):
    """PIL Color: blend with grayscale."""
    return _blend(x, jnp.broadcast_to(_gray_luma(x), x.shape), factor)


def adjust_sharpness(x, factor):
    """PIL Sharpness: blend with 3x3 smooth kernel [[1,1,1],[1,5,1],[1,1,1]]/13
    (interior only; PIL keeps the 1-pixel border unfiltered)."""
    kernel = jnp.array([[1, 1, 1], [1, 5, 1], [1, 1, 1]], jnp.float32) / 13.0
    t, h, w, c = x.shape
    xt = jnp.transpose(x, (0, 3, 1, 2)).reshape(t * c, 1, h, w)
    sm = jax.lax.conv_general_dilated(
        xt, kernel[None, None], (1, 1), "SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    sm = sm.reshape(t, c, h, w).transpose(0, 2, 3, 1)
    # PIL leaves the border unfiltered
    border = jnp.ones((h, w, 1), bool).at[1:-1, 1:-1].set(False)
    sm = jnp.where(border, x, sm)
    return _blend(x, sm, factor)


def invert(x):
    return 255.0 - x


def posterize(x, bits):
    """Keep top ``bits`` bits. Integer-exact."""
    xi = x.astype(jnp.uint8)
    shift = (8 - bits).astype(jnp.uint8) if hasattr(bits, "astype") else 8 - bits
    mask = jnp.left_shift(jnp.right_shift(xi, shift), shift)
    return mask.astype(jnp.float32)


def solarize(x, threshold):
    return jnp.where(x >= threshold, 255.0 - x, x)


def solarize_add(x, add, threshold=128.0):
    return jnp.where(x < threshold, jnp.clip(x + add, 0, 255), x)


def autocontrast(x):
    """Per-frame per-channel min/max stretch (PIL autocontrast, cutoff 0)."""
    lo = jnp.min(x, axis=(-3, -2), keepdims=True)
    hi = jnp.max(x, axis=(-3, -2), keepdims=True)
    scale = 255.0 / jnp.maximum(hi - lo, 1e-5)
    out = (x - lo) * scale
    return jnp.where(hi > lo, jnp.clip(out, 0, 255), x)


def equalize(x):
    """Per-frame per-channel histogram equalization with PIL's exact LUT:
    step = (pixels - last_bin) // 255; lut[i] = (cumsum[:i] + step//2) // step.

    TPU note: histograms and the LUT application are fused compare-reduce
    passes (VPU), not scatter/gather — the .at[].add scatter formulation
    cost ~75 ms per 16-frame clip on v5e; this one is ~1 ms.
    """
    t, h, w, c = x.shape
    xi = x.astype(jnp.int32)
    bins = jnp.arange(256, dtype=jnp.int32)
    # (T, C, 256) histogram: compare fused into the H,W reduction
    hist = jnp.sum(
        (xi[:, :, :, :, None] == bins).astype(jnp.int32), axis=(1, 2)
    )  # (T, C, 256)
    rev_nz = (hist[..., ::-1] > 0).astype(jnp.int32)
    nz_idx = 255 - jnp.argmax(rev_nz, axis=-1)  # index of last nonzero bin
    last = jnp.take_along_axis(hist, nz_idx[..., None], axis=-1)[..., 0]
    step = (jnp.sum(hist, axis=-1) - last) // 255  # (T, C)
    cum = jnp.concatenate(
        [jnp.zeros((t, c, 1), jnp.int32), jnp.cumsum(hist, axis=-1)[..., :-1]],
        axis=-1,
    )
    lut = (cum + step[..., None] // 2) // jnp.maximum(step[..., None], 1)
    lut = jnp.clip(lut, 0, 255)  # (T, C, 256)
    # apply LUT as a compare-select reduction (no per-pixel gather)
    out = jnp.sum(
        jnp.where(xi[:, :, :, :, None] == bins, lut[:, None, None], 0),
        axis=-1,
    )
    out = jnp.where((step == 0)[:, None, None, :], xi, out)
    return out.astype(jnp.float32)


# ---------------------------------------------------------------------------
# geometric ops (inverse-warp with bilinear sampling, PIL fill=128 default)
# ---------------------------------------------------------------------------


def _affine_warp(x, matrix, fill=128.0):
    """Apply PIL-convention inverse affine ``(a,b,c,d,e,f)``:
    src = (a*dx + b*dy + c, d*dx + e*dy + f) for each dst pixel, bilinear.
    x: (T, H, W, C) float.
    """
    t, h, w, c = x.shape
    a, b, cc, d, e, f = matrix
    ys, xs = jnp.mgrid[0:h, 0:w]
    sx = a * xs + b * ys + cc
    sy = d * xs + e * ys + f

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    wx = sx - x0
    wy = sy - y0

    def sample(xi, yi):
        inb = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        v = x[:, yi_c, xi_c, :]  # (T, H, W, C)
        return jnp.where(inb[None, :, :, None], v, fill)

    v00 = sample(x0, y0)
    v01 = sample(x0 + 1, y0)
    v10 = sample(x0, y0 + 1)
    v11 = sample(x0 + 1, y0 + 1)
    wxb = wx[None, :, :, None]
    wyb = wy[None, :, :, None]
    out = (
        v00 * (1 - wxb) * (1 - wyb)
        + v01 * wxb * (1 - wyb)
        + v10 * (1 - wxb) * wyb
        + v11 * wxb * wyb
    )
    return out


def _resample_rows(x, src_x, fill):
    """Per-row 1-D bilinear resample along W as a one-hot MXU matmul.

    src_x: (H, W_dst) fractional source x per output pixel. The 2-tap lerp
    weights become an (H, W_dst, W_src) matrix contracted on the MXU —
    TPU gathers scalarize (~5-8 ms per 16-frame clip for the gather warp vs
    <1 ms here); HIGHEST precision keeps the f32 lerp exact.
    """
    t, h, w, c = x.shape
    x0 = jnp.floor(src_x)
    wx = src_x - x0
    src = jnp.arange(w)[None, None, :]
    in0 = (x0 >= 0) & (x0 < w)
    in1 = (x0 + 1 >= 0) & (x0 + 1 < w)
    m0 = (src == jnp.clip(x0, 0, w - 1)[..., None]) & in0[..., None]
    m1 = (src == jnp.clip(x0 + 1, 0, w - 1)[..., None]) & in1[..., None]
    wmat = m0 * (1.0 - wx)[..., None] + m1 * wx[..., None]  # (H, Wd, Ws)
    out = jnp.einsum(
        "thwc,hjw->thjc", x, wmat.astype(x.dtype),
        precision=jax.lax.Precision.HIGHEST,
    )
    oob = 1.0 - jnp.sum(wmat, axis=-1)  # fill weight mass per (h, j)
    return out + fill * oob[None, :, :, None]


def _resample_cols(x, src_y, fill):
    """Per-column 1-D bilinear resample along H (see _resample_rows).
    src_y: (W, H_dst) fractional source y per output pixel."""
    t, h, w, c = x.shape
    y0 = jnp.floor(src_y)
    wy = src_y - y0
    src = jnp.arange(h)[None, None, :]
    in0 = (y0 >= 0) & (y0 < h)
    in1 = (y0 + 1 >= 0) & (y0 + 1 < h)
    m0 = (src == jnp.clip(y0, 0, h - 1)[..., None]) & in0[..., None]
    m1 = (src == jnp.clip(y0 + 1, 0, h - 1)[..., None]) & in1[..., None]
    wmat = m0 * (1.0 - wy)[..., None] + m1 * wy[..., None]  # (W, Hd, Hs)
    out = jnp.einsum(
        "thwc,wjh->tjwc", x, wmat.astype(x.dtype),
        precision=jax.lax.Precision.HIGHEST,
    )
    oob = 1.0 - jnp.sum(wmat, axis=-1)  # (W, Hd)
    return out + fill * oob.T[None, :, :, None]


def shear_x(x, magnitude, fill=128.0):
    h, w = x.shape[1], x.shape[2]
    src_x = jnp.arange(w)[None, :] + magnitude * jnp.arange(h)[:, None]
    return _resample_rows(x, src_x, fill)


def shear_y(x, magnitude, fill=128.0):
    h, w = x.shape[1], x.shape[2]
    src_y = jnp.arange(h)[None, :] + magnitude * jnp.arange(w)[:, None]
    return _resample_cols(x, src_y, fill)


def translate_x(x, pixels, fill=128.0):
    h, w = x.shape[1], x.shape[2]
    src_x = jnp.broadcast_to(jnp.arange(w)[None, :] + pixels, (h, w))
    return _resample_rows(x, src_x, fill)


def translate_y(x, pixels, fill=128.0):
    h, w = x.shape[1], x.shape[2]
    src_y = jnp.broadcast_to(jnp.arange(h)[None, :] + pixels, (w, h))
    return _resample_cols(x, src_y, fill)


def rotate(x, degrees, fill=128.0):
    """Rotate about the image center (PIL rotate convention: positive =
    counter-clockwise; PIL builds the inverse matrix about center)."""
    t, h, w, c = x.shape
    # PIL rotates counter-clockwise for positive angles; the dst->src inverse
    # map therefore uses the negated angle
    theta = jnp.deg2rad(-degrees)
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    cx, cy = (w) / 2.0 - 0.5, (h) / 2.0 - 0.5
    # inverse rotation mapping dst->src
    a, b = cos, sin
    d, e = -sin, cos
    cc = cx - a * cx - b * cy
    f = cy - d * cx - e * cy
    return _affine_warp(x, (a, b, cc, d, e, f), fill)
