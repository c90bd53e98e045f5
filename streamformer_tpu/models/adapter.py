"""ViT-Adapter variant of the backbone for dense prediction (OVIS).

Rebuild of TimesformerMultiTaskingModelSigLIPViTAdapter
(models/modeling_timesformer_siglip_adapter.py:454-681): a frozen divided
space-time encoder interleaved with adapter interactions —

* SpatialPriorModule conv stem producing 1/4..1/32 features (:106-208);
* Extractor blocks: 3-scale adapter tokens cross-attend the ViT tokens via
  (single-level) MSDeformAttn + ConvFFN with depthwise conv over the three
  scales (:257-316);
* InteractionBlocks wrapping encoder layer ranges [[0,2],[3,5],[6,8],[9,11]]
  (:465,501-521);
* outputs a 4-scale FPN dict res2..res5 for Mask2Former (:674-679).

Normalization: the reference uses SyncBatchNorm in the stem/FPN; here batch
statistics are computed over the (global, jit-visible) batch — the natural
SyncBN equivalent in single-controller JAX.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from streamformer_tpu.config import StreamformerConfig
from streamformer_tpu.models import encoder as enc
from streamformer_tpu.ops.msdeform_attn import init_msdeform_params, ms_deform_attn

Params = Dict[str, Any]

INTERACTION_INDEXES = [[0, 2], [3, 5], [6, 8], [9, 11]]


def default_interaction_indexes(num_layers: int):
    """Contiguous [lo, hi] layer ranges for the interaction blocks: the
    canonical 4-block split for the 12-layer flagship (reference
    modeling_timesformer_siglip_adapter.py:465), scaled to smaller encoders
    (tiny smoke configs) as min(4, num_layers) near-equal chunks."""
    nblocks = min(4, num_layers)
    chunks = np.array_split(np.arange(num_layers), nblocks)
    return [[int(c[0]), int(c[-1])] for c in chunks]


# ---------------------------------------------------------------------------
# small pieces
# ---------------------------------------------------------------------------


def _conv_init(rng, kh, kw, cin, cout, groups=1):
    fan_out = kh * kw * cout // groups
    return math.sqrt(2.0 / fan_out) * jax.random.normal(
        rng, (kh, kw, cin // groups, cout), jnp.float32
    )


def _conv(x, kernel, stride=1, padding="SAME", groups=1):
    return jax.lax.conv_general_dilated(
        x, kernel, (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )


def _bn(x, p, eps=1e-5):
    """Batch statistics over (N, H, W) — SyncBN-equivalent under global jit."""
    m = jnp.mean(x, axis=(0, 1, 2), keepdims=True)
    v = jnp.var(x, axis=(0, 1, 2), keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + eps) * p["scale"] + p["bias"]


def _bn_init(c):
    return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))}


def _ln(x, p, eps=1e-6):
    m = jnp.mean(x, -1, keepdims=True)
    v = jnp.var(x, -1, keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + eps) * p["scale"] + p["bias"]


def _dense(x, p):
    return x @ p["kernel"] + p["bias"]


def get_reference_points(shapes: Sequence[Tuple[int, int]]) -> jnp.ndarray:
    """Normalized grid centers per level, concatenated
    (reference get_reference_points, modeling_timesformer_siglip_adapter.py)."""
    pts = []
    for h, w in shapes:
        ys = (jnp.arange(h) + 0.5) / h
        xs = (jnp.arange(w) + 0.5) / w
        gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
        pts.append(jnp.stack([gx.reshape(-1), gy.reshape(-1)], -1))
    return jnp.concatenate(pts, 0)[None, :, None, :]  # (1, S, 1, 2)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def init_spm_params(rng, inplanes=64, embed_dim=768):
    ks = iter(jax.random.split(rng, 16))
    return {
        "stem1": _conv_init(next(ks), 3, 3, 3, inplanes),
        "stem1_bn": _bn_init(inplanes),
        "stem2": _conv_init(next(ks), 3, 3, inplanes, inplanes),
        "stem2_bn": _bn_init(inplanes),
        "stem3": _conv_init(next(ks), 3, 3, inplanes, inplanes),
        "stem3_bn": _bn_init(inplanes),
        "conv2": _conv_init(next(ks), 3, 3, inplanes, 2 * inplanes),
        "conv2_bn": _bn_init(2 * inplanes),
        "conv3": _conv_init(next(ks), 3, 3, 2 * inplanes, 4 * inplanes),
        "conv3_bn": _bn_init(4 * inplanes),
        "conv4": _conv_init(next(ks), 3, 3, 4 * inplanes, 4 * inplanes),
        "conv4_bn": _bn_init(4 * inplanes),
        "fc1": {"kernel": _conv_init(next(ks), 1, 1, inplanes, embed_dim),
                "bias": jnp.zeros((embed_dim,))},
        "fc2": {"kernel": _conv_init(next(ks), 1, 1, 2 * inplanes, embed_dim),
                "bias": jnp.zeros((embed_dim,))},
        "fc3": {"kernel": _conv_init(next(ks), 1, 1, 4 * inplanes, embed_dim),
                "bias": jnp.zeros((embed_dim,))},
        "fc4": {"kernel": _conv_init(next(ks), 1, 1, 4 * inplanes, embed_dim),
                "bias": jnp.zeros((embed_dim,))},
    }


def init_extractor_params(rng, dim, heads, n_points, cffn_ratio=0.25):
    ks = iter(jax.random.split(rng, 8))
    hid = int(dim * cffn_ratio)
    return {
        "query_norm": {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))},
        "feat_norm": {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))},
        "attn": init_msdeform_params(next(ks), dim, 1, heads, n_points),
        "ffn_fc1": {"kernel": 0.02 * jax.random.normal(next(ks), (dim, hid)),
                    "bias": jnp.zeros((hid,))},
        "ffn_dw": _conv_init(next(ks), 3, 3, hid, hid, groups=hid),
        "ffn_dw_bias": jnp.zeros((hid,)),
        "ffn_fc2": {"kernel": 0.02 * jax.random.normal(next(ks), (hid, dim)),
                    "bias": jnp.zeros((dim,))},
        "ffn_norm": {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))},
    }


def init_adapter_params(
    rng,
    cfg: StreamformerConfig,
    conv_inplane=64,
    deform_num_heads=12,
    n_points=4,
    use_extra_extractor=True,
    interaction_indexes=INTERACTION_INDEXES,
) -> Params:
    d = cfg.hidden_size
    ks = iter(jax.random.split(rng, 8 + 3 * len(interaction_indexes)))
    inter = []
    for i in range(len(interaction_indexes)):
        block = {
            "extractor": init_extractor_params(next(ks), d, deform_num_heads,
                                               n_points),
        }
        if use_extra_extractor and i == len(interaction_indexes) - 1:
            block["extra_extractors"] = [
                init_extractor_params(next(ks), d, deform_num_heads, n_points)
                for _ in range(2)
            ]
        inter.append(block)
    return {
        "level_embed": jnp.zeros((3, d)),
        "spm": init_spm_params(next(ks), conv_inplane, d),
        "interactions": inter,
        "up": {  # ConvTranspose2d(embed, embed, 2, 2)
            "kernel": 0.02 * jax.random.normal(next(ks), (2, 2, d, d)),
            "bias": jnp.zeros((d,)),
        },
        "norm1": _bn_init(d),
        "norm2": _bn_init(d),
        "norm3": _bn_init(d),
        "norm4": _bn_init(d),
    }


# ---------------------------------------------------------------------------
# forward pieces
# ---------------------------------------------------------------------------


def spm_forward(p, x):
    """x: (B*T, H, W, 3) -> c1 (1/4, NHWC), c2/c3/c4 token seqs."""
    y = jax.nn.relu(_bn(_conv(x, p["stem1"], 2), p["stem1_bn"]))
    y = jax.nn.relu(_bn(_conv(y, p["stem2"], 1), p["stem2_bn"]))
    y = jax.nn.relu(_bn(_conv(y, p["stem3"], 1), p["stem3_bn"]))
    y = jax.lax.reduce_window(
        y, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )  # maxpool 3x3 s2
    c1 = y
    c2 = jax.nn.relu(_bn(_conv(c1, p["conv2"], 2), p["conv2_bn"]))
    c3 = jax.nn.relu(_bn(_conv(c2, p["conv3"], 2), p["conv3_bn"]))
    c4 = jax.nn.relu(_bn(_conv(c3, p["conv4"], 2), p["conv4_bn"]))
    c1 = _conv(c1, p["fc1"]["kernel"]) + p["fc1"]["bias"]
    c2 = _conv(c2, p["fc2"]["kernel"]) + p["fc2"]["bias"]
    c3 = _conv(c3, p["fc3"]["kernel"]) + p["fc3"]["bias"]
    c4 = _conv(c4, p["fc4"]["kernel"]) + p["fc4"]["bias"]

    def tok(c):
        b, h, w, d = c.shape
        return c.reshape(b, h * w, d)

    return c1, tok(c2), tok(c3), tok(c4)


def _conv_ffn(p, x, shapes_3l):
    """ConvFFN with depthwise conv applied per scale
    (reference ConvFFN/DWConv, :212-256). x: (B, S, hid-in dim)."""
    y = _dense(x, p["ffn_fc1"])
    parts = []
    start = 0
    for h, w in shapes_3l:
        seg = y[:, start : start + h * w]
        b, _, cdim = seg.shape
        img = seg.reshape(b, h, w, cdim)
        img = _conv(img, p["ffn_dw"], 1, groups=cdim) + p["ffn_dw_bias"]
        parts.append(img.reshape(b, h * w, cdim))
        start += h * w
    y = jnp.concatenate(parts, axis=1)
    y = jax.nn.gelu(y, approximate=False)
    return _dense(y, p["ffn_fc2"])


def extractor_forward(p, query, ref_pts, feat, feat_shape, shapes_3l, heads,
                      n_points):
    attn = ms_deform_attn(
        p["attn"],
        _ln(query, p["query_norm"]),
        ref_pts,
        _ln(feat, p["feat_norm"]),
        [feat_shape],
        n_heads=heads,
        n_points=n_points,
    )
    query = query + attn
    query = query + _conv_ffn(p, _ln(query, p["ffn_norm"]), shapes_3l)
    return query


def adapter_forward(
    adapter_params: Params,
    backbone_params: Params,
    pixel_values: jnp.ndarray,  # (B, T, 3, H, W)
    cfg: StreamformerConfig,
    deform_num_heads: int = 12,
    n_points: int = 4,
    add_vit_feature: bool = True,
    interaction_indexes=INTERACTION_INDEXES,
) -> Dict[str, jnp.ndarray]:
    """Returns the 4-scale FPN dict {res2..res5} with NHWC features at
    strides 4/8/16/32, leading dim B*T (reference forward :596-681)."""
    ap = adapter_params
    b, t, _, h, w = pixel_values.shape
    hp, wp = h // cfg.patch_size, w // cfg.patch_size

    imgs = pixel_values.reshape(b * t, 3, h, w).transpose(0, 2, 3, 1)
    c1, c2, c3, c4 = spm_forward(ap["spm"], imgs.astype(jnp.float32))
    c2 = c2 + ap["level_embed"][0]
    c3 = c3 + ap["level_embed"][1]
    c4 = c4 + ap["level_embed"][2]
    c = jnp.concatenate([c2, c3, c4], axis=1)

    shapes_3l = [(h // 8, w // 8), (hp, wp), (h // 32, w // 32)]
    ref_pts_c = jnp.tile(get_reference_points(shapes_3l), (b * t, 1, 1, 1))

    # backbone embeddings, (B, T, N, D) internal layout
    x = enc.embed(backbone_params, pixel_values, cfg)
    outs: List[jnp.ndarray] = []
    rates = [0.0] * cfg.num_hidden_layers
    for bi, (lo, hi) in enumerate(interaction_indexes):
        for li in range(lo, hi + 1):
            x = enc.layer_forward(backbone_params["layers"][li], x, cfg,
                                  drop_path_rate=rates[li])
        feat = x.reshape(b * t, hp * wp, cfg.hidden_size)
        block = ap["interactions"][bi]
        c = extractor_forward(
            block["extractor"], c, ref_pts_c, feat, (hp, wp), shapes_3l,
            deform_num_heads, n_points,
        )
        for extra in block.get("extra_extractors", []):
            c = extractor_forward(
                extra, c, ref_pts_c, feat, (hp, wp), shapes_3l,
                deform_num_heads, n_points,
            )
        outs.append(feat.reshape(b * t, hp, wp, cfg.hidden_size))

    d = cfg.hidden_size
    s2 = (h // 8) * (w // 8)
    s3 = hp * wp
    c2o = c[:, :s2].reshape(b * t, h // 8, w // 8, d)
    c3o = c[:, s2 : s2 + s3].reshape(b * t, hp, wp, d)
    c4o = c[:, s2 + s3 :].reshape(b * t, h // 32, w // 32, d)
    # transposed conv upsample of c2 -> 1/4, + stem c1
    c1o = (
        jax.lax.conv_transpose(
            c2o, ap["up"]["kernel"], (2, 2), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        + ap["up"]["bias"]
        + c1
    )

    if add_vit_feature:
        while len(outs) < 4:  # fewer interaction blocks than the canonical 4
            outs = outs + [outs[-1]]
        x1, x2, x3, x4 = outs[:4]

        def up(z, fh, fw):
            bz, zh, zw, zd = z.shape
            return jax.image.resize(z, (bz, fh, fw, zd), method="linear")

        c1o = c1o + up(x1, h // 4, w // 4)
        c2o = c2o + up(x2, h // 8, w // 8)
        c3o = c3o + x3
        c4o = c4o + up(x4, h // 32, w // 32)

    return {
        "res2": _bn(c1o, ap["norm1"]),
        "res3": _bn(c2o, ap["norm2"]),
        "res4": _bn(c3o, ap["norm3"]),
        "res5": _bn(c4o, ap["norm4"]),
    }
