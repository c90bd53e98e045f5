"""Head-by-head loss parity vs the torch reference heads (BASELINE.json
config #4; SURVEY §7 stage 6 exit criterion).

The reference heads are instantiated with label embeddings / logit params
injected directly (bypassing the HF text tower download). Heads whose ctor
requires torch.distributed get a single-process gloo group (the reference
cannot run them without one — modeling_timesformer_siglip.py:1929,2294).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from streamformer_tpu.models import heads

B, T, D, L = 3, 4, 16, 5


@pytest.fixture(scope="module")
def torch_heads(torch_reference_models):
    import torch

    _, model_mod = torch_reference_models
    if not torch.distributed.is_initialized():
        torch.distributed.init_process_group(
            "gloo",
            init_method="tcp://127.0.0.1:29511",
            world_size=1,
            rank=0,
        )
    return model_mod


def _mk(rng, *shape):
    return rng.standard_normal(shape).astype(np.float32)


@pytest.fixture()
def data(rng):
    import torch

    pooler = _mk(rng, B, T, D)
    label_emb = _mk(rng, L, D)
    label_emb /= np.linalg.norm(label_emb, axis=-1, keepdims=True)
    return {
        "pooler": pooler,
        "label_emb": label_emb,
        "scale": np.float32(np.log(10.0)),
        "bias": np.float32(-2.0),
    }


class _Out:
    def __init__(self, pooler, last=None):
        self.pooler_output = pooler
        self.last_hidden_state = last


def test_classification_head_parity(torch_heads, data, rng):
    import torch

    head = torch_heads.TimesformerVideoClassificationHead.__new__(
        torch_heads.TimesformerVideoClassificationHead
    )
    torch.nn.Module.__init__(head)
    head.label_embeddings = torch.from_numpy(data["label_emb"])
    head.logit_scale = torch.tensor(data["scale"])
    head.logit_bias = torch.tensor(data["bias"])

    labels = rng.integers(0, L, size=B)
    with torch.no_grad():
        ref_loss, ref_logits = head(
            _Out(torch.from_numpy(data["pooler"])),
            {"label": torch.from_numpy(labels)},
        )
    loss, logits = heads.classification_head(
        jnp.asarray(data["pooler"]),
        jnp.asarray(data["label_emb"]),
        jnp.asarray(labels),
        jnp.asarray(data["scale"]),
        jnp.asarray(data["bias"]),
    )
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(logits), ref_logits.numpy(), rtol=1e-5, atol=1e-5
    )


def test_grounding_head_parity(torch_heads, data, rng):
    """Drives the ACTUAL reference module forward (its in-forward caption
    tokenization is stubbed to return our fixed text embeddings)."""
    import torch

    head = torch_heads.TimesformerTemporalGroundingHead.__new__(
        torch_heads.TimesformerTemporalGroundingHead
    )
    torch.nn.Module.__init__(head)
    head.logit_scale = torch.tensor(data["scale"])
    head.logit_bias = torch.tensor(data["bias"])

    text = _mk(rng, B, D)
    frame_labels = rng.integers(0, 2, size=(B, T)).astype(np.float32)

    class _TokOut(dict):
        def to(self, device):
            return self

    head.text_tokenizer = lambda captions, **kw: _TokOut(input_ids=None)
    head.text_encoder = lambda **kw: (None, torch.from_numpy(text))

    with torch.no_grad():
        ref_loss, ref_logits = head(
            _Out(torch.from_numpy(data["pooler"])),
            {
                "caption": ["a clip"] * B,
                "label": torch.from_numpy(frame_labels),
            },
        )

    loss, logits = heads.grounding_head(
        jnp.asarray(data["pooler"]),
        jnp.asarray(text),
        jnp.asarray(frame_labels),
        jnp.asarray(data["scale"]),
        jnp.asarray(data["bias"]),
    )
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(logits), ref_logits.numpy(), rtol=1e-5, atol=1e-5
    )


def test_universal_localization_parity(torch_heads, data, rng):
    import torch
    import torch.nn.functional as F

    # reference math (TimesformerUniversalLocalizationHead.forward) with a
    # single dataset table, driven manually
    pooler = torch.from_numpy(data["pooler"])
    img = pooler / pooler.norm(p=2, dim=-1, keepdim=True)
    text = torch.from_numpy(data["label_emb"])
    frame_labels = rng.integers(-1, L, size=(B, T))
    scale = torch.tensor(data["scale"]).exp()
    bias = torch.tensor(data["bias"])
    total = 0.0
    for i in range(B):
        logits = torch.einsum("td,ld->tl", img[i], text) * scale + bias
        target = -torch.ones(T, L)
        fl = torch.from_numpy(frame_labels[i])
        fg = fl >= 0
        target[torch.arange(T)[fg], fl[fg]] = 1
        total = total + (-F.logsigmoid(target * logits).sum() / T)
    ref_loss = total / B

    loss, _ = heads.universal_localization_head(
        jnp.asarray(data["pooler"]),
        jnp.tile(jnp.asarray(data["label_emb"])[None], (B, 1, 1)),
        jnp.ones((B, L), bool),
        jnp.asarray(frame_labels),
        jnp.asarray(data["scale"]),
        jnp.asarray(data["bias"]),
    )
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)


def test_retrieval_ring_loss_single_shard_parity(torch_heads, data, rng):
    """SigLipLoss world_size=1 == our local loss."""
    import torch

    sl = torch_heads.SigLipLoss(rank=0, world_size=1)
    img = _mk(rng, B, D)
    txt = _mk(rng, B, D)
    img /= np.linalg.norm(img, axis=-1, keepdims=True)
    txt /= np.linalg.norm(txt, axis=-1, keepdims=True)
    with torch.no_grad():
        ref = sl(
            torch.from_numpy(img),
            torch.from_numpy(txt),
            torch.tensor(data["scale"]).exp(),
            torch.tensor(data["bias"]),
        )
    from streamformer_tpu.parallel.contrastive import siglip_local_loss

    got = siglip_local_loss(
        jnp.asarray(img),
        jnp.asarray(txt),
        jnp.exp(jnp.asarray(data["scale"])),
        jnp.asarray(data["bias"]),
    )
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)


def test_ring_loss_matches_global_loss_8_shards(rng):
    """mean over shards of the ring loss == global-batch SigLIP loss.

    Run on the 8-device CPU mesh via shard_map — validates the ppermute ring
    against the mathematically-equivalent global computation (the identity
    the reference ring relies on, SigLipLoss.forward :244-296).
    """
    from jax.experimental.shard_map import shard_map
    from jax.sharding import Mesh, PartitionSpec as P
    from streamformer_tpu.parallel.contrastive import (
        siglip_local_loss,
        siglip_ring_loss,
    )

    n_dev = 8
    if len(jax.devices()) < n_dev:
        pytest.skip("needs 8 devices")
    local_b = 2
    img = _mk(rng, n_dev * local_b, D)
    txt = _mk(rng, n_dev * local_b, D)
    img /= np.linalg.norm(img, axis=-1, keepdims=True)
    txt /= np.linalg.norm(txt, axis=-1, keepdims=True)
    scale = jnp.exp(jnp.asarray(np.float32(np.log(10.0))))
    bias = jnp.asarray(np.float32(-2.0))

    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("data",))

    @jax.jit
    def ring(img, txt):
        def f(i, t):
            loss = siglip_ring_loss(i, t, scale, bias, axis_name="data")
            return jax.lax.pmean(loss, "data")

        return shard_map(
            f, mesh=mesh, in_specs=(P("data"), P("data")), out_specs=P()
        )(img, txt)

    got = float(ring(jnp.asarray(img), jnp.asarray(txt)))

    # global equivalent: all pairs, positives on the diagonal, / global B
    ref = float(
        siglip_local_loss(jnp.asarray(img), jnp.asarray(txt), scale, bias)
    )
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_ring_loss_differentiable(rng):
    from jax.experimental.shard_map import shard_map
    from jax.sharding import Mesh, PartitionSpec as P
    from streamformer_tpu.parallel.contrastive import siglip_ring_loss

    n_dev = 8
    if len(jax.devices()) < n_dev:
        pytest.skip("needs 8 devices")
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("data",))
    img = jnp.asarray(_mk(rng, n_dev, D))
    txt = jnp.asarray(_mk(rng, n_dev, D))

    @jax.jit
    def loss_fn(img, txt):
        def f(i, t):
            return jax.lax.pmean(
                siglip_ring_loss(i, t, jnp.float32(10.0), jnp.float32(-2.0), "data"),
                "data",
            )

        return shard_map(
            f, mesh=mesh, in_specs=(P("data"), P("data")), out_specs=P()
        )(img, txt)

    g = jax.grad(loss_fn, argnums=(0, 1))(img, txt)
    assert np.isfinite(np.asarray(g[0])).all()
    assert np.isfinite(np.asarray(g[1])).all()
    assert np.abs(np.asarray(g[1])).max() > 0  # text grads flow through ring


def test_vis_head_runs_and_masks():
    """VIS head smoke: loss finite, ignore pixels excluded."""
    rng = np.random.default_rng(0)
    b, t, n, d, l = 2, 2, 9, 16, 4
    last = jnp.asarray(rng.standard_normal((b, t, n, d)).astype(np.float32))
    proj = {
        "v": {"kernel": jnp.eye(d), "bias": jnp.zeros(d)},
        "out": {"kernel": jnp.eye(d), "bias": jnp.zeros(d)},
        "layernorm": {"scale": jnp.ones(d), "bias": jnp.zeros(d)},
        "mlp": {
            "fc1": {"kernel": jnp.zeros((d, d)), "bias": jnp.zeros(d)},
            "fc2": {"kernel": jnp.zeros((d, d)), "bias": jnp.zeros(d)},
        },
    }
    lab = jnp.asarray(rng.standard_normal((b, l, d)).astype(np.float32))
    mask = jnp.asarray(rng.integers(-1, l, size=(b, t, 12, 12)))
    loss, logits = heads.vis_segmentation_head(
        last, proj, lab, jnp.ones((b, l), bool), mask,
        jnp.float32(np.log(10.0)), jnp.float32(-2.0),
    )
    assert np.isfinite(float(loss))

    all_ignore = -jnp.ones((b, t, 12, 12), jnp.int32)
    loss0, _ = heads.vis_segmentation_head(
        last, proj, lab, jnp.ones((b, l), bool), all_ignore,
        jnp.float32(np.log(10.0)), jnp.float32(-2.0),
    )
    assert float(loss0) == 0.0


def test_linear_head_parity(torch_heads, data, rng):
    """CE linear classifier (TimesformerVideoClassificationLinearHead,
    modeling_timesformer_siglip.py:1624-1648)."""
    import torch

    head = torch_heads.TimesformerVideoClassificationLinearHead.__new__(
        torch_heads.TimesformerVideoClassificationLinearHead
    )
    torch.nn.Module.__init__(head)
    head.classifier = torch.nn.Linear(D, L)
    w = _mk(rng, L, D) * 0.1
    bias = _mk(rng, L) * 0.1
    with torch.no_grad():
        head.classifier.weight.copy_(torch.from_numpy(w))
        head.classifier.bias.copy_(torch.from_numpy(bias))

    labels = rng.integers(0, L, size=B)
    with torch.no_grad():
        ref_loss, ref_logits = head(
            _Out(torch.from_numpy(data["pooler"])),
            {"label": torch.from_numpy(labels)},
        )
    loss, logits = heads.classification_linear_head(
        jnp.asarray(data["pooler"]),
        {"kernel": jnp.asarray(w.T), "bias": jnp.asarray(bias)},
        jnp.asarray(labels),
    )
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(logits), ref_logits.numpy(), rtol=1e-4, atol=1e-5
    )


def test_naive_localization_parity(torch_heads, data, rng):
    """Windowed TAL head (TimesformerNaiveLocalizationHead, :2081-2185):
    drives the ACTUAL reference module with ragged gt_segments (including a
    fractional start to hit its ceil rule, :2169-2173) and checks our
    host-side rasterization + head against its loss and logits."""
    import torch

    head = torch_heads.TimesformerNaiveLocalizationHead.__new__(
        torch_heads.TimesformerNaiveLocalizationHead
    )
    torch.nn.Module.__init__(head)
    label_emb = _mk(rng, L, D)  # raw: the reference normalizes in-forward
    head.label_embeddings = torch.from_numpy(label_emb)
    head.logit_scale = torch.tensor(data["scale"])
    head.logit_bias = torch.tensor(data["bias"])

    n_videos, window, t_clip = 2, 8, 4
    pooler = _mk(rng, n_videos * window // t_clip, t_clip, D)
    masks = [
        torch.tensor([True] * 6 + [False] * 2),
        torch.tensor([True] * 8),
    ]
    gt_segments = [
        torch.tensor([[1.0, 3.0], [4.5, 6.0]]),  # 4.5 -> ceil -> start 5
        torch.tensor([[0.0, 2.0]]),
    ]
    gt_labels = [torch.tensor([0, 2]), torch.tensor([1])]
    with torch.no_grad():
        ref_loss, ref_logits = head(
            _Out(torch.from_numpy(pooler)),
            {"masks": masks, "gt_segments": gt_segments,
             "gt_labels": gt_labels},
        )

    # host-side rasterization (the collate's rule, data/collate.py:202-209)
    target = -np.ones((n_videos, window, L), np.float32)
    for i in range(n_videos):
        target[i, ~masks[i].numpy()] = 0.0
        for (s, e), lab in zip(gt_segments[i].numpy(),
                               gt_labels[i].numpy()):
            s_idx = int(s) if float(s) == int(s) else int(s) + 1
            target[i, s_idx : int(e) + 1, int(lab)] = 1.0

    loss, logits = heads.naive_localization_head(
        jnp.asarray(pooler),
        jnp.asarray(label_emb),
        jnp.asarray(target),
        jnp.asarray(data["scale"]),
        jnp.asarray(data["bias"]),
    )
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(logits), ref_logits.numpy(), rtol=1e-4, atol=1e-5
    )


def test_grounding_contrastive_parity(torch_heads, data, rng):
    """All-gather frame-vs-caption contrastive grounding
    (TimesformerTemporalGroundingContrastiveHead, :2400-2482) at
    world_size=1 (single-process gloo group), tokenizer/encoder stubbed to
    fixed text embeddings."""
    import torch

    head = torch_heads.TimesformerTemporalGroundingContrastiveHead.__new__(
        torch_heads.TimesformerTemporalGroundingContrastiveHead
    )
    torch.nn.Module.__init__(head)
    head.conv = torch.nn.Identity()
    head.rank, head.world_size = 0, 1
    head.logit_scale = torch.tensor(data["scale"])
    head.logit_bias = torch.tensor(data["bias"])

    text = _mk(rng, B, D)
    frame_labels = rng.integers(0, 2, size=(B, T)).astype(np.float32)

    class _TokOut(dict):
        def to(self, device):
            return self

    head.text_tokenizer = lambda captions, **kw: _TokOut(input_ids=None)
    head.text_encoder = lambda **kw: (None, torch.from_numpy(text))

    with torch.no_grad():
        ref_loss, ref_logits = head(
            _Out(torch.from_numpy(data["pooler"])),
            {"caption": ["a clip"] * B,
             "label": torch.from_numpy(frame_labels.copy())},
        )

    loss, logits = heads.grounding_contrastive_head(
        jnp.asarray(data["pooler"]),
        jnp.asarray(text),
        jnp.asarray(frame_labels),
        jnp.asarray(data["scale"]),
        jnp.asarray(data["bias"]),
        axis_name=None,
    )
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(logits), ref_logits.numpy(), rtol=1e-4, atol=1e-5
    )


def _torch_dense_projection_modules(torch_heads, rng, d, d_mlp, cfg):
    """Seeded torch modules for the frozen-MAP dense projection (the weight
    surgery of prepare_multi_task, :1764-1784) plus the equivalent JAX
    proj_params pytree."""
    import torch

    w_v = torch.nn.Linear(d, d)
    v_proj = torch.nn.Linear(d, d)
    layernorm = torch.nn.LayerNorm(d, eps=cfg.layer_norm_eps)
    mlp = torch_heads.SiglipMLP(cfg)
    with torch.no_grad():
        for lin in (w_v, v_proj, mlp.fc1, mlp.fc2):
            lin.weight.copy_(torch.from_numpy(
                _mk(rng, *lin.weight.shape) * 0.2))
            lin.bias.copy_(torch.from_numpy(_mk(rng, *lin.bias.shape) * 0.1))
        layernorm.weight.copy_(torch.from_numpy(1.0 + 0.1 * _mk(rng, d)))
        layernorm.bias.copy_(torch.from_numpy(0.1 * _mk(rng, d)))

    def t(x):
        return jnp.asarray(x.detach().numpy())

    proj = {
        "v": {"kernel": t(w_v.weight).T, "bias": t(w_v.bias)},
        "out": {"kernel": t(v_proj.weight).T, "bias": t(v_proj.bias)},
        "layernorm": {"scale": t(layernorm.weight), "bias": t(layernorm.bias)},
        "mlp": {
            "fc1": {"kernel": t(mlp.fc1.weight).T, "bias": t(mlp.fc1.bias)},
            "fc2": {"kernel": t(mlp.fc2.weight).T, "bias": t(mlp.fc2.bias)},
        },
    }
    return w_v, v_proj, layernorm, mlp, proj


def test_vis_head_parity(torch_reference_models, torch_heads, rng):
    """Per-pixel CE VIS head (TimesformerUniversalVideoInstanceSegmentation-
    Head, :1729-1918), <=100-class branch: frozen-MAP dense projection
    transplanted both ways, background->ignore via masked_fill (:1890-1892),
    bilinear logit upsampling (:1904-1906)."""
    import torch

    cfg_mod, _ = torch_reference_models
    d, d_mlp, l, t_f, b = 16, 32, 6, 2, 2
    cfg = cfg_mod.StreamformerConfig(
        image_size=28, patch_size=4, hidden_size=d, intermediate_size=d_mlp,
        hidden_act="gelu",
    )
    n = (28 // 4) ** 2  # 49 patches

    head = torch_heads.TimesformerUniversalVideoInstanceSegmentationHead.__new__(
        torch_heads.TimesformerUniversalVideoInstanceSegmentationHead
    )
    torch.nn.Module.__init__(head)
    head.config = cfg
    head.logit_scale = torch.tensor(np.float32(np.log(10.0)))
    head.logit_bias = torch.tensor(np.float32(-2.0))
    label_emb = _mk(rng, l, d)
    label_emb /= np.linalg.norm(label_emb, axis=-1, keepdims=True)
    head.dataset_label_embeddings = {"YouTubeVIS": torch.from_numpy(label_emb)}
    (head.w_v, head.v_proj, head.head_layernorm, head.head_mlp,
     proj) = _torch_dense_projection_modules(torch_heads, rng, d, d_mlp, cfg)

    last = _mk(rng, b, t_f, n, d)
    # class ids: 0 = background (reference masked_fills 0 -> ignore)
    mask = rng.integers(0, l, size=(b, t_f, 28, 28)).astype(np.int64)
    with torch.no_grad():
        ref_loss, _ = head(
            _Out(None, torch.from_numpy(last)),
            {
                "dataset": ["YouTubeVIS"] * b,
                "mask_target": [torch.from_numpy(mask[i]) for i in range(b)],
                "mask_size": [(28, 28)] * b,
            },
        )

    mask_j = np.where(mask == 0, -1, mask)  # background -> ignore host-side
    loss, logits = heads.vis_segmentation_head(
        jnp.asarray(last),
        proj,
        jnp.tile(jnp.asarray(label_emb)[None], (b, 1, 1)),
        jnp.ones((b, l), bool),
        jnp.asarray(mask_j),
        jnp.asarray(np.float32(np.log(10.0))),
        jnp.asarray(np.float32(-2.0)),
    )
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-4)
    assert logits.shape == (b, t_f, 7, 7, l)


def test_refervos_contrastive_parity(torch_reference_models, torch_heads,
                                     rng):
    """Pixel-to-caption contrastive CE (TimesformerVideoContrastiveCross-
    EntropySegmentationHead, :1921-2078) at world_size=1: positives at
    column rank*B+i, non-foreground pixels ignored (:2055-2060), the
    hardcoded 14x14 patch grid and 224-pixel upsample (:2026-2043)."""
    import torch

    cfg_mod, _ = torch_reference_models
    d, d_mlp, t_f, b, n = 16, 32, 2, 2, 196  # 14x14 grid (hardcoded, :2026)
    cfg = cfg_mod.StreamformerConfig(
        image_size=224, patch_size=16, hidden_size=d, intermediate_size=d_mlp,
        hidden_act="gelu",
    )

    K = torch_heads.TimesformerVideoContrastiveCrossEntropySegmentationHead
    head = K.__new__(K)
    torch.nn.Module.__init__(head)
    head.config = cfg
    head.world_size = 1
    head.logit_scale = torch.tensor(np.float32(np.log(10.0)))
    head.logit_bias = torch.tensor(np.float32(-2.0))
    (head.w_v, head.v_proj, head.head_layernorm, head.head_mlp,
     proj) = _torch_dense_projection_modules(torch_heads, rng, d, d_mlp, cfg)

    text = _mk(rng, b, d)

    class _TokOut(dict):
        def to(self, device):
            return self

    head.text_tokenizer = lambda captions, **kw: _TokOut(input_ids=None)
    head.text_encoder = lambda **kw: (None, torch.from_numpy(text))

    last = _mk(rng, b, t_f, n, d)
    mask = (rng.random((b, t_f, 224, 224)) < 0.3).astype(np.int64)
    with torch.no_grad():
        ref_loss, ref_sim = head(
            _Out(None, torch.from_numpy(last)),
            {
                "caption": ["an expression"] * b,
                "mask_target": [torch.from_numpy(mask[i]) for i in range(b)],
                "mask_size": [(224, 224)] * b,
            },
        )

    loss, logits = heads.refervos_contrastive_head(
        jnp.asarray(last),
        proj,
        jnp.asarray(text),
        jnp.asarray(mask),
        jnp.asarray(np.float32(np.log(10.0))),
        jnp.asarray(np.float32(-2.0)),
        axis_name=None,
    )
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(logits).reshape(-1, b),
        ref_sim.numpy().reshape(-1, b),
        rtol=1e-4, atol=1e-5,
    )


def test_contrastive_grounding_dispatch(rng):
    """grounding_head="contrastive" routes TaskGrounding through the
    all-gather contrastive variant (reference alt registry entry)."""
    from streamformer_tpu.config import StreamformerConfig
    from streamformer_tpu.models.multitask import MultitaskModel
    from streamformer_tpu.models.text_encoder import SiglipTextConfig

    cfg = StreamformerConfig(
        image_size=32, patch_size=16, num_frames=4, hidden_size=32,
        num_hidden_layers=1, num_attention_heads=4, intermediate_size=64,
        dtype="float32", use_pallas=False,
    )
    tc = SiglipTextConfig(vocab_size=64, hidden_size=32, num_hidden_layers=1,
                          num_attention_heads=4, intermediate_size=64,
                          max_position_embeddings=8)
    m = MultitaskModel(cfg, {"TaskGrounding": {"label2id": None}},
                       text_cfg=tc, grounding_head="contrastive")
    px = jnp.asarray(rng.standard_normal((2, 4, 3, 32, 32)).astype(np.float32))
    ti = {
        "caption_ids": jnp.asarray(rng.integers(0, 64, (2, 8)).astype(np.int32)),
        "label": jnp.asarray(rng.integers(0, 2, (2, 4)).astype(np.float32)),
    }
    loss, logits = m.loss_fn(m.params, "TaskGrounding", px, ti, axis_name=None)
    assert np.isfinite(float(loss))
    assert logits.shape == (2 * 4, 2)  # (B*T, B) global-batch columns
