"""END-TO-END gradient parity vs the torch reference (VERDICT r4 #2).

Every forward-parity gate in test_encoder_parity.py runs under
torch.no_grad(); head gates pin loss VALUES. This file closes the chain:
on identical weights and an identical batch, torch autograd's dL/dθ of
the FULL model loss (backbone through head) must equal jax.grad per
parameter leaf — a divergence in gate/LoRA/stop-gradient placement or
LN-eps backward would pass every forward test and silently corrupt
pretraining (modeling_timesformer_siglip.py:840-1004 carries the
reference backward semantics being pinned).

Torch grads map into our tree through the SAME converter used for
weights (checkpoint.convert_backbone_state_dict): it only transposes /
reshapes / slices, and gradients transform identically under those
re-layouts.

Losses gated: zero-shot classification, VIS per-pixel CE (through the
dense projection), retrieval ring at world_size=1, and a LoRA variant
(all-leaf grads with LoRA active, plus the frozen-policy check: our
optimizer's trainable-mask zeroes exactly the leaves the reference
freezes via requires_grad=False).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from streamformer_tpu.checkpoint import convert_backbone_state_dict
from streamformer_tpu.config import StreamformerConfig
from streamformer_tpu.models import encoder, heads

from test_encoder_parity import SMALL, _build_torch_model, _jax_setup
from test_heads import _torch_dense_projection_modules

B, T = 2, SMALL["num_frames"]
IMG = SMALL["image_size"]
D = SMALL["hidden_size"]
L = 5  # label / caption count


@pytest.fixture(scope="module")
def torch_heads(torch_reference_models):
    """Reference model module with a single-process gloo group (heads whose
    ctor requires torch.distributed — same arrangement as test_heads)."""
    import torch

    _, model_mod = torch_reference_models
    if not torch.distributed.is_initialized():
        torch.distributed.init_process_group(
            "gloo",
            init_method="tcp://127.0.0.1:29512",
            world_size=1,
            rank=0,
        )
    return model_mod


def _torch_grad_tree(model, cfg):
    """model.named_parameters() grads -> our param-tree layout, via the
    weight converter (grads re-layout exactly like weights under its
    transposes/slices). Params the loss never touched (grad None) map to
    zeros."""
    import torch

    gsd = {}
    for name, p in model.named_parameters():
        g = p.grad
        gsd[name] = (torch.zeros_like(p) if g is None else g).detach().numpy()
    return convert_backbone_state_dict(gsd, cfg)


def _assert_tree_close(got, ref, rtol=1e-4, path=""):
    """Leaf-wise: max |got - ref| <= rtol * (1 + max |ref|) — the fp32
    gate VERDICT r4 #2 asks for, scaled per leaf so near-zero-grad
    leaves (e.g. masked gates) are held to an absolute 1e-4."""
    if isinstance(got, dict):
        assert set(got) == set(ref), (path, set(got) ^ set(ref))
        for k in got:
            _assert_tree_close(got[k], ref[k], rtol, f"{path}/{k}")
        return
    if isinstance(got, (list, tuple)):
        assert len(got) == len(ref), path
        for i, (a, b) in enumerate(zip(got, ref)):
            _assert_tree_close(a, b, rtol, f"{path}[{i}]")
        return
    g, r = np.asarray(got, np.float32), np.asarray(ref, np.float32)
    assert g.shape == r.shape, (path, g.shape, r.shape)
    err = float(np.max(np.abs(g - r))) if g.size else 0.0
    bound = rtol * (1.0 + float(np.max(np.abs(r))) if r.size else 1.0)
    assert err <= bound, (
        f"{path}: max grad err {err:.3e} > {bound:.3e} "
        f"(|ref| max {np.max(np.abs(r)):.3e})"
    )


def _batch(rng):
    return rng.standard_normal((B, T, 3, IMG, IMG)).astype(np.float32)


@pytest.fixture(scope="module")
def cls_data():
    rng = np.random.default_rng(41)
    emb = rng.standard_normal((L, D)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    return {
        "label_emb": emb,
        "labels": rng.integers(0, L, size=B),
        "scale": np.float32(np.log(10.0)),
        "bias": np.float32(-2.0),
        "px": _batch(rng),
    }


def test_classification_grad_parity(torch_reference_models, cls_data):
    """dL/dθ of classification loss(model(px)) — every backbone leaf plus
    the head's label embeddings / logit scale / logit bias."""
    import torch

    model, _ = _build_torch_model(torch_reference_models)
    cfg, params = _jax_setup(model)

    head = torch_reference_models[1].TimesformerVideoClassificationHead \
        .__new__(torch_reference_models[1]
                 .TimesformerVideoClassificationHead)
    torch.nn.Module.__init__(head)
    head.label_embeddings = torch.nn.Parameter(
        torch.from_numpy(cls_data["label_emb"]))
    head.logit_scale = torch.nn.Parameter(torch.tensor(cls_data["scale"]))
    head.logit_bias = torch.nn.Parameter(torch.tensor(cls_data["bias"]))

    ref_loss, _ = head(
        model(torch.from_numpy(cls_data["px"])),
        {"label": torch.from_numpy(cls_data["labels"])},
    )
    ref_loss.backward()

    def loss_fn(p, label_emb, scale, bias):
        out = encoder.model_forward(p, jnp.asarray(cls_data["px"]), cfg)
        loss, _ = heads.classification_head(
            out["pooler_output"], label_emb,
            jnp.asarray(cls_data["labels"]), scale, bias,
        )
        return loss

    loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3))(
        params, jnp.asarray(cls_data["label_emb"]),
        jnp.asarray(cls_data["scale"]), jnp.asarray(cls_data["bias"]),
    )
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    _assert_tree_close(grads[0], _torch_grad_tree(model, cfg))
    # the reference DETACHES label embeddings (:1710) -> grad None there;
    # our stop_gradient mirror must produce exactly zero
    assert head.label_embeddings.grad is None
    assert not np.any(np.asarray(grads[1])), "label_embeddings must be frozen"
    _assert_tree_close(grads[2], head.logit_scale.grad.numpy(),
                       path="logit_scale")
    _assert_tree_close(grads[3], head.logit_bias.grad.numpy(),
                       path="logit_bias")


def test_vis_grad_parity(torch_reference_models, torch_heads, cls_data):
    """dL/dθ of the VIS per-pixel CE through the dense projection: the
    loss rides last_hidden_state (not the pooler), so this pins the
    backward of the full patch stream, and the projection modules'
    grads are compared leaf-for-leaf too."""
    import torch

    cfg_mod, model_mod = torch_reference_models
    model, t_cfg = _build_torch_model(torch_reference_models)
    cfg, params = _jax_setup(model)
    rng = np.random.default_rng(43)

    head = model_mod.TimesformerUniversalVideoInstanceSegmentationHead \
        .__new__(model_mod.TimesformerUniversalVideoInstanceSegmentationHead)
    torch.nn.Module.__init__(head)
    head.config = t_cfg
    head.logit_scale = torch.nn.Parameter(torch.tensor(cls_data["scale"]))
    head.logit_bias = torch.nn.Parameter(torch.tensor(cls_data["bias"]))
    head.dataset_label_embeddings = {
        "YouTubeVIS": torch.from_numpy(cls_data["label_emb"])}
    (head.w_v, head.v_proj, head.head_layernorm, head.head_mlp,
     proj) = _torch_dense_projection_modules(
        torch_heads, rng, D, SMALL["intermediate_size"], t_cfg)

    mask = rng.integers(0, L, size=(B, T, IMG, IMG)).astype(np.int64)
    ref_loss, _ = head(
        model(torch.from_numpy(cls_data["px"])),
        {
            "dataset": ["YouTubeVIS"] * B,
            "mask_target": [torch.from_numpy(mask[i]) for i in range(B)],
            "mask_size": [(IMG, IMG)] * B,
        },
    )
    ref_loss.backward()

    mask_j = np.where(mask == 0, -1, mask)  # background -> ignore

    def loss_fn(p, proj_p, scale, bias):
        out = encoder.model_forward(p, jnp.asarray(cls_data["px"]), cfg)
        loss, _ = heads.vis_segmentation_head(
            out["last_hidden_state"], proj_p,
            jnp.tile(jnp.asarray(cls_data["label_emb"])[None], (B, 1, 1)),
            jnp.ones((B, L), bool), jnp.asarray(mask_j), scale, bias,
        )
        return loss

    loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3))(
        params, proj, jnp.asarray(cls_data["scale"]),
        jnp.asarray(cls_data["bias"]),
    )
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-4)
    _assert_tree_close(grads[0], _torch_grad_tree(model, cfg))
    tg = lambda m: m.weight.grad.numpy().T
    ref_proj = {
        "v": {"kernel": tg(head.w_v), "bias": head.w_v.bias.grad.numpy()},
        "out": {"kernel": tg(head.v_proj),
                "bias": head.v_proj.bias.grad.numpy()},
        "layernorm": {"scale": head.head_layernorm.weight.grad.numpy(),
                      "bias": head.head_layernorm.bias.grad.numpy()},
        "mlp": {
            "fc1": {"kernel": tg(head.head_mlp.fc1),
                    "bias": head.head_mlp.fc1.bias.grad.numpy()},
            "fc2": {"kernel": tg(head.head_mlp.fc2),
                    "bias": head.head_mlp.fc2.bias.grad.numpy()},
        },
    }
    _assert_tree_close(grads[1], ref_proj, path="proj")
    _assert_tree_close(grads[2], head.logit_scale.grad.numpy(),
                       path="logit_scale")
    _assert_tree_close(grads[3], head.logit_bias.grad.numpy(),
                       path="logit_bias")


def test_retrieval_ring_grad_parity(torch_reference_models, torch_heads,
                                    cls_data):
    """dL/dθ of the retrieval SigLIP loss at world_size=1, driving the
    ACTUAL reference head in training mode (text tower stubbed to fixed
    caption features, as in test_heads)."""
    import torch

    _, model_mod = torch_reference_models
    model, _ = _build_torch_model(torch_reference_models)
    cfg, params = _jax_setup(model)
    rng = np.random.default_rng(47)
    txt = rng.standard_normal((B, D)).astype(np.float32)

    head = model_mod.TimesformerVideoRetrievalHead.__new__(
        model_mod.TimesformerVideoRetrievalHead)
    torch.nn.Module.__init__(head)
    head.loss_function = model_mod.SigLipLoss(rank=0, world_size=1)
    head.logit_scale = torch.nn.Parameter(torch.tensor(cls_data["scale"]))
    head.logit_bias = torch.nn.Parameter(torch.tensor(cls_data["bias"]))

    class _TokOut(dict):
        def to(self, device):
            return self

    head.text_tokenizer = lambda captions, **kw: _TokOut(input_ids=None)
    head.text_encoder = lambda **kw: (None, torch.from_numpy(txt))
    head.train()

    ref_loss, _ = head(
        model(torch.from_numpy(cls_data["px"])),
        {"caption": ["a clip"] * B},
    )
    ref_loss.backward()

    def loss_fn(p, scale, bias):
        out = encoder.model_forward(p, jnp.asarray(cls_data["px"]), cfg)
        loss, _ = heads.retrieval_head(
            out["pooler_output"], jnp.asarray(txt), scale, bias,
            axis_name=None,  # world_size=1: the ring reduces to local
        )
        return loss

    loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1, 2))(
        params, jnp.asarray(cls_data["scale"]),
        jnp.asarray(cls_data["bias"]),
    )
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    _assert_tree_close(grads[0], _torch_grad_tree(model, cfg))
    _assert_tree_close(grads[1], head.logit_scale.grad.numpy(),
                       path="logit_scale")
    _assert_tree_close(grads[2], head.logit_bias.grad.numpy(),
                       path="logit_bias")


def test_lora_grad_parity_and_frozen_policy(torch_reference_models,
                                            cls_data):
    """With spatial LoRA active: all-leaf grad parity (LoRA a/b included —
    pins the reference's scaling/placement backward,
    modeling_timesformer_siglip.py:519-573), then the frozen policy: the
    reference freezes non-LoRA leaves via requires_grad=False (grad
    None == zero); our trainer freezes via the optimizer's
    trainable-mask — one update step must move EXACTLY the leaves the
    reference would."""
    import torch

    model, _ = _build_torch_model(torch_reference_models)
    model.add_lora_spatial()
    with torch.no_grad():
        for name, p in model.named_parameters():
            if "lora_b" in name:
                p.normal_(0, 0.02)
    model = model.eval()
    cfg, params = _jax_setup(model)

    head = torch_reference_models[1].TimesformerVideoClassificationHead \
        .__new__(torch_reference_models[1]
                 .TimesformerVideoClassificationHead)
    torch.nn.Module.__init__(head)
    head.label_embeddings = torch.from_numpy(cls_data["label_emb"])
    head.logit_scale = torch.tensor(cls_data["scale"])
    head.logit_bias = torch.tensor(cls_data["bias"])

    ref_loss, _ = head(
        model(torch.from_numpy(cls_data["px"])),
        {"label": torch.from_numpy(cls_data["labels"])},
    )
    ref_loss.backward()

    def loss_fn(p):
        out = encoder.model_forward(p, jnp.asarray(cls_data["px"]), cfg)
        loss, _ = heads.classification_head(
            out["pooler_output"], jnp.asarray(cls_data["label_emb"]),
            jnp.asarray(cls_data["labels"]),
            jnp.asarray(cls_data["scale"]), jnp.asarray(cls_data["bias"]),
        )
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(params)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)

    # the reference's _add_lora FREEZES the base spatial qkv/out in place
    # (requires_grad=False, :520-523) — torch reports no grad for those
    # leaves while autodiff still computes ours. Map requires_grad through
    # the same converter to split the tree: trainable leaves must match
    # grad-for-grad; frozen leaves are the policy check below.
    import torch

    req = convert_backbone_state_dict(
        {n: torch.full_like(p, float(p.requires_grad))
         for n, p in model.named_parameters()}, cfg)
    ref_grads = _torch_grad_tree(model, cfg)

    def compare_trainable(g, r, q, path=""):
        if isinstance(g, dict):
            for k in g:
                compare_trainable(g[k], r[k], q[k], f"{path}/{k}")
            return
        if isinstance(g, (list, tuple)):
            for i, (a, b, c) in enumerate(zip(g, r, q)):
                compare_trainable(a, b, c, f"{path}[{i}]")
            return
        if np.all(np.asarray(q) > 0):  # torch trains this leaf
            _assert_tree_close(g, r, path=path)

    compare_trainable(grads, ref_grads, req)

    # frozen-policy equivalence: our trainable mask must freeze EXACTLY
    # the leaves the reference froze, and one masked optimizer step must
    # leave them untouched while every LoRA factor moves.
    from streamformer_tpu.train import optim
    import optax

    mask = optim.trainable_mask_lora_spatial(params)
    tx = optax.multi_transform(
        {"train": optax.sgd(1.0), "freeze": optax.set_to_zero()},
        jax.tree.map(lambda t: "train" if t else "freeze", mask),
    )
    updates, _ = tx.update(grads, tx.init(params), params)

    flat_mask = jax.tree_util.tree_flatten_with_path(mask)[0]
    flat_req = jax.tree_util.tree_flatten_with_path(req)[0]
    flat_upd = jax.tree_util.tree_flatten_with_path(updates)[0]
    n_lora = 0
    for (kp, trainable), (_, q), (_, upd) in zip(flat_mask, flat_req,
                                                 flat_upd):
        path = jax.tree_util.keystr(kp)
        torch_trains = bool(np.all(np.asarray(q) > 0))
        assert trainable == torch_trains, (
            f"{path}: our mask {'trains' if trainable else 'freezes'}, "
            f"reference {'trains' if torch_trains else 'freezes'}"
        )
        if not trainable:
            assert not np.any(np.asarray(upd)), f"{path}: frozen leaf moved"
        elif "lora_a" in path or "lora_b" in path:
            n_lora += 1
            assert np.any(np.asarray(upd)), f"{path}: LoRA leaf stuck"
    # every layer contributes qkv/out lora_a+lora_b
    assert n_lora == 4 * SMALL["num_hidden_layers"]
