"""OAD per-frame data layer + training, and the CTVIS contrastive plugin."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from streamformer_tpu.downstream import oad_lstr as L
from streamformer_tpu.downstream import oad_data as D
from streamformer_tpu.downstream import ctvis_plugin as CL

CFG = L.LSTRConfig(
    visual_size=16,
    d_model=32,
    num_heads=4,
    dim_feedforward=64,
    num_classes=4,
    long_memory_num_samples=8,
    work_memory_num_samples=4,
    enc_queries_0=4,
    enc_queries_1=4,
    groups=2,
    future_num_samples=0,
    anticipation_num_samples=0,
)


@pytest.fixture()
def feature_root(tmp_path, rng):
    froot = tmp_path / "feat"
    troot = tmp_path / "tgt"
    froot.mkdir()
    troot.mkdir()
    names = []
    for i in range(2):
        name = f"video_{i}"
        L_len = 40
        np.save(froot / f"{name}.npy",
                rng.standard_normal((L_len, 16)).astype(np.float32))
        tgt = np.zeros((L_len, 4), np.float32)
        tgt[np.arange(L_len), rng.integers(0, 4, L_len)] = 1
        np.save(troot / f"{name}.npy", tgt)
        names.append(name)
    return str(froot), str(troot), names


def test_perframe_dataset_windows(feature_root):
    froot, troot, names = feature_root
    ds = D.PerFrameDataset(froot, troot, names, CFG, long_sample_rate=2)
    assert len(ds) == 2 * (40 - 4 + 1)
    s = ds[0]
    assert s["features"].shape == (8 + 4, 16)
    assert s["targets"].shape == (4, 4)
    assert not s["memory_mask"].all()  # early windows have empty long memory
    s_late = ds[len(ds) // 2 - 1]
    assert s_late["memory_mask"].any()


def test_flow_columns_visual_first(feature_root, tmp_path, rng):
    """With a flow stream, dataset columns are [visual, flow] — the order
    LSTRStream.step and _fuse_features slice ([..., :visual_size] is
    visual). A flow-first layout would feed streaming inference transposed
    columns."""
    froot, troot, names = feature_root
    flroot = tmp_path / "flow"
    flroot.mkdir()
    flows = {}
    for name in names:
        fl = rng.standard_normal((40, 6)).astype(np.float32)
        np.save(flroot / f"{name}.npy", fl)
        flows[name] = fl
    import dataclasses

    cfg = dataclasses.replace(CFG, motion_size=6)
    ds = D.PerFrameDataset(
        froot, troot, names, cfg, long_sample_rate=2, flow_root=str(flroot)
    )
    vi, end = ds.samples[10]
    name = ds.videos[vi][0]
    vis = ds.videos[vi][1]
    s = ds[10]
    lw = cfg.work_memory_num_samples
    work = s["features"][-lw:]
    np.testing.assert_array_equal(work[:, : cfg.visual_size],
                                  vis[end - lw : end])
    np.testing.assert_array_equal(work[:, cfg.visual_size :],
                                  flows[name][end - lw : end])


def test_eval_batches_cover_every_window(feature_root):
    """Val-mode batches() must yield EVERY window (the trailing partial
    batch included) — dropping it truncates mAP/mcAP; train keeps the
    reference's drop_last."""
    froot, troot, names = feature_root
    ds = D.PerFrameDataset(froot, troot, names, CFG, long_sample_rate=2,
                           mode="val")
    rng = np.random.default_rng(0)
    n = sum(b["features"].shape[0] for b in ds.batches(16, rng))
    assert n == len(ds)  # 74 windows, 16 per batch -> final batch of 10
    ds_tr = D.PerFrameDataset(froot, troot, names, CFG, long_sample_rate=2)
    n_tr = sum(b["features"].shape[0] for b in ds_tr.batches(16, rng))
    assert n_tr == (len(ds_tr) // 16) * 16


def test_oad_train_and_inference(feature_root):
    froot, troot, names = feature_root
    ds = D.PerFrameDataset(froot, troot, names, CFG, long_sample_rate=2)
    params = L.init_params(jax.random.PRNGKey(0), CFG)
    tx = optax.adam(1e-3)
    opt = tx.init(params)
    step = D.make_train_step(CFG, tx)
    rng = np.random.default_rng(0)
    losses = []
    for i, batch in enumerate(ds.batches(8, rng)):
        params, opt, loss = step(
            params, opt, jnp.asarray(batch["features"]),
            jnp.asarray(batch["memory_mask"]), jnp.asarray(batch["targets"]),
        )
        losses.append(float(loss))
        if i >= 5:
            break
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]

    metrics = D.batch_inference(params, CFG, ds, batch_size=16)
    assert 0 <= metrics["mAP"] <= 100
    assert 0 <= metrics["mcAP"] <= 100


def test_ctvis_contrastive_loss(rng):
    d = 8
    key = jnp.asarray(rng.standard_normal((4, d)).astype(np.float32))
    ids_k = jnp.asarray([0, 1, 2, -1])
    # same identities, permuted, slightly noised
    ref = key[jnp.asarray([1, 0, 2, 3])] + 0.01
    ids_r = jnp.asarray([1, 0, 2, -1])
    loss_aligned = CL.contrastive_loss(key, ref, ids_k, ids_r)
    # wrong identity assignment should cost more
    ids_r_wrong = jnp.asarray([0, 1, 2, -1])  # mismatched w/ permutation
    loss_wrong = CL.contrastive_loss(key, ref, ids_k, ids_r_wrong)
    assert float(loss_aligned) < float(loss_wrong)
    g = jax.grad(
        lambda k: CL.contrastive_loss(k, ref, ids_k, ids_r)
    )(key)
    assert np.isfinite(np.asarray(g)).all()


def test_multi_ref_contrastive_loss(rng):
    """3-frame fixture: the multi-reference plugin prefers consistent
    identities across ALL frame pairs, is differentiable, and is selectable
    through the d2-config CL_PLUGIN block (reference MultiRefCLPlugin)."""
    d, q, f = 8, 4, 3
    base = rng.standard_normal((q, d)).astype(np.float32) * 2
    embeds = np.stack([
        base + 0.01 * rng.standard_normal((q, d)).astype(np.float32)
        for _ in range(f)
    ])
    embeds = jnp.asarray(embeds)
    ids_ok = jnp.asarray([[0, 1, 2, -1]] * f)
    # frame 2 swaps identities 0/1 -> anchors' positives become hard
    ids_bad = jnp.asarray([[0, 1, 2, -1], [0, 1, 2, -1], [1, 0, 2, -1]])
    l_ok = CL.multi_ref_contrastive_loss(embeds, ids_ok, one_direction=False)
    l_bad = CL.multi_ref_contrastive_loss(embeds, ids_bad, one_direction=False)
    assert float(l_ok) < float(l_bad)
    # one_direction (anchor = frame 0 only) matches the reference's break
    l_one = CL.multi_ref_contrastive_loss(embeds, ids_ok, one_direction=True)
    assert np.isfinite(float(l_one))
    g = jax.grad(
        lambda e: CL.multi_ref_contrastive_loss(e, ids_ok, one_direction=False)
    )(embeds)
    assert np.isfinite(np.asarray(g)).all()

    # d2-config dispatch: CL_PLUGIN_NAME selects the variant
    l_multi = CL.cl_loss_from_config(
        embeds, ids_ok,
        {"cl_plugin_name": "MultiRefCLPlugin", "one_direction": False},
    )
    np.testing.assert_allclose(float(l_multi), float(l_ok), rtol=1e-6)
    l_pair = CL.cl_loss_from_config(embeds, ids_ok,
                                    {"cl_plugin_name": "CTCLPlugin"})
    np.testing.assert_allclose(
        float(l_pair),
        float(CL.contrastive_loss(embeds[0], embeds[1], ids_ok[0], ids_ok[1])),
        rtol=1e-6,
    )
