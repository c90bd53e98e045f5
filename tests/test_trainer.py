"""Trainer stack: optimizer factory, multitask train steps, checkpointing."""

import os
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from streamformer_tpu.config import StreamformerConfig
from streamformer_tpu.models.multitask import MultitaskModel
from streamformer_tpu.models.text_encoder import SiglipTextConfig
from streamformer_tpu.train import optim
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


def _class_batch(rng, b=4, l=3):
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


def _grounding_batch(rng, b=4):
    return {
        "pixel_values": jnp.asarray(
            rng.standard_normal((b, 4, 3, 32, 32)).astype(np.float32)
        ),
        "task_input": {
            "caption_ids": jnp.asarray(
                rng.integers(0, 64, (b, 8)).astype(np.int32)
            ),
            "label": jnp.asarray(rng.integers(0, 2, (b, 4)).astype(np.float32)),
        },
    }


def test_weight_decay_mask(model):
    mask = optim.weight_decay_mask(model.params)
    assert mask["logit_scale"] is False
    assert mask["backbone"]["post_layernorm"]["scale"] is False
    assert mask["backbone"]["layers"][0]["attention"]["qkv"]["kernel"] is True


def test_layer_decay_scales(model):
    scales = optim.layer_decay_scales(
        model.params["backbone"], CFG.num_hidden_layers, 0.75
    )
    emb = scales["embeddings"]["position_embeddings"]
    l0 = scales["layers"][0]["attention"]["qkv"]["kernel"]
    l1 = scales["layers"][1]["attention"]["qkv"]["kernel"]
    head = scales["map_head"]["probe"]
    assert emb < l0 < l1 < head == 1.0


def test_layer_decay_composes_with_trainable_mask(model):
    """Regression: layer_decay + trainable_mask crashed at the first update
    (precomputed scale tree vs MaskedNode leaves inside multi_transform)."""
    lr = optim.cosine_lr_schedule(1e-3, 1e-6, epochs=1, steps_per_epoch=10)
    trainable = optim.trainable_mask_frozen_text(model.params)
    tx = optim.create_optimizer(
        model.params, lr, weight_decay=0.01, clip_grad=1.0,
        layer_decay=0.75, num_layers=CFG.num_hidden_layers,
        trainable_mask=trainable,
    )
    state = tx.init(model.params)
    grads = jax.tree.map(jnp.ones_like, model.params)
    updates, state = tx.update(grads, state, model.params)
    # frozen (text) leaves get exactly zero updates
    assert all(
        float(jnp.abs(u).max()) == 0.0
        for u in jax.tree.leaves(updates["text"])
    )
    # LLRD ordering: |update| grows with depth (embeddings < layer0 < head)
    emb = float(
        jnp.abs(updates["backbone"]["embeddings"]["position_embeddings"]).max()
    )
    l0 = float(
        jnp.abs(
            updates["backbone"]["layers"][0]["attention"]["qkv"]["kernel"]
        ).max()
    )
    probe = float(jnp.abs(updates["backbone"]["map_head"]["probe"]).max())
    assert emb < l0 < probe


def test_lr_schedule_warmup_and_decay():
    sched = optim.cosine_lr_schedule(1e-3, 1e-6, epochs=2, steps_per_epoch=50,
                                     warmup_epochs=1)
    assert float(sched(0)) < 1e-4
    np.testing.assert_allclose(float(sched(50)), 1e-3, rtol=1e-4)
    assert float(sched(99)) < 2e-4


def test_multitask_training_loss_decreases(model, rng):
    lr = optim.cosine_lr_schedule(3e-3, 1e-5, epochs=1, steps_per_epoch=20)
    tx = optim.create_optimizer(model.params, lr, weight_decay=0.01,
                                clip_grad=1.0)
    trainer = MultitaskTrainer(model, tx, update_freq=1)
    # donated steps invalidate the input buffers — give the state its own copy
    state = TrainState.create(jax.tree.map(jnp.copy, model.params), tx)

    cb = _class_batch(rng)
    gb = _grounding_batch(rng)
    first = {}
    last = {}
    key = jax.random.PRNGKey(0)
    for i in range(8):
        for task, batch in [("Kinetics", cb), ("CharadesSTA", gb)]:
            key, sub = jax.random.split(key)
            fn = trainer.step_fn(task, apply_update=True)
            state, out = fn(state, batch["pixel_values"], batch["task_input"], sub)
            loss = float(out["loss"])
            first.setdefault(task, loss)
            last[task] = loss
    for task in first:
        assert last[task] < first[task], (task, first[task], last[task])
    assert int(state.step) == 16


def test_grad_accumulation_equivalence(model, rng):
    """update_freq=2 on two identical batches == one step with the same batch
    (grads averaged)."""
    tx = optax.sgd(0.1)
    b = _class_batch(rng)
    key = jax.random.PRNGKey(1)

    tr1 = MultitaskTrainer(model, tx, update_freq=1, donate_state=False)
    s1 = TrainState.create(model.params, tx)
    fn1 = tr1.step_fn("Kinetics", True)
    s1, _ = fn1(s1, b["pixel_values"], b["task_input"], key)

    tr2 = MultitaskTrainer(model, tx, update_freq=2, donate_state=False)
    s2 = TrainState.create(model.params, tx)
    fna = tr2.step_fn("Kinetics", False)
    fnb = tr2.step_fn("Kinetics", True)
    s2, _ = fna(s2, b["pixel_values"], b["task_input"], key)
    s2, _ = fnb(s2, b["pixel_values"], b["task_input"], key)

    p1 = s1.params["backbone"]["layers"][0]["attention"]["qkv"]["kernel"]
    p2 = s2.params["backbone"]["layers"][0]["attention"]["qkv"]["kernel"]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-6)


def test_trainable_mask_freezes_lora_base(model):
    mask = optim.trainable_mask_lora_spatial(model.params["backbone"])
    l0 = mask["layers"][0]
    assert l0["attention"]["qkv"]["kernel"] is False
    assert l0["attention"]["out"]["kernel"] is False
    assert l0["temporal_attention"]["qkv"]["kernel"] is True
    assert l0["mlp"]["fc1"]["kernel"] is True


def test_checkpoint_roundtrip(model, tmp_path):
    from streamformer_tpu.train import checkpoint as ckpt

    tx = optax.sgd(0.1)
    state = TrainState.create(model.params, tx)
    ckpt.save_checkpoint(str(tmp_path), epoch=3, params=state.params,
                         opt_state=None, step=17)
    assert ckpt.latest_checkpoint(str(tmp_path)) == 3
    like = {"params": state.params, "opt_state": {},
            "meta": {"epoch": np.asarray(0, np.int64), "step": np.asarray(0, np.int64)}}
    out = ckpt.auto_resume(str(tmp_path), like)
    assert out["meta"]["epoch"] == 3 and out["meta"]["step"] == 17
    p0 = out["params"]["backbone"]["post_layernorm"]["scale"]
    np.testing.assert_array_equal(
        np.asarray(p0), np.asarray(state.params["backbone"]["post_layernorm"]["scale"])
    )


def test_mesh_trainer_matches_single_device(model, rng):
    """VERDICT r1 #2: the production trainer on a (data, model) mesh must
    reproduce single-device loss curves exactly (GSPMD sees the same global
    batch; fp32 + highest matmul precision)."""
    from streamformer_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(data=4, model=2)
    batches = [
        ("Kinetics", _class_batch(rng, b=8)),
        ("TaskRetrieval", {
            "pixel_values": jnp.asarray(
                rng.standard_normal((8, 4, 3, 32, 32)).astype(np.float32)
            ),
            "task_input": {
                "caption_ids": jnp.asarray(
                    rng.integers(0, 64, (8, 8)).astype(np.int32)
                ),
            },
        }),
        ("Kinetics", _class_batch(rng, b=8)),
        ("Kinetics", _class_batch(rng, b=8)),
    ]

    def run(mesh_arg):
        lr = optim.cosine_lr_schedule(1e-3, 1e-5, epochs=1, steps_per_epoch=4)
        tx = optim.create_optimizer(model.params, lr, weight_decay=0.01)
        trainer = MultitaskTrainer(model, tx, update_freq=2, mesh=mesh_arg)
        params = jax.tree.map(jnp.copy, model.params)
        if mesh_arg is not None:
            from streamformer_tpu.parallel import sharding as sh

            params = sh.shard_params(params, mesh_arg)
        state = TrainState.create(params, tx)
        state, stats = trainer.train_one_epoch(
            state, iter(list(batches)), 0, jax.random.PRNGKey(0)
        )
        return stats, jax.device_get(state.params)

    stats_1, params_1 = run(None)
    stats_m, params_m = run(mesh)
    assert stats_1.keys() == stats_m.keys()
    for k in stats_1:
        np.testing.assert_allclose(stats_1[k], stats_m[k], rtol=1e-5,
                                   err_msg=k)
    # losses/grad norms agree to reduction-order noise (~1e-7 rel); params
    # drift more because adam's g/sqrt(v) amplifies that noise where both
    # are ~0 — bound it loosely as a sanity check
    flat_1 = jax.tree.leaves(params_1)
    flat_m = jax.tree.leaves(params_m)
    for a, b in zip(flat_1, flat_m):
        np.testing.assert_allclose(a, b, atol=2e-3, rtol=1e-2)


def test_profile_steps_capture_trace(model, rng, tmp_path):
    """profile_steps captures a jax.profiler TensorBoard trace of the
    steady-state window (the rebuild's flops_profiler analog, SURVEY 5.1)
    without perturbing the training results."""
    lr = optim.cosine_lr_schedule(1e-3, 1e-5, epochs=1, steps_per_epoch=6)
    tx = optim.create_optimizer(model.params, lr, weight_decay=0.01)
    trainer = MultitaskTrainer(model, tx, update_freq=1)
    state = TrainState.create(jax.tree.map(jnp.copy, model.params), tx)
    batches = [("Kinetics", _class_batch(rng)) for _ in range(6)]
    prof_dir = str(tmp_path / "profile")
    state, stats = trainer.train_one_epoch(
        state, iter(batches), 0, jax.random.PRNGKey(0),
        profile_steps=2, profile_dir=prof_dir,
    )
    assert int(state.step) == 6
    # jax.profiler writes plugins/profile/<run>/ under the trace dir
    hits = []
    for base, _dirs, files in os.walk(prof_dir):
        hits += [f for f in files if f.endswith((".trace.json.gz", ".xplane.pb"))]
    assert hits, f"no trace artifacts under {prof_dir}"


def test_profile_steps_epoch_shorter_than_window(model, rng, tmp_path):
    """An epoch that ends inside the profiling window must still stop the
    trace cleanly (the finally path) and train every batch."""
    lr = optim.cosine_lr_schedule(1e-3, 1e-5, epochs=1, steps_per_epoch=3)
    tx = optim.create_optimizer(model.params, lr, weight_decay=0.01)
    trainer = MultitaskTrainer(model, tx, update_freq=1)
    state = TrainState.create(jax.tree.map(jnp.copy, model.params), tx)
    batches = [("Kinetics", _class_batch(rng)) for _ in range(3)]
    state, _ = trainer.train_one_epoch(
        state, iter(batches), 0, jax.random.PRNGKey(0),
        profile_steps=50, profile_dir=str(tmp_path / "p2"),
    )
    assert int(state.step) == 3


def test_encode_texts_uses_passed_params(model):
    """Mid-training evals (validate_retrieval) pass the trainer's CURRENT
    state tree — ``self.params`` aliases buffers the first donated step
    deletes on TPU, so encode_texts must read the passed tree."""
    texts = ["a video of a dog"]
    base = np.asarray(model.encode_texts(texts))
    zeroed = jax.tree.map(jnp.zeros_like, model.params)
    out = np.asarray(model.encode_texts(texts, params=zeroed))
    assert not np.allclose(base, out)


def test_epoch_start_discards_leftover_accum(model, rng):
    """An epoch whose micro-batch count is not a multiple of update_freq
    leaves accum_count != 0; the NEXT epoch must reset it (reference
    zero_grad at epoch start) — regression for an AttributeError on the
    plain-dataclass TrainState."""
    lr = optim.cosine_lr_schedule(1e-3, 1e-5, epochs=2, steps_per_epoch=2)
    tx = optim.create_optimizer(model.params, lr, weight_decay=0.01)
    trainer = MultitaskTrainer(model, tx, update_freq=2)
    state = TrainState.create(jax.tree.map(jnp.copy, model.params), tx)
    batches = [("Kinetics", _class_batch(rng)) for _ in range(3)]  # odd
    state, _ = trainer.train_one_epoch(
        state, iter(batches), 0, jax.random.PRNGKey(0)
    )
    assert int(state.accum_count) == 1
    state, _ = trainer.train_one_epoch(
        state, iter(batches), 1, jax.random.PRNGKey(1)
    )
    assert int(state.accum_count) == 1  # 3 % 2, from THIS epoch only
    assert int(state.step) == 2


def test_logged_lr_matches_applied_lr(model, rng):
    """The opt/lr point logged for an update is the lr that update was
    APPLIED with (inject_hyperparams evaluates schedules at the pre-update
    count, starting at 0) — it was logged one step ahead."""
    from streamformer_tpu.train import metrics as metrics_lib

    lr = optim.cosine_lr_schedule(1e-2, 1e-5, epochs=1, steps_per_epoch=4,
                                  warmup_epochs=1)
    tx = optim.create_optimizer(model.params, lr, weight_decay=0.01)
    trainer = MultitaskTrainer(model, tx, update_freq=1)
    state = TrainState.create(jax.tree.map(jnp.copy, model.params), tx)
    batches = [("Kinetics", _class_batch(rng)) for _ in range(4)]

    logged = []

    class _Writer:
        def set_step(self):
            pass

        def update(self, head="", **kw):
            if head == "opt" and "lr" in kw:
                logged.append(kw["lr"])

    trainer.train_one_epoch(
        state, iter(batches), 0, jax.random.PRNGKey(0),
        log_writer=_Writer(), lr_schedule=lr, print_freq=1,
    )
    want = [float(lr(i)) for i in range(4)]
    np.testing.assert_allclose(logged, want, rtol=1e-6)


def test_preemption_stop_and_exact_resume(model, rng, tmp_path):
    """SIGTERM-style early stop + mid-epoch resume reproduces an
    uninterrupted epoch bit-for-bit: should_stop halts after an optimizer
    update, and start_micro fast-forwards the rng stream while the caller
    re-feeds the same epoch's remaining batches."""
    batches = [("Kinetics", _class_batch(rng)) for _ in range(6)]

    def make():
        lr = optim.cosine_lr_schedule(1e-3, 1e-5, epochs=1, steps_per_epoch=6)
        tx = optim.create_optimizer(model.params, lr, weight_decay=0.01)
        trainer = MultitaskTrainer(model, tx, update_freq=1)
        return trainer, TrainState.create(jax.tree.map(jnp.copy, model.params), tx)

    # A: uninterrupted
    trainer, state_a = make()
    state_a, stats_a = trainer.train_one_epoch(
        state_a, iter(batches), 0, jax.random.PRNGKey(7)
    )
    assert "preempted_at_micro" not in stats_a

    # B: stop after the 3rd update, then resume from micro=3
    trainer, state_b = make()
    polls = []

    def stop():
        polls.append(1)
        return len(polls) >= 3

    state_b, stats_b = trainer.train_one_epoch(
        state_b, iter(batches), 0, jax.random.PRNGKey(7), should_stop=stop
    )
    assert stats_b["preempted_at_micro"] == 3
    assert int(state_b.step) == 3
    state_b, _ = trainer.train_one_epoch(
        state_b, iter(batches[3:]), 0, jax.random.PRNGKey(7), start_micro=3
    )
    assert int(state_b.step) == 6

    for a, b in zip(jax.tree.leaves(jax.device_get(state_a.params)),
                    jax.tree.leaves(jax.device_get(state_b.params))):
        np.testing.assert_array_equal(a, b)


def test_preemption_stops_only_on_update_boundary(model, rng):
    """With grad accumulation the stop must land where the accumulation
    buffer is empty — never mid-window — so nothing unsaved is lost."""
    lr = optim.cosine_lr_schedule(1e-3, 1e-5, epochs=1, steps_per_epoch=4)
    tx = optim.create_optimizer(model.params, lr, weight_decay=0.01)
    trainer = MultitaskTrainer(model, tx, update_freq=2)
    state = TrainState.create(jax.tree.map(jnp.copy, model.params), tx)
    batches = [("Kinetics", _class_batch(rng)) for _ in range(8)]
    state, stats = trainer.train_one_epoch(
        state, iter(batches), 0, jax.random.PRNGKey(0),
        should_stop=lambda: True,
    )
    # stopped at the FIRST update boundary: 2 micro-batches, 1 update
    assert stats["preempted_at_micro"] == 2
    assert int(state.step) == 1
    assert int(state.accum_count) == 0


def test_checkpoint_micro_roundtrip(model, tmp_path):
    """Mid-epoch checkpoints carry the micro-batch offset through
    save/auto_resume; epoch-complete saves report micro=0."""
    from streamformer_tpu.train import checkpoint as ckpt_lib

    lr = optim.cosine_lr_schedule(1e-3, 1e-5, epochs=1, steps_per_epoch=2)
    tx = optim.create_optimizer(model.params, lr, weight_decay=0.01)
    state = TrainState.create(jax.tree.map(jnp.copy, model.params), tx)
    out = str(tmp_path / "ckpt")
    os.makedirs(out)
    ckpt_lib.save_checkpoint(out, 3, state.params, state.opt_state,
                             step=17, micro=5)
    like = {
        "params": state.params,
        "opt_state": state.opt_state,
        "meta": {"epoch": np.asarray(0, np.int64),
                 "step": np.asarray(0, np.int64)},
    }
    restored = ckpt_lib.auto_resume(out, like)
    assert restored["meta"] == {"epoch": 3, "step": 17, "micro": 5}


def test_async_checkpoint_roundtrip(model, tmp_path):
    """Non-blocking saves (block=False): the train loop schedules disk I/O on
    orbax's background thread and keeps going; wait_for_checkpoints() (also
    called from latest_checkpoint/restore) is the durability barrier. Mutating
    the live params right after save must not corrupt the staged copy — orbax
    stages the host copy synchronously inside save()."""
    from streamformer_tpu.train import checkpoint as ckpt_lib

    tx = optax.sgd(0.1)
    state = TrainState.create(jax.tree.map(jnp.copy, model.params), tx)
    out = str(tmp_path / "ckpt")
    os.makedirs(out)
    saved_scale = np.asarray(
        state.params["backbone"]["post_layernorm"]["scale"]
    ).copy()
    ckpt_lib.save_checkpoint(out, 0, state.params, None, step=1, block=False)
    # "next epoch" mutates params while the save may still be in flight
    mutated = jax.tree.map(lambda x: x + 1.0, state.params)
    ckpt_lib.save_checkpoint(out, 1, mutated, None, step=2, block=False)
    ckpt_lib.wait_for_checkpoints()
    assert ckpt_lib.latest_checkpoint(out) == 1
    like = {"params": state.params, "opt_state": {},
            "meta": {"epoch": np.asarray(0, np.int64),
                     "step": np.asarray(0, np.int64),
                     "micro": np.asarray(0, np.int64)}}
    ep0 = ckpt_lib.restore_checkpoint(out, 0, like)
    np.testing.assert_array_equal(
        np.asarray(ep0["params"]["backbone"]["post_layernorm"]["scale"]),
        saved_scale,
    )
    ep1 = ckpt_lib.restore_checkpoint(out, 1, like)
    np.testing.assert_allclose(
        np.asarray(ep1["params"]["backbone"]["post_layernorm"]["scale"]),
        saved_scale + 1.0,
        rtol=1e-6,
    )
