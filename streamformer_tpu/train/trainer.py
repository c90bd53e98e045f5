"""Multitask trainer: per-task compiled train steps, grad accumulation,
epoch loop (reference run_finetuning_multi_task.py:229-584 +
tools/finetune_tools.py:360-639).

Design notes (TPU-native):

* One task per optimizer micro-step (the reference asserts this,
  tools/finetune_tools.py:412). Task name is static -> one compiled XLA
  program per task, cached and reused for the whole run.
* DP: the step is ``jax.jit`` over a global batch; with inputs sharded over
  a ``data`` mesh axis XLA partitions the model and emits the gradient
  reduce automatically (replacing DDP allreduce). The contrastive heads'
  "global batch" semantics hold by construction since jit sees the global
  array — the explicit ppermute ring in streamformer_tpu.parallel is the
  shard_map form for manual-collective scaling.
* Grad accumulation across steps with *different tasks* (the reference's
  balanced sampler feeds every task per update window): gradients accumulate
  in a buffer inside TrainState; the optimizer applies every
  ``update_freq`` micro-steps with grads scaled by 1/update_freq
  (NativeScaler path, tools/finetune_tools.py:543-573).
* bf16 compute / fp32 master params; no loss scaler needed on TPU
  (SURVEY §2.11 AMP row).
* Non-finite loss -> host raises (reference exits,
  tools/finetune_tools.py:533-541).
"""

from __future__ import annotations

import dataclasses
import math
import sys
import time
from functools import partial
from typing import Any, Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from streamformer_tpu.train import metrics as metrics_lib


@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    grad_accum: Any  # gradient buffer (zeros-like params)
    accum_count: jnp.ndarray  # () int32
    step: jnp.ndarray  # () int32

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation):
        return cls(
            params=params,
            opt_state=tx.init(params),
            grad_accum=jax.tree.map(jnp.zeros_like, params),
            accum_count=jnp.zeros((), jnp.int32),
            step=jnp.zeros((), jnp.int32),
        )


jax.tree_util.register_dataclass(
    TrainState,
    data_fields=["params", "opt_state", "grad_accum", "accum_count", "step"],
    meta_fields=[],
)


class NonFiniteLossError(RuntimeError):
    pass


class MultitaskTrainer:
    def __init__(
        self,
        model,  # MultitaskModel
        tx: optax.GradientTransformation,
        update_freq: int = 1,
        donate_state: bool = True,
        mesh=None,  # jax.sharding.Mesh -> DP/TP sharded steps
    ):
        self.model = model
        self.tx = tx
        self.update_freq = update_freq
        self._step_fns: Dict[Tuple[str, bool], Callable] = {}
        self._donate = donate_state
        self.mesh = mesh
        if mesh is not None:
            from streamformer_tpu.parallel import sharding as sh

            self._batch_ns = sh.batch_sharding(mesh)
            self._repl_ns = sh.replicated(mesh)

    # ------------------------------------------------------------------

    def shard_batch(self, batch):
        """Place a host/global batch on the mesh: leaves whose leading dim is
        the batch size go over ``data``, everything else (label tables,
        scalars) replicated. No-op without a mesh.

        Under multi-host (--distributed) each process loads only its
        rank-strided SLICE of the batch (run.py sampler), so batch-dim
        leaves assemble through ``jax.make_array_from_process_local_data``
        — a bare device_put with the global sharding would treat every
        process's local rows as the whole global array and scatter
        inconsistent halves across the mesh."""
        if self.mesh is None:
            return batch
        gb = batch["pixel_values"].shape[0]
        multi = jax.process_count() > 1

        def place(x):
            if not hasattr(x, "ndim") or x.ndim == 0:
                return x
            if x.shape[0] == gb:
                if multi:
                    return jax.make_array_from_process_local_data(
                        self._batch_ns, np.asarray(x)
                    )
                return jax.device_put(x, self._batch_ns)
            return jax.device_put(x, self._repl_ns)

        return jax.tree.map(place, batch)

    # ------------------------------------------------------------------

    def _build_step(self, task_name: str, apply_update: bool):
        update_freq = self.update_freq
        tx = self.tx
        model = self.model

        def loss_fn(params, pixel_values, task_input, rng):
            loss, logits = model.loss_fn(
                params,
                task_name,
                pixel_values,
                task_input,
                rng=rng,
                deterministic=False,
            )
            return loss, logits

        def step_fn(state: TrainState, pixel_values, task_input, rng):
            (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, pixel_values, task_input, rng
            )
            grads = jax.tree.map(
                lambda a, g: a + g / update_freq, state.grad_accum, grads
            )
            count = state.accum_count + 1
            if apply_update:
                grad_norm = optax.global_norm(grads)
                updates, opt_state = tx.update(grads, state.opt_state, state.params)
                params = optax.apply_updates(state.params, updates)
                new_state = TrainState(
                    params=params,
                    opt_state=opt_state,
                    grad_accum=jax.tree.map(jnp.zeros_like, grads),
                    accum_count=jnp.zeros((), jnp.int32),
                    step=state.step + 1,
                )
            else:
                grad_norm = jnp.zeros(())
                new_state = TrainState(
                    params=state.params,
                    opt_state=state.opt_state,
                    grad_accum=grads,
                    accum_count=count,
                    step=state.step,
                )
            return new_state, {"loss": loss, "grad_norm": grad_norm}

        donate = (0,) if self._donate else ()
        return jax.jit(step_fn, donate_argnums=donate)

    def step_fn(self, task_name: str, apply_update: bool):
        key = (task_name, apply_update)
        if key not in self._step_fns:
            self._step_fns[key] = self._build_step(task_name, apply_update)
        return self._step_fns[key]

    # ------------------------------------------------------------------

    def train_one_epoch(
        self,
        state: TrainState,
        batches: Iterable[Tuple[str, Dict[str, Any]]],
        epoch: int,
        rng: jax.Array,
        log_writer: Optional[metrics_lib.TensorboardLogger] = None,
        print_freq: int = 10,
        lr_schedule=None,
        profile_steps: int = 0,
        profile_dir: Optional[str] = None,
        should_stop: Optional[Callable[[], bool]] = None,
        start_micro: int = 0,
    ) -> Tuple[TrainState, Dict[str, float]]:
        """batches yields (task_name, {"pixel_values": ..., "task_input": ...}).

        ``profile_steps > 0`` captures a ``jax.profiler`` TensorBoard trace of
        that many steady-state micro-steps into ``profile_dir`` (compile and
        warm-up steps are skipped) — the rebuild's answer to the reference's
        DeepSpeed flops_profiler block (utils.py:1028-1034).

        Preemption (beyond the reference, which only resumes at epoch
        boundaries, utils.py:670-879): ``should_stop`` is polled after every
        optimizer update; when it returns True the loop flushes and returns
        early with ``stats["preempted_at_micro"]`` = micro-steps consumed.
        Stops land only on update boundaries, so the (unsaved) gradient-
        accumulation buffer is always empty. ``start_micro`` resumes: the
        caller re-feeds the SAME epoch's batch stream with the first
        ``start_micro`` batches skipped (MultitaskLoader.set_epoch
        start_step), and the per-step rng stream is fast-forwarded so the
        resumed run is bit-identical to an uninterrupted one.

        Losses stay on device between ``print_freq`` boundaries: a per-step
        host fetch (``float(loss)``) would serialize dispatch and kill
        host/TPU overlap — exactly the dispatch-bound behavior this rebuild
        avoids. Non-finite detection happens at each flush (reference exits
        immediately, tools/finetune_tools.py:533-541 — same outcome, at most
        print_freq steps later).
        """
        logger = metrics_lib.MetricLogger()
        # discard any leftover accumulation from a previous epoch whose
        # batch count was not a multiple of update_freq — the reference
        # zero_grads at epoch start (finetune_tools.py:391-394), and an
        # epoch-boundary checkpoint restores with an EMPTY buffer, so
        # zeroing here keeps resumed == uninterrupted bit-identical
        if int(state.accum_count) != 0:
            state = dataclasses.replace(
                state,
                grad_accum=jax.tree.map(jnp.zeros_like, state.grad_accum),
                accum_count=jnp.zeros((), jnp.int32),
            )
        micro = start_micro
        for _ in range(start_micro):  # replay the per-step rng stream
            rng, _ = jax.random.split(rng)
        preempted = False
        # host-side mirror of state.step (the device scalar is donated away
        # every step, and fetching it would force a sync)
        host_step = int(state.step)
        pending = []  # [(task_name, loss_dev, grad_norm_dev|None, step_int)]

        def flush():
            for tname, loss_dev, gnorm_dev, step_i in pending:
                loss = float(loss_dev)
                if not math.isfinite(loss):
                    raise NonFiniteLossError(
                        f"Loss is {loss} on task {tname}, stopping training"
                    )
                logger.update(**{f"loss_{tname}": loss, "loss": loss})
                if gnorm_dev is not None:
                    logger.update(grad_norm=float(gnorm_dev))
                if log_writer is not None:
                    log_writer.set_step()
                    log_writer.update(head="loss", **{tname: loss})
                    if lr_schedule is not None:
                        log_writer.update(
                            head="opt", lr=float(lr_schedule(int(step_i)))
                        )
            pending.clear()

        # steady-state profiling window: [skip, skip + profile_steps) —
        # anchored at start_micro so a mid-epoch resume still traces
        profile_skip = start_micro + 2 if profile_steps > 0 else -1
        tracing = False

        def stop_trace():
            nonlocal tracing
            if tracing:
                flush()  # sync barrier: drain pending device work into the trace
                jax.profiler.stop_trace()
                tracing = False

        try:
            for task_name, batch in logger.log_every(
                batches, print_freq, header=f"Epoch [{epoch}]"
            ):
                if micro == profile_skip:
                    flush()  # don't attribute earlier dispatch to the trace
                    jax.profiler.start_trace(profile_dir or "profile")
                    tracing = True
                apply_update = (micro + 1) % self.update_freq == 0
                rng, sub = jax.random.split(rng)
                fn = self.step_fn(task_name, apply_update)
                batch = self.shard_batch(batch)
                state, out = fn(state, batch["pixel_values"], batch["task_input"], sub)
                # record the optimizer count the update was APPLIED with
                # (inject_hyperparams evaluates schedules at the pre-update
                # count, which starts at 0) — logging post-increment shifted
                # every opt/lr point one step ahead
                step_applied = host_step
                if apply_update:
                    host_step += 1
                pending.append(
                    (
                        task_name,
                        out["loss"],
                        out["grad_norm"] if apply_update else None,
                        step_applied,
                    )
                )
                micro += 1
                if tracing and micro >= profile_skip + profile_steps:
                    stop_trace()
                if micro % print_freq == 0:
                    flush()
                if apply_update and should_stop is not None and should_stop():
                    preempted = True
                    break
        finally:
            stop_trace()
        flush()
        stats = {k: m.global_avg for k, m in logger.meters.items()}
        if preempted:
            stats["preempted_at_micro"] = micro
        return state, stats
