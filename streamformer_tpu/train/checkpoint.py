"""Checkpoint save/resume via orbax (reference utils.py:608-933).

Saves {params, opt_state, step, epoch} per epoch as ``checkpoint-<epoch>``
plus every-10th milestone retention
(run_finetuning_multi_task.py:492-518), and auto-resume from the latest
(utils.py:670-879). The reference's Ceph/petrel S3 staging (utils.py:642-667)
maps to orbax's pluggable filesystem — any fsspec-visible path works.

Saves can be ASYNC (``block=False``): orbax copies device arrays to host
synchronously (so donated/updated buffers are safe immediately) and writes
to disk on a background thread — the train loop resumes the next epoch while
the previous checkpoint serializes. The reference pays the full torch.save
(plus /dev/shm -> Ceph staging) on the training thread every epoch
(utils.py:622-667). ``wait_for_checkpoints()`` is the barrier; an atexit hook
guarantees the final in-flight save is durable even on early exit.
"""

from __future__ import annotations

import atexit
import os
import re
import shutil
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

_ASYNC_CKPTR: Optional[ocp.StandardCheckpointer] = None


def _checkpointer() -> ocp.StandardCheckpointer:
    """Process-wide AsyncCheckpointer (StandardCheckpointer IS async in
    orbax: save() stages a host copy then writes on a background thread;
    a second save() first waits for the in-flight one, so ordering holds)."""
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        _ASYNC_CKPTR = ocp.StandardCheckpointer()
        atexit.register(wait_for_checkpoints)
    return _ASYNC_CKPTR


def wait_for_checkpoints() -> None:
    """Barrier: block until every scheduled async save is finalized."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def _ckpt_dir(output_dir: str, epoch: int) -> str:
    return os.path.join(os.path.abspath(output_dir), f"checkpoint-{epoch}")


def _prune(output_dir: str, epoch: int, keep_every: int, keep_last: int):
    # retention: keep milestones (epoch % keep_every == 0 or epoch==0) and the
    # last keep_last epochs (reference saves every epoch, milestones forever).
    # Only FINALIZED dirs match checkpoint-(\d+): orbax stages async writes
    # under *.orbax-checkpoint-tmp-* and renames on commit, and save() always
    # waits out the previous in-flight save, so every epoch < the one just
    # scheduled is committed by now.
    eps = sorted(
        int(m.group(1))
        for d in os.listdir(output_dir)
        if (m := re.fullmatch(r"checkpoint-(\d+)", d))
    )
    for e in eps:
        if e % keep_every == 0:
            continue
        if e >= epoch - keep_last + 1:
            continue
        shutil.rmtree(_ckpt_dir(output_dir, e), ignore_errors=True)


def save_checkpoint(
    output_dir: str,
    epoch: int,
    params: Any,
    opt_state: Any = None,
    step: int = 0,
    keep_every: int = 10,
    keep_last: int = 2,
    micro: int = 0,
    block: bool = True,
):
    """``micro > 0`` marks a MID-EPOCH (preemption) checkpoint: that many
    micro-batches of ``epoch`` are already consumed, so resume should replay
    the same epoch from that offset instead of starting epoch+1.

    ``block=False`` returns as soon as the host copy is staged; disk I/O
    overlaps subsequent training. Callers that need durability NOW (e.g. the
    preemption save right before exiting) use the default ``block=True``."""
    path = _ckpt_dir(output_dir, epoch)
    ckptr = _checkpointer()
    ckptr.save(
        path,
        {
            "params": params,
            "opt_state": opt_state if opt_state is not None else {},
            "meta": {
                "epoch": np.asarray(epoch, np.int64),
                "step": np.asarray(step, np.int64),
                "micro": np.asarray(micro, np.int64),
            },
        },
        force=True,
    )
    if block:
        ckptr.wait_until_finished()
    _prune(output_dir, epoch, keep_every, keep_last)


def latest_checkpoint(output_dir: str) -> Optional[int]:
    wait_for_checkpoints()  # an in-flight async save must be visible
    if not os.path.isdir(output_dir):
        return None
    eps = [
        int(m.group(1))
        for d in os.listdir(output_dir)
        if (m := re.fullmatch(r"checkpoint-(\d+)", d))
    ]
    return max(eps) if eps else None


def restore_checkpoint(
    output_dir: str, epoch: int, like: Dict[str, Any]
) -> Dict[str, Any]:
    """Restore with the given pytree structure template."""
    wait_for_checkpoints()
    path = _ckpt_dir(output_dir, epoch)
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, like)


def auto_resume(
    output_dir: str, like: Dict[str, Any]
) -> Optional[Dict[str, Any]]:
    """Resume from the newest checkpoint-* if present
    (reference auto_load_model, utils.py:670-879)."""
    e = latest_checkpoint(output_dir)
    if e is None:
        return None
    like = dict(like)
    like["meta"] = {**like["meta"], "micro": np.asarray(0, np.int64)}
    try:
        out = restore_checkpoint(output_dir, e, like)
    except Exception:
        # checkpoint predates the mid-epoch 'micro' field: restore without
        # it and treat the epoch as complete
        like["meta"] = {
            k: v for k, v in like["meta"].items() if k != "micro"
        }
        out = restore_checkpoint(output_dir, e, like)
        out["meta"]["micro"] = 0
    out["meta"]["epoch"] = int(out["meta"]["epoch"])
    out["meta"]["step"] = int(out["meta"]["step"])
    out["meta"]["micro"] = int(out["meta"]["micro"])
    return out
