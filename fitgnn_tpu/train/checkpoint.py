"""Model/optimizer checkpointing via Orbax.

The reference saves only best-val model weights (``torch.save(state_dict)``,
``run.py:355-360``) with no optimizer state and no mid-training resume;
here a checkpoint carries params + opt state + step so training can resume
exactly (SURVEY §5 checkpoint/resume gap)."""

from __future__ import annotations

import os
from typing import Any

import orbax.checkpoint as ocp

from fitgnn_tpu.train.steps import TrainState


def save_checkpoint(path: str, state: TrainState) -> None:
    path = os.path.abspath(path)
    ckpt = {"params": state.params, "opt_state": state.opt_state,
            "step": state.step}
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, ckpt, force=True)


def restore_checkpoint(path: str, state: TrainState) -> TrainState:
    """Restore into an existing state (shapes/tree from ``state``)."""
    path = os.path.abspath(path)
    target = {"params": state.params, "opt_state": state.opt_state,
              "step": state.step}
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(path, item=target)
    return state.replace(params=restored["params"],
                         opt_state=restored["opt_state"],
                         step=restored["step"])


def save_params(path: str, params: Any) -> None:
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), params, force=True)


def restore_params(path: str, like: Any) -> Any:
    with ocp.PyTreeCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(path), item=like)
