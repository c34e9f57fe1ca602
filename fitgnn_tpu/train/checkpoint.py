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


# ---------------------------------------------------------------------------
# Mid-training resume (full session state)
# ---------------------------------------------------------------------------
# The tunnel's TPU worker can die mid-session (PERFORMANCE.md round 4);
# at products scale re-running the whole curriculum costs tens of minutes
# of remote compiles.  A resume checkpoint carries everything the loop
# needs to continue EXACTLY: train state (params + opt state + step),
# best-val tracking, the raw epoch rng key (so the dropout/shuffle stream
# replays bit-for-bit), the phase/epoch/run cursor, and the results of
# completed runs.  The reference has no analog (best-val weights only,
# run.py:355-360).

_PHASES = ("gc", "gs")


def save_resume(path: str, state: TrainState, best_params: Any,
                best_val: float, rng: Any, phase: str, epoch: int,
                run: int, done_results: Any, since_best: int = 0,
                config_fp: int = 0) -> None:
    import numpy as np

    ckpt = {
        "config_fp": np.int64(config_fp),
        "params": state.params, "opt_state": state.opt_state,
        "step": state.step, "best_params": best_params,
        "best_val": np.float64(best_val), "rng": rng,
        "phase": np.int64(_PHASES.index(phase)),
        "epoch": np.int64(epoch), "run": np.int64(run),
        "since_best": np.int64(since_best),
        # orbax refuses zero-size arrays: an all-NaN sentinel row marks
        # "no completed runs yet" and is dropped on load
        "done_results": (np.asarray(done_results,
                                    dtype=np.float64).reshape(-1, 3)
                         if len(done_results)
                         else np.full((1, 3), np.nan)),
    }
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), ckpt, force=True)


def load_resume(path: str, state: TrainState, rng_like: Any,
                config_fp: int = 0):
    """Returns ``(state, best_params, best_val, rng, phase, epoch, run,
    done_results, since_best)`` or ``None`` when no checkpoint exists."""
    import numpy as np

    path = os.path.abspath(path)
    if not os.path.isdir(path):
        return None
    target = {
        "config_fp": np.int64(0),
        "params": state.params, "opt_state": state.opt_state,
        "step": state.step, "best_params": state.params,
        "best_val": np.float64(0.0), "rng": rng_like,
        "phase": np.int64(0), "epoch": np.int64(0), "run": np.int64(0),
        "since_best": np.int64(0),
        "done_results": None,
    }
    with ocp.PyTreeCheckpointer() as ckptr:
        # completed-run count isn't known until load: shape the target
        # from the checkpoint's own metadata
        meta = ckptr.metadata(path).item_metadata
        target["done_results"] = np.zeros(
            tuple(meta["done_results"].shape))
        r = ckptr.restore(path, item=target)
    if config_fp and int(r["config_fp"]) and int(r["config_fp"]) != config_fp:
        raise ValueError(
            "resume checkpoint was written under a DIFFERENT config "
            "(seed/epochs/model/schedule) — continuing would produce "
            "results belonging to neither; delete the resume dir or "
            "rerun with the original flags")
    state = state.replace(params=r["params"], opt_state=r["opt_state"],
                          step=r["step"])
    done = np.asarray(r["done_results"]).reshape(-1, 3)
    done = done[~np.isnan(done).all(axis=1)]
    return (state, r["best_params"], float(r["best_val"]), r["rng"],
            _PHASES[int(r["phase"])], int(r["epoch"]), int(r["run"]),
            done, int(r["since_best"]))
