"""Mid-training resume: a killed run continues to IDENTICAL results.

The resume checkpoint carries params + opt state + best-val tracking +
the raw epoch rng key + the phase/epoch/run cursor (train/checkpoint.py),
so the continued session replays the exact stream the uninterrupted one
would have produced.  The reference has no analog (best-val weights only,
run.py:355-360); here a dead products-scale session costs only the epochs
since the last save (PERFORMANCE.md round 4: the tunnel worker can die)."""

import dataclasses

import numpy as np
import pytest

from fitgnn_tpu.data.splits import splits_classification
from fitgnn_tpu.data.synthetic import sbm_graph
from fitgnn_tpu.partition import coarsen_and_partition
from fitgnn_tpu.train import NodeTaskConfig, run_node_task, steps


@pytest.fixture(scope="module")
def part():
    x, s, r, y = sbm_graph(num_nodes=200, num_classes=3, num_features=8,
                           p_in=0.1, p_out=0.01, seed=1)
    train, val, test = splits_classification(y, 3, "random", seed=1)
    return coarsen_and_partition(
        x, s, r, y, reduction=0.5, method="variation_neighborhoods",
        mode="extra_node", task="classification", num_classes=3,
        train_mask=train, val_mask=val, test_mask=test, seed=1)


def base_cfg(**kw):
    return NodeTaskConfig(
        layer_name="GCNConv", hidden=8, num_layers=2, task="classification",
        out_dim=3, exp_setup="Gc_train_2_Gs_train", epochs1=3, epochs2=4,
        gradient_method="GD", runs=2, seed=3, **kw)


class TestResume:
    @pytest.mark.parametrize("bomb_at", [3, 8])
    def test_resume_matches_uninterrupted(self, part, tmp_path, monkeypatch,
                                          bomb_at):
        """bomb_at=3: dies mid-Gs of run 0; bomb_at=8: dies in run 1 —
        both resume to the uninterrupted result."""
        full = run_node_task(base_cfg(), part.coarse, part.subgraphs)

        rp = str(tmp_path / f"resume{bomb_at}")
        cfg = base_cfg(resume_path=rp, checkpoint_every=1)
        calls = {"n": 0}
        orig = steps.gs_eval_step

        def bomb(*a, **kw):
            calls["n"] += 1
            if calls["n"] == bomb_at:
                raise RuntimeError("simulated worker crash")
            return orig(*a, **kw)

        monkeypatch.setattr(steps, "gs_eval_step", bomb)
        import fitgnn_tpu.train.loop as loop_mod
        monkeypatch.setattr(loop_mod.steps, "gs_eval_step", bomb)
        with pytest.raises(RuntimeError, match="simulated"):
            run_node_task(cfg, part.coarse, part.subgraphs)
        monkeypatch.setattr(loop_mod.steps, "gs_eval_step", orig)

        resumed = run_node_task(cfg, part.coarse, part.subgraphs,
                                verbose=True)
        assert len(resumed.runs) == len(full.runs) == 2
        for a, b in zip(full.runs, resumed.runs):
            np.testing.assert_allclose(a.test_loss, b.test_loss, rtol=1e-5)
            np.testing.assert_allclose(a.test_acc, b.test_acc, rtol=1e-6)

    def test_completed_session_resume_is_noop_fast(self, part, tmp_path):
        """Resuming a FINISHED session skips every run and reports the
        stored results."""
        rp = str(tmp_path / "resume_done")
        cfg = base_cfg(resume_path=rp, checkpoint_every=2)
        first = run_node_task(cfg, part.coarse, part.subgraphs)
        again = run_node_task(cfg, part.coarse, part.subgraphs)
        for a, b in zip(first.runs, again.runs):
            np.testing.assert_allclose(a.test_loss, b.test_loss, rtol=1e-6)
            np.testing.assert_allclose(a.test_acc, b.test_acc, rtol=1e-6)

    def test_fresh_run_without_resume_flag_ignores_stale(self, part,
                                                         tmp_path):
        """Without resume_path the loop never reads a stale checkpoint."""
        rp = str(tmp_path / "resume_stale")
        cfg = base_cfg(resume_path=rp, checkpoint_every=1)
        run_node_task(cfg, part.coarse, part.subgraphs)
        fresh = run_node_task(dataclasses.replace(cfg, resume_path=None),
                              part.coarse, part.subgraphs)
        assert len(fresh.runs) == 2


class TestResumeEdges:
    def test_run_boundary_marker_starts_next_run_fresh(self, part, tmp_path,
                                                       monkeypatch):
        """Crash in run 1's Gc phase BEFORE any periodic save: the only
        checkpoint is run 0's run-complete marker — the resumed run 1 must
        start from a FRESH init/rng (not run 0's final state) and land on
        the uninterrupted result."""
        full = run_node_task(base_cfg(), part.coarse, part.subgraphs)

        rp = str(tmp_path / "resume_marker")
        # checkpoint_every larger than epochs1 => no mid-Gc periodic saves
        cfg = base_cfg(resume_path=rp, checkpoint_every=50)
        calls = {"n": 0}
        orig = steps.gc_eval_step

        def bomb(*a, **kw):
            calls["n"] += 1
            if calls["n"] == 4:          # run 0 consumes 3 (epochs1=3)
                raise RuntimeError("simulated worker crash")
            return orig(*a, **kw)

        import fitgnn_tpu.train.loop as loop_mod
        monkeypatch.setattr(loop_mod.steps, "gc_eval_step", bomb)
        with pytest.raises(RuntimeError, match="simulated"):
            run_node_task(cfg, part.coarse, part.subgraphs)
        monkeypatch.setattr(loop_mod.steps, "gc_eval_step", orig)

        resumed = run_node_task(cfg, part.coarse, part.subgraphs)
        assert len(resumed.runs) == 2
        for a, b in zip(full.runs, resumed.runs):
            np.testing.assert_allclose(a.test_loss, b.test_loss, rtol=1e-5)
            np.testing.assert_allclose(a.test_acc, b.test_acc, rtol=1e-6)

    def test_config_mismatch_raises(self, part, tmp_path, monkeypatch):
        rp = str(tmp_path / "resume_fp")
        cfg = base_cfg(resume_path=rp, checkpoint_every=1)
        calls = {"n": 0}
        orig = steps.gs_eval_step

        def bomb(*a, **kw):
            calls["n"] += 1
            if calls["n"] == 3:
                raise RuntimeError("simulated worker crash")
            return orig(*a, **kw)

        import fitgnn_tpu.train.loop as loop_mod
        monkeypatch.setattr(loop_mod.steps, "gs_eval_step", bomb)
        with pytest.raises(RuntimeError):
            run_node_task(cfg, part.coarse, part.subgraphs)
        monkeypatch.setattr(loop_mod.steps, "gs_eval_step", orig)

        changed = dataclasses.replace(cfg, seed=99)
        with pytest.raises(ValueError, match="DIFFERENT config"):
            run_node_task(changed, part.coarse, part.subgraphs)
