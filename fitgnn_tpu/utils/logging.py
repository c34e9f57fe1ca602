"""Training observability: per-run scalar logging.

The reference writes TensorBoard scalars per run (``run.py:339-371``,
``SummaryWriter`` per output dir).  This environment has no tensorboard
package, so the primary sink is an append-only JSONL stream per run
(machine-readable, plottable offline); a TensorBoard writer is used when the
package is importable.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional


class ScalarWriter:
    """Append scalars as JSONL rows: {"tag", "value", "step", "t"}."""

    def __init__(self, logdir: str, run: Optional[int] = None):
        self.dir = logdir if run is None else os.path.join(logdir,
                                                           f"run_{run}")
        os.makedirs(self.dir, exist_ok=True)
        self._f = open(os.path.join(self.dir, "scalars.jsonl"), "a")
        self._tb = None
        try:  # optional tensorboard sink
            from torch.utils.tensorboard import SummaryWriter  # type: ignore
            self._tb = SummaryWriter(self.dir)
        except Exception:
            pass

    def trim_replay(self, phase_prefix: str, min_step: int,
                    gc_done: bool = False) -> None:
        """Drop rows a dead session logged for epochs a resumed session is
        about to replay (keeps (tag, step) unique): ``phase_prefix`` rows
        with ``step >= min_step``, plus any later-phase (``Gs_``) rows when
        the resume point is still in the Gc phase."""
        path = os.path.join(self.dir, "scalars.jsonl")
        self._f.close()
        kept = []
        with open(path) as f:
            for line in f:
                try:
                    row = json.loads(line)
                except ValueError:
                    continue
                tag = row.get("tag", "")
                replayed = (tag.startswith(phase_prefix)
                            and row.get("step", 0) >= min_step)
                if not gc_done and phase_prefix == "Gc_":
                    replayed = replayed or tag.startswith("Gs_")
                if not replayed:
                    kept.append(line)
        with open(path, "w") as f:
            f.writelines(kept)
        self._f = open(path, "a")

    def add_scalar(self, tag: str, value, step: int) -> None:
        self._f.write(json.dumps({"tag": tag, "value": float(value),
                                  "step": int(step),
                                  "t": time.time()}) + "\n")
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), step)

    def flush(self) -> None:
        self._f.flush()
        if self._tb is not None:
            self._tb.flush()

    def close(self) -> None:
        self.flush()
        self._f.close()
        if self._tb is not None:
            self._tb.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
