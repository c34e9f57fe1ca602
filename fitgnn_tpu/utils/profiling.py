"""Profiling/tracing helpers.

TPU counterpart of the reference's ad-hoc timers (``inference.py:408,665``),
BONSAI's ``Timer``/cProfile context managers (``Baselines/BONSAI/timing.py``,
``my_profiling.py``), upgraded with ``jax.profiler`` device traces viewable
in Perfetto/TensorBoard.
"""

from __future__ import annotations

import contextlib
import cProfile
import io
import pstats
import time
from typing import Iterator, Optional


class Timer:
    """``with Timer("phase") as t: ...`` → t.elapsed seconds."""

    def __init__(self, name: str = "", verbose: bool = False):
        self.name = name
        self.verbose = verbose
        self.elapsed = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self._t0
        if self.verbose:
            print(f"[{self.name}] {self.elapsed:.4f}s")


@contextlib.contextmanager
def device_trace(logdir: str) -> Iterator[None]:
    """Capture a jax.profiler device trace (open in Perfetto / TensorBoard).
    No-op if the profiler can't start (e.g. unsupported backend)."""
    import jax
    started = False
    try:
        jax.profiler.start_trace(logdir)
        started = True
    except Exception:
        pass
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


@contextlib.contextmanager
def python_profile(sort: str = "cumulative", top: int = 30,
                   out: Optional[list] = None) -> Iterator[None]:
    """cProfile a host-side block; prints (or appends to ``out``) the top
    entries (reference ``my_profiling.py`` semantics)."""
    pr = cProfile.Profile()
    pr.enable()
    try:
        yield
    finally:
        pr.disable()
        s = io.StringIO()
        pstats.Stats(pr, stream=s).sort_stats(sort).print_stats(top)
        if out is not None:
            out.append(s.getvalue())
        else:
            print(s.getvalue())
