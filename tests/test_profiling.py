"""Profiling helpers."""

import time

from fitgnn_tpu.utils.profiling import Timer, python_profile, device_trace


def test_timer():
    with Timer("t") as t:
        time.sleep(0.01)
    assert t.elapsed >= 0.01


def test_python_profile_captures(capsys):
    out = []
    with python_profile(out=out):
        sum(range(10000))
    assert out and "function calls" in out[0]


def test_device_trace_noop(tmp_path):
    # must not raise even if the profiler can't start on this backend
    with device_trace(str(tmp_path)):
        pass
