"""Multi-host scaffolding: jax.distributed loopback smoke (single-process
coordinator on localhost) and community→shard placement invariants."""

import os
import socket
import subprocess
import sys

import numpy as np

from fitgnn_tpu.parallel.multihost import placement_by_community

_LOOPBACK_PROG = r"""
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address="localhost:%d",
                           num_processes=1, process_id=0)
assert jax.process_count() == 1 and jax.process_index() == 0
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map
import functools, jax.numpy as jnp

mesh = Mesh(np.array(jax.devices()), ("data",))

@functools.partial(shard_map, mesh=mesh, in_specs=P("data"), out_specs=P())
def total(x):
    return jax.lax.psum(jnp.sum(x), "data")

out = float(total(jnp.arange(float(8 * len(jax.devices())))))
expected = sum(range(8 * len(jax.devices())))
assert out == expected, (out, expected)
jax.distributed.shutdown()
print("loopback-ok", out)
"""


class TestDistributedLoopback:
    def test_single_process_coordinator(self):
        """jax.distributed.initialize over a localhost coordinator, then a
        psum over the virtual device mesh — run in a subprocess because the
        test process's JAX is already initialized."""
        with socket.socket() as s:
            s.bind(("localhost", 0))
            port = s.getsockname()[1]
        env = dict(os.environ,
                   JAX_PLATFORMS="cpu",
                   XLA_FLAGS="--xla_force_host_platform_device_count=4")
        proc = subprocess.run(
            [sys.executable, "-c", _LOOPBACK_PROG % port],
            capture_output=True, text=True, timeout=240, env=env)
        assert proc.returncode == 0, proc.stderr[-2000:]
        assert "loopback-ok" in proc.stdout


_TWO_PROC_PROG = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address="localhost:%d",
                           num_processes=2, process_id=int(sys.argv[1]))
import jax.numpy as jnp
from jax.experimental import multihost_utils
assert jax.process_count() == 2
x = jnp.ones(8) * (jax.process_index() + 1)
total = multihost_utils.process_allgather(x)
assert float(total.sum()) == 24.0, float(total.sum())
jax.distributed.shutdown()
print("twoproc-ok")
"""


class TestTwoProcessCollectives:
    def test_cross_process_allgather(self):
        """REAL multi-process run: two jax.distributed processes exchange
        data through the coordinator (the multi-host pod-slice pattern,
        Gloo-backed on CPU)."""
        with socket.socket() as s:
            s.bind(("localhost", 0))
            port = s.getsockname()[1]
        env = dict(os.environ, JAX_PLATFORMS="cpu",
                   XLA_FLAGS="--xla_force_host_platform_device_count=1")
        procs = [subprocess.Popen(
            [sys.executable, "-c", _TWO_PROC_PROG % port, str(i)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True) for i in range(2)]
        for p in procs:
            out, err = p.communicate(timeout=240)
            assert p.returncode == 0, err[-2000:]
            assert "twoproc-ok" in out


class TestTwoProcessTrainStep:
    def test_cross_process_hier_train_matches_single_process(self):
        """2 processes × 4 virtual CPU devices run the hier train step over
        the global 2×4 mesh; per-step losses must equal the single-process
        8-device run (identical data/params/rng).  The pod-slice pattern is
        TRAINED across a real process boundary, not just allgathered."""
        import jax
        from jax.sharding import Mesh
        from fitgnn_tpu.parallel import CHIP_AXIS, HOST_AXIS
        from tests.hier_two_proc_helper import build, run_steps

        # single-process reference on this process's 8 virtual devices
        sg, plan, model, state = build()
        mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4),
                    (HOST_AXIS, CHIP_AXIS))
        ref = run_steps(mesh, sg, plan, model, state)

        with socket.socket() as s:
            s.bind(("localhost", 0))
            port = s.getsockname()[1]
        env = dict(os.environ, JAX_PLATFORMS="cpu",
                   XLA_FLAGS="--xla_force_host_platform_device_count=4",
                   PYTHONPATH="/root/repo")
        script = os.path.join(os.path.dirname(__file__),
                              "hier_two_proc_helper.py")
        procs = [subprocess.Popen(
            [sys.executable, script, str(port), str(i)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True) for i in range(2)]
        outs = []
        for p in procs:
            out, err = p.communicate(timeout=300)
            assert p.returncode == 0, err[-3000:]
            outs.append(out)
        line = next(ln for ln in outs[0].splitlines()
                    if ln.startswith("twoproc-losses"))
        got = [float(v) for v in line.split()[1:]]
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


class TestPlacement:
    def test_contiguous_and_balanced(self):
        rng = np.random.default_rng(0)
        labels = rng.integers(0, 40, 4000)
        order, shard_of = placement_by_community(labels, 8)
        # contiguity: sorted by shard after permutation
        assert (np.diff(shard_of[order]) >= 0).all()
        # communities stay whole
        for c in np.unique(labels):
            assert len(np.unique(shard_of[labels == c])) == 1
        # balance: no shard more than 50% above the mean
        loads = np.bincount(shard_of, minlength=8)
        assert loads.max() <= loads.mean() * 1.5
