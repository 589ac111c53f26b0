"""Two-process jax.distributed smoke test (the 2-host pod simulation the
reference never had — its multi-node story was Lightning's `num_nodes`).

Each subprocess initializes jax.distributed against a local coordinator,
contributes one CPU device, and runs a psum over the global mesh; the test
asserts both processes saw 2 global devices and the correct reduction.
Marked slow: spawns two fresh JAX processes (~30 s on this box).
"""
import os
import subprocess
import sys

import pytest

_WORKER = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 1)

from control_gic_tpu.parallel.multihost import initialize_multihost

pid = int(sys.argv[1])
initialize_multihost(coordinator_address="127.0.0.1:{port}",
                     num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 2, jax.device_count()

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

mesh = Mesh(np.asarray(jax.devices()), ("data",))
val = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data")), np.asarray([float(pid + 1)]), (2,))
total = jax.jit(lambda v: jnp.sum(v),
                out_shardings=NamedSharding(mesh, P()))(val)
assert float(total) == 3.0, float(total)
print(f"proc {pid}: OK global_devices={jax.device_count()} sum={float(total)}")
"""


@pytest.mark.slow
def test_two_process_psum(tmp_path):
    port = 12355 + os.getpid() % 1000
    script = tmp_path / "worker.py"
    script.write_text(_WORKER.replace("{port}", str(port)))
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    procs = [subprocess.Popen([sys.executable, str(script), str(i)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, env=env)
             for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out.decode())
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out
    assert all("OK global_devices=2" in o for o in outs), outs


@pytest.mark.slow
def test_multiproc_scaling_harness():
    """The two-process train-step scaling harness (tools/scaling_check.py
    --multiproc) runs end to end and reports an efficiency figure (CPU-mesh
    mechanism evidence for the >=85%-to-2-hosts target; round-4 recorded
    30.4% at 1 img/device, 77.0% at 8 — fixed cross-process collective
    latency amortized by per-step work)."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = root
    env["MP_PER_DEV"] = "2"
    out = subprocess.run(
        [sys.executable, os.path.join(root, "tools", "scaling_check.py"),
         "--multiproc", "--steps", "2"],
        capture_output=True, text=True, env=env, timeout=900)
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert "two-process efficiency" in out.stdout, out.stdout
