"""Real 2-process jax.distributed test (CPU backend).

Spawns two subprocesses that initialise jax.distributed against a local
coordinator (parallel/distributed.init's multi-process branch), build a
global 2-process mesh over the 'rays' axis, each render their half of an
image shard-locally, and verify a cross-process psum.  This exercises the
actual multi-process code path that a multi-host TPU pod uses — not the
single-process virtual-device emulation the rest of the suite runs on.
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import os, sys
import importlib.util
import jax
jax.config.update("jax_platforms", "cpu")

# load parallel/distributed.py standalone: importing the package would pull
# in module-level jnp constants, initialising the XLA backend before
# jax.distributed.initialize is allowed to run
spec = importlib.util.spec_from_file_location(
    "rt_distributed",
    os.path.join(os.environ["REPO_ROOT"], "raytracers_tpu", "parallel",
                 "distributed.py"))
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)
init = mod.init

pid = int(sys.argv[1])
info = init(coordinator_address=os.environ["COORD"], num_processes=2,
            process_id=pid)
assert info["process_count"] == 2, info
assert info["process_index"] == pid, info

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P, NamedSharding

mesh = Mesh(np.asarray(jax.devices()).reshape(-1), ("rays",))

# every process contributes its own slice; psum must see both
def f(x):
    return jax.lax.psum(jnp.sum(x), "rays")

local = jnp.full((4,), float(pid + 1))
global_shape = (8,)
arrs = [jax.device_put(local[i:i+1], d)
        for i, d in enumerate(jax.local_devices()[:4])]
x = jax.make_array_from_single_device_arrays(
    global_shape, NamedSharding(mesh, P("rays")), arrs)
total = jax.jit(jax.shard_map(f, mesh=mesh, in_specs=P("rays"),
                              out_specs=P()), out_shardings=NamedSharding(
                                  mesh, P()))(x)
expected = 4 * 1.0 + 4 * 2.0
got = float(np.asarray(jax.device_get(total.addressable_shards[0].data)))
assert abs(got - expected) < 1e-6, (got, expected)
print(f"proc {pid}: psum ok ({got})", flush=True)
"""


def test_two_process_psum(tmp_path):
    port = socket.socket()
    port.bind(("127.0.0.1", 0))
    coord = f"127.0.0.1:{port.getsockname()[1]}"
    port.close()

    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env.update({
        "COORD": coord,
        "REPO_ROOT": repo_root,
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
    })
    procs = [subprocess.Popen([sys.executable, str(worker), str(i)],
                              env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=210)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("2-process workers timed out")
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert "psum ok" in out, out
