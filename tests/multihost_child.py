"""Child process for the 2-process multihost test (tests/test_multihost.py).

Usage: python multihost_child.py <coordinator> <num_procs> <proc_id>

Initializes jax.distributed over CPU (2 local virtual devices per
process), builds the pod mesh, runs ONE sharded train step on the shared
tiny scene, and prints machine-readable results for the parent to verify.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=2").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # sitecustomize may pin a TPU

from fpc_diffrend_tpu.parallel import multihost  # noqa: E402

coordinator, num_procs, proc_id = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

# Must run before any backend access (the point of the fix under test).
multihost.initialize(coordinator_address=coordinator,
                     num_processes=num_procs, process_id=proc_id)

assert jax.process_count() == num_procs, jax.process_count()
assert jax.device_count() == 2 * num_procs, jax.device_count()

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _tiny_scene import make_setup, make_batch  # noqa: E402
from fpc_diffrend_tpu.fit import state as state_mod  # noqa: E402
from fpc_diffrend_tpu.parallel import train as ptrain  # noqa: E402

scene, config, params = make_setup()
batch = make_batch(config, scene, params)

mesh = multihost.make_pod_mesh(view_parallel=1, tile_parallel=1)
assert dict(zip(mesh.axis_names, mesh.devices.shape))["frame"] == 2 * num_procs

lo, hi = multihost.local_frame_range(mesh, 4)
print(f"FRAMERANGE {proc_id} {lo} {hi}", flush=True)

step_fn = ptrain.make_sharded_train_step(config, scene, mesh)
state = state_mod.init_state(config, params)
sbatch = ptrain.shard_batch_for(mesh, batch)
new_state, metrics = step_fn(state, sbatch)

loss = float(jax.device_get(metrics["loss"]))
tex_sum = float(jnp.sum(jnp.abs(new_state.params["tex"])))
t_sum = float(jnp.sum(jnp.abs(new_state.params["per_frame_t"])))
print(f"RESULT {proc_id} {loss:.8e} {tex_sum:.8e} {t_sum:.8e}", flush=True)
