"""Two-process distributed test over CPU (VERDICT round-1 item 4).

Spawns two real OS processes, each with 2 virtual CPU devices, that form a
jax.distributed cluster via ``multihost.initialize`` (which must call
``jax.distributed.initialize`` *before* any backend access), build the pod
mesh over all 4 global devices and run one sharded train step. The parent
verifies both processes agree and the loss matches an in-process
single-device reference step.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_sharded_step():
    here = os.path.dirname(os.path.abspath(__file__))
    child = os.path.join(here, "multihost_child.py")
    coord = f"127.0.0.1:{_free_port()}"

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # child sets its own device count
    env["JAX_PLATFORMS"] = "cpu"
    repo_root = os.path.dirname(here)
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen([sys.executable, child, coord, "2", str(i)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env,
                         cwd=os.path.dirname(here))
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
        assert p.returncode == 0, f"child failed:\n{out}"

    results = {}
    franges = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT"):
                _, pid, loss, tex_sum, t_sum = line.split()
                results[int(pid)] = (float(loss), float(tex_sum),
                                     float(t_sum))
            if line.startswith("FRAMERANGE"):
                _, pid, lo, hi = line.split()
                franges[int(pid)] = (int(lo), int(hi))
    assert set(results) == {0, 1}, outs

    # Both processes computed the identical replicated result.
    np.testing.assert_allclose(results[0], results[1], rtol=1e-6)

    # Processes own disjoint, covering frame ranges.
    assert franges[0] == (0, 2) and franges[1] == (2, 4), franges

    # Matches the single-process reference step (same scene/batch/params).
    from _tiny_scene import make_setup, make_batch
    from fpc_diffrend_tpu.fit import loop as fit_loop
    from fpc_diffrend_tpu.fit import state as state_mod

    scene, config, params = make_setup()
    batch = make_batch(config, scene, params)
    state = state_mod.init_state(config, params)
    _, metrics = fit_loop.train_step(config, scene, state, batch)
    np.testing.assert_allclose(results[0][0], float(metrics["loss"]),
                               rtol=1e-4)
