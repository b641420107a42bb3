"""Multi-host scaling glue (frames across hosts over DCN).

The design (SURVEY.md §2c): the 'frame' mesh axis is laid out so shards on
different hosts hold different video frames — per-frame parameters stay
host-local and never cross DCN; only the shared-parameter gradient
all-reduce (texture, rig matrices, per-camera corrections) crosses hosts,
once per step, overlapped by XLA with the backward pass.

This module only wires jax.distributed + a host-spanning Mesh; the
sharded train step (parallel/train.py) is topology-agnostic.
"""

from __future__ import annotations


import jax
from jax.sharding import Mesh

from fpc_diffrend_tpu.parallel.mesh import make_mesh


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Initialize jax.distributed (no-op on single-process setups).

    On Cloud TPU pods the arguments are auto-detected from the
    environment; pass them explicitly elsewhere.

    ``jax.distributed.initialize`` must run before *any* backend access
    (``jax.devices()`` / ``jax.process_count()`` would initialize the
    local-only backend and make distributed init ineffective), so this
    probes nothing first: it calls initialize directly and treats the
    "already initialized" error as success.
    """
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError as e:
        # Raised when the distributed service is already initialized —
        # benign for idempotent callers.
        if "already initialized" not in str(e).lower():
            raise
    except ValueError:
        # Single-process environments without coordinator autodetection:
        # only acceptable when multi-process was not explicitly requested.
        if num_processes and num_processes > 1:
            raise


def make_pod_mesh(view_parallel: int = 1, tile_parallel: int = 1) -> Mesh:
    """Global mesh over all processes' devices.

    The 'frame' axis absorbs every device not used by 'view'/'tile', and
    is ordered so that consecutive frame shards live on the same host
    first — frames shard across hosts (DCN) only at the outermost level,
    matching the temporal-smoothness halo design (neighbor frames are
    usually host-local).
    """
    n = len(jax.devices())
    inner = view_parallel * tile_parallel
    assert n % inner == 0, (n, inner)
    return make_mesh(("frame", "view", "tile"),
                     (n // inner, view_parallel, tile_parallel))


def local_frame_range(mesh: Mesh, n_frames: int) -> tuple[int, int]:
    """[start, end) of the frame indices this process's shards own."""
    frame_size = dict(zip(mesh.axis_names, mesh.devices.shape))["frame"]
    per = (n_frames + frame_size - 1) // frame_size
    # processes own contiguous blocks of the frame axis by construction
    pid = jax.process_index()
    n_proc = jax.process_count()
    shards_per_proc = frame_size // max(n_proc, 1)
    start = pid * shards_per_proc * per
    return min(start, n_frames), min(start + shards_per_proc * per, n_frames)
