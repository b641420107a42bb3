"""Full-scale banded-fold validation on TPU: on-device gradient diffs
(scalar fetches only — big transfers are unreliable on this attach)."""
import os, sys
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
import bench
from fpc_diffrend_tpu.fit import loop as fit_loop

wl = bench.build_workload()
config, scene, state, batch = wl["config"], wl["scene"], wl["state"], wl["batch"]

def loss(p):
    return fit_loop.loss_fn(p, config, scene, batch, state.step)[0]

os.environ["FPC_FOLD_IMPL"] = "segment"
g_seg = jax.jit(jax.grad(loss))(state.params)
jax.block_until_ready(jax.tree.leaves(g_seg)[0])
jax.clear_caches()
os.environ["FPC_FOLD_IMPL"] = "banded_rev"
g_band = jax.jit(jax.grad(loss))(state.params)

@jax.jit
def diffs(a, b):
    out = {}
    for k in a:
        d = jnp.max(jnp.abs(a[k] - b[k]))
        m = jnp.max(jnp.abs(a[k]))
        out[k] = jnp.stack([d, m])
    return out

d = jax.device_get(diffs(g_seg, g_band))
ok = True
for k in sorted(d):
    md, ma = float(d[k][0]), float(d[k][1])
    rel = md / max(ma, 1e-12)
    good = (md <= 1e-6 + 1e-4 * ma) and np.isfinite(md)
    ok &= good
    print(f"{k:16s} maxabs={ma:.3e} maxdiff={md:.3e} rel={rel:.2e} "
          f"{'OK' if good else 'MISMATCH'}")

# overflow counter at this workload's binning (scalar fetch)
from fpc_diffrend_tpu.ops.pallas.rasterize_tpu import aux_records, bin_scene
from fpc_diffrend_tpu.ops.pallas.raster_grad_tpu import banded_fold, REC

pc, _ = jax.vmap(lambda c, f: fit_loop.sample_clip_positions(
    config, scene, state.params, c, f))(batch.cam_idx, batch.frame_idx)
H, W = config.resolution
cap = config.pair_cap

def ovf_one(pc1):
    aux = aux_records(scene.uv, scene.uv_idx.astype(jnp.int32), pc1,
                      scene.faces, scene.face_neighbors, H, W)
    data, bins = bin_scene(pc1, scene.faces, H, W, aux=aux, entry_cap=cap)
    fake = jnp.ones((REC, bins.sorted_rec_t.shape[1]), jnp.float32)
    _, ovf = banded_fold(fake, bins.sorted_tri, bins.bin_start[-1],
                         cap, scene.faces.shape[0], reverse=True)
    return ovf

total_ovf = int(jax.jit(
    lambda pcs: jnp.sum(jax.vmap(ovf_one)(pcs)))(pc))
print("total overflow:", total_ovf)
print("BANDED_VALID" if (ok and total_ovf == 0) else "BANDED_INVALID")
