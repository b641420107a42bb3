"""Stage-level timing of the headline fit step (bench.py workload).

Times jitted sub-graphs of the exact benched step on the live backend
and reports per-stage costs by subtraction:

  binning | raster fwd kernel | texture+AA+composite fwd | render bwd
  | losses+blend fwd/bwd | optimizer

All timings use scalar-fetch synchronization (utils.profiling.time_fn)
— multi-MB device->host transfers are unreliable on the remote attach.

Usage: python tools/profile_stages.py  (FPC_BENCH_* env knobs apply)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from fpc_diffrend_tpu.fit import loop as fit_loop
    from fpc_diffrend_tpu.ops.pallas.rasterize_tpu import bin_scene
    from fpc_diffrend_tpu.ops.rasterize import _rasterize_pallas_full
    from fpc_diffrend_tpu.utils.profiling import time_fn

    wl = bench.build_workload()
    config, scene, state = wl["config"], wl["scene"], wl["state"]
    batch = wl["batch"]
    H, W, B = wl["H"], wl["W"], wl["B"]
    iters = int(os.environ.get("FPC_BENCH_ITERS", "5"))
    cap = config.pair_cap if config.pair_cap > 0 else None
    interp = jax.default_backend() != "tpu"   # CPU smoke path

    params = state.params

    def scalar(x):
        # reduce any pytree to one scalar so sync is a tiny transfer;
        # int leaves (step counters) are summed too so no output of the
        # timed graph is dead-code-eliminable
        leaves = [jnp.sum(l).astype(jnp.float32)
                  for l in jax.tree.leaves(x)
                  if jnp.issubdtype(l.dtype, jnp.floating)
                  or jnp.issubdtype(l.dtype, jnp.integer)]
        return sum(leaves)

    def clips(p):
        # the exact prologue of the benched step (fit_loop.render_sample
        # shares this function), so stage inputs cannot drift from the
        # benched graph
        pc, _ = jax.vmap(lambda c, f: fit_loop.sample_clip_positions(
            config, scene, p, c, f))(batch.cam_idx, batch.frame_idx)
        return pc

    pos_clip = jax.jit(clips)(params)
    pos_clip = jax.block_until_ready(pos_clip)

    @jax.jit
    def t_step(state):
        # reduce the WHOLE new state (params AND optimizer state) to the
        # sync scalar — summing only params would let XLA dead-code-
        # eliminate optimizer outputs that don't feed the param update
        new_state, met = fit_loop.train_step(config, scene, state, batch)
        return met["loss"] + scalar(new_state)

    @jax.jit
    def t_fwd_loss(p):
        total, _ = fit_loop.loss_fn(p, config, scene, batch, state.step)
        return total

    @jax.jit
    def t_fb_loss(p):
        g = jax.grad(lambda q: fit_loop.loss_fn(
            q, config, scene, batch, state.step)[0])(p)
        return scalar(g)

    @jax.jit
    def t_fwd_render(p):
        imgs, _ = jax.vmap(lambda c, f: fit_loop.render_sample(
            config, scene, p, c, f))(batch.cam_idx, batch.frame_idx)
        return jnp.sum(imgs)

    @jax.jit
    def t_fb_render(p):
        g = jax.grad(lambda q: jnp.sum(jax.vmap(
            lambda c, f: fit_loop.render_sample(config, scene, q, c, f)[0]
        )(batch.cam_idx, batch.frame_idx)))(p)
        return scalar(g)

    @jax.jit
    def t_bin(pc):
        def one(pc1):
            from fpc_diffrend_tpu.ops.pallas.rasterize_tpu import aux_records
            aux = aux_records(scene.uv, scene.uv_idx.astype(jnp.int32), pc1,
                              scene.faces, scene.face_neighbors, H, W)
            data, bins = bin_scene(pc1, scene.faces, H, W, aux=aux,
                                   entry_cap=cap)
            return jnp.sum(bins.sorted_rec_t) + jnp.sum(data)
        return jnp.sum(jax.vmap(one)(pc))

    @jax.jit
    def t_raster_fwd(pc):
        def one(pc1):
            rast, texc, *_ = _rasterize_pallas_full(
                pc1, scene.faces, scene.uv, scene.uv_idx,
                scene.face_neighbors, (H, W), interp, cap)
            return jnp.sum(rast) + jnp.sum(texc)
        return jnp.sum(jax.vmap(one)(pc))

    @jax.jit
    def t_raster_fb(pc):
        def f(pcs):
            def one(pc1):
                rast, texc, *_ = _rasterize_pallas_full(
                    pc1, scene.faces, scene.uv, scene.uv_idx,
                    scene.face_neighbors, (H, W), interp, cap)
                return jnp.sum(rast[..., :3]) + jnp.sum(texc)
            return jnp.sum(jax.vmap(one)(pcs))
        return scalar(jax.grad(f)(pc))

    # fwd-computed inputs for the isolated texture / antialias stages —
    # the PADDED plane-major production path (ops/pipeline.py)
    from fpc_diffrend_tpu.ops.rasterize import _rasterize_pallas_padded

    def raster_outs(pc):
        def one(pc1):
            idbuf_p, payload_p = _rasterize_pallas_padded(
                pc1, scene.faces, scene.uv, scene.uv_idx,
                scene.face_neighbors, (H, W), cap, interp)
            return idbuf_p, payload_p
        return jax.vmap(one)(pc)

    idbuf_b, payload_b = jax.block_until_ready(
        jax.jit(raster_outs)(pos_clip))
    tex0 = params["tex"]

    from fpc_diffrend_tpu.ops.pallas.antialias_tpu import (
        antialias_planes_pallas)
    from fpc_diffrend_tpu.ops.pallas.texture_tpu import (
        texture_planes_pallas)

    @jax.jit
    def t_tex_fwd(tex, payload):
        out = jax.vmap(lambda p: jnp.stack(texture_planes_pallas(
            tex, p[3], p[4], H, W, "wrap", interp)))(payload)
        return jnp.sum(out)

    @jax.jit
    def t_tex_fb(tex, payload):
        g = jax.grad(lambda t, p: t_tex_fwd.__wrapped__(t, p),
                     argnums=(0, 1))(tex, payload)
        return scalar(g)

    @jax.jit
    def t_aa_fwd(colour, idbuf, payload):
        return jnp.sum(jax.vmap(
            lambda c, i, p: antialias_planes_pallas(tuple(c), i, p, H, W,
                                                    interp)
        )(colour, idbuf, payload))

    @jax.jit
    def t_aa_fb(colour, idbuf, payload):
        g = jax.grad(lambda c, p: t_aa_fwd.__wrapped__(c, idbuf, p),
                     argnums=(0, 1))(colour, payload)
        return scalar(g)

    colour_b = jax.block_until_ready(jax.jit(
        lambda payload: jax.vmap(lambda p: jnp.stack(texture_planes_pallas(
            tex0, p[3], p[4], H, W, "wrap", interp)))(payload)
    )(payload_b))

    # micro-rows: the binning key sort alone, and the loss path without
    # the laplacian (isolates the regularizer's segment ops)
    from fpc_diffrend_tpu.ops.pallas.rasterize_tpu import (
        WINDOW_X, WINDOW_Y, _place_sort, pad_resolution)

    PH, PW = pad_resolution(H, W)
    n_tiles = (PH // 8) * (PW // 128)
    T = int(scene.faces.shape[0])
    Pcap = cap if cap else T * WINDOW_X * WINDOW_Y

    @jax.jit
    def t_bin_sort(pc):
        # same key distribution as the real binning (tile ids from bbox)
        def one(pc1):
            from fpc_diffrend_tpu.ops.pallas.rasterize_tpu import (
                triangle_setup)
            data, bbox, valid = triangle_setup(pc1, scene.faces, H, W)
            k = jnp.arange(WINDOW_X * WINDOW_Y, dtype=jnp.int32)
            tx = bbox[:, 0:1] + (k % WINDOW_X)[None, :]
            ty = bbox[:, 1:2] + (k // WINDOW_X)[None, :]
            tids = jnp.where(valid[:, None], ty * (PW // 128) + tx, n_tiles)
            st, bs, _ = _place_sort(tids, T, n_tiles, min(Pcap, T * 8))
            return jnp.sum(st) + jnp.sum(bs)
        return jnp.sum(jax.vmap(one)(pc))

    # micro-rows: the Pallas gradient kernel + fold in isolation (its
    # XLA glue was the round-2 ablation's largest bwd cost), and the
    # banded fold alone on the real bin structure
    from fpc_diffrend_tpu.ops.pallas.raster_grad_tpu import (
        banded_fold, pixel_grad_pallas)

    def raster_res(pc):
        def one(pc1):
            from fpc_diffrend_tpu.ops.pallas.rasterize_tpu import (
                aux_records, bin_scene, fused_rasterize_from_bins)
            aux = aux_records(scene.uv, scene.uv_idx.astype(jnp.int32), pc1,
                              scene.faces, scene.face_neighbors, H, W)
            data, bins = bin_scene(pc1, scene.faces, H, W, aux=aux,
                                   entry_cap=cap)
            idbuf, payload, entry, extra = fused_rasterize_from_bins(
                bins, H, W, interp, padded=True)
            return bins, entry, payload, extra
        return jax.vmap(one)(pc)

    binsb, entry_b, payl_b, extra_b = jax.block_until_ready(
        jax.jit(raster_res)(pos_clip))
    T = int(scene.faces.shape[0])
    gcot = jnp.ones_like(payl_b)

    @jax.jit
    def t_gradkernel(binsq, entry, payl, extra, gpl):
        def one(b, e, p, x, g):
            gd, ga = pixel_grad_pallas(b, e, p[0], p[1], x, g, T, H, W,
                                       pair_cap=cap, interpret=interp)
            return jnp.sum(gd) + jnp.sum(ga)
        return jnp.sum(jax.vmap(one)(binsq, entry, payl, extra, gpl))

    @jax.jit
    def t_fold(binsq):
        def one(b):
            P = b.sorted_rec_t.shape[1]
            fake = jnp.ones((32, P), jnp.float32)
            pcap = min(cap if cap else P, b.sorted_tri.shape[0])
            out, ovf = banded_fold(fake, b.sorted_tri, b.bin_start[-1],
                                   pcap, T, interp, reverse=True)
            return jnp.sum(out) + ovf
        return jnp.sum(jax.vmap(one)(binsq))

    import dataclasses as _dc
    cfg_nolap = _dc.replace(config, weight_laplacian=0.0)

    @jax.jit
    def t_fb_loss_nolap(p):
        g = jax.grad(lambda q: fit_loop.loss_fn(
            q, cfg_nolap, scene, batch, state.step)[0])(p)
        return scalar(g)

    # micro-rows for the backward's XLA glue: the blend+pose prologue
    # backward and the triangle-setup/aux-record chain backward (grad
    # rows (T, 16)x2 -> pos_clip/uv scatter) — the pieces of "render bwd
    # total" that are neither the gradient kernel, the texture backward
    # nor the antialias backward
    @jax.jit
    def t_prologue_fb(p):
        def f(q):
            pc, _ = jax.vmap(lambda c, fr: fit_loop.sample_clip_positions(
                config, scene, q, c, fr))(batch.cam_idx, batch.frame_idx)
            return jnp.sum(pc * pc)
        return scalar(jax.grad(f)(p))

    @jax.jit
    def t_setup_aux_fb(pc):
        from fpc_diffrend_tpu.ops.pallas.rasterize_tpu import (
            aux_records, triangle_setup)

        def f(pcs):
            def one(pc1):
                data, _bbox, _valid = triangle_setup(
                    pc1, scene.faces.astype(jnp.int32), H, W)
                aux = aux_records(scene.uv, scene.uv_idx.astype(jnp.int32),
                                  pc1, scene.faces.astype(jnp.int32),
                                  scene.face_neighbors, H, W)
                return jnp.sum(data * data) + jnp.sum(aux * aux)
            return jnp.sum(jax.vmap(one)(pcs))
        return scalar(jax.grad(f)(pc))

    rows = []

    def run(name, fn, *args):
        ms = time_fn(fn, *args, iters=iters)[0] * 1e3
        rows.append((name, ms))
        print(f"{name:<28s} {ms:9.1f} ms", flush=True)
        return ms

    step = run("train_step (full)", t_step, state)
    fb_loss = run("loss fwd+bwd", t_fb_loss, params)
    fwd_loss = run("loss fwd", t_fwd_loss, params)
    fb_render = run("render fwd+bwd", t_fb_render, params)
    fwd_render = run("render fwd", t_fwd_render, params)
    raster_fb = run("raster+interp fwd+bwd", t_raster_fb, pos_clip)
    raster_fwd = run("raster+interp fwd", t_raster_fwd, pos_clip)
    binning = run("binning", t_bin, pos_clip)
    bin_sort = run("binning: key sort only", t_bin_sort, pos_clip)
    run("grad kernel+fold (isolated)", t_gradkernel, binsb, entry_b,
        payl_b, extra_b, gcot)
    run("banded fold only", t_fold, binsb)
    tex_fb = run("texture fwd+bwd", t_tex_fb, tex0, payload_b)
    tex_fwd = run("texture fwd", t_tex_fwd, tex0, payload_b)
    aa_fb = run("antialias fwd+bwd", t_aa_fb, colour_b, idbuf_b, payload_b)
    aa_fwd = run("antialias fwd", t_aa_fwd, colour_b, idbuf_b, payload_b)
    fb_nolap = run("loss fwd+bwd (no laplacian)", t_fb_loss_nolap, params)
    run("prologue fwd+bwd (isolated)", t_prologue_fb, params)
    run("setup+aux fwd+bwd (isolated)", t_setup_aux_fb, pos_clip)

    print("\n--- derived (per batched step) ---")
    print("# each stage is a separately jitted graph with its own fusion,")
    print("# so derived differences need not sum to the full step; small")
    print("# negative values are fusion noise and are flagged, not clamped")

    def der(name, ms):
        note = "  (fusion noise)" if ms < 0 else ""
        print(f"{name:<28s}{ms:8.1f} ms{note}")

    der("binning:", binning)
    der("binning: key sort share:", bin_sort)
    der("raster fwd kernel:", raster_fwd - binning)
    der("raster bwd (grad+fold):", raster_fb - raster_fwd)
    print(f"texture fwd / bwd:          {tex_fwd:8.1f} / "
          f"{tex_fb - tex_fwd:.1f} ms")
    print(f"antialias fwd / bwd:        {aa_fwd:8.1f} / "
          f"{aa_fb - aa_fwd:.1f} ms")
    der("tex+AA+composite fwd:", fwd_render - raster_fwd)
    der("render bwd total:", fb_render - fwd_render)
    der("losses+blend fwd+bwd extra:", fb_loss - fb_render)
    der("laplacian term share:", fb_loss - fb_nolap)
    der("optimizer + renorm:", step - fb_loss)
    print(f"total step:                 {step:8.1f} ms "
          f"({B * H * W / step / 1e3:.1f} Mpix/s)")


if __name__ == "__main__":
    main()
