"""Independent PyTorch implementation of the nvdiffrast primitive semantics.

This is the numerical-parity anchor demanded by the north star ("renders
and pixel gradients allclose vs nvdiffrast/PyTorch"): a standalone
re-implementation of the four rendering primitives the reference pipeline
uses (reference fit.py:151-160 — ``dr.rasterize``, ``dr.interpolate``,
``dr.texture``, ``dr.antialias``) written from nvdiffrast's *published*
semantics (Laine et al. 2020, "Modular Primitives for High-Performance
Differentiable Rendering", §3) in PyTorch, sharing no code with
``fpc_diffrend_tpu``. Gradients come from torch autograd over the
continuous relaxation (discrete rasterization/edge decisions held fixed),
which is exactly the differentiability model nvdiffrast implements in its
hand-written CUDA backward kernels.

Deliberate structural differences from the JAX implementation (so that a
bug in one is not reproduced in the other):

  * visibility: per-triangle full-image painter's loop in torch (not a
    chunked scan),
  * barycentrics: computed from clip-space w-divided vertices per covered
    pixel via gathered index lists (not dense plane equations),
  * antialias: topology neighbor map built as a Python dict keyed on
    sorted vertex-index edges; discontinuity pairs processed as a sparse
    index list (not dense image planes),
  * everything runs in float64 by default, so this implementation also
    serves as a higher-precision oracle.

Conventions (identical to nvdiffrast and to the TPU pipeline):
  pixel (ix, iy) center = (ix + 0.5, iy + 0.5); screen x = (x/w + 1)/2*W;
  image row 0 is the bottom row (OpenGL); rast = (u, v, z_ndc, tri_id+1);
  both windings rasterized; triangles with any vertex w <= 1e-9 dropped;
  texture: uv in [0,1], sample position uv*size - 0.5, boundary wrap or
  clamp; antialias blends adjacent pixel pairs across silhouette edges by
  the edge-segment crossing position.
"""

from __future__ import annotations

import torch

W_EPS = 1e-9
AREA_EPS = 1e-12


# ----------------------------------------------------------------------------
# rasterize
# ----------------------------------------------------------------------------

def _screen_xy(pos_clip: torch.Tensor, width: int, height: int):
    """(V, 4) clip -> (V,) sx, sy, z_ndc, w."""
    w = pos_clip[:, 3]
    safe_w = torch.where(w.abs() > W_EPS, w, torch.full_like(w, W_EPS))
    sx = (pos_clip[:, 0] / safe_w + 1.0) * 0.5 * width
    sy = (pos_clip[:, 1] / safe_w + 1.0) * 0.5 * height
    zn = pos_clip[:, 2] / safe_w
    return sx, sy, zn, w


def _edge(ax, ay, bx, by, px, py):
    return (bx - ax) * (py - ay) - (by - ay) * (px - ax)


@torch.no_grad()
def visibility(pos_clip: torch.Tensor, tris: torch.Tensor, height: int,
               width: int) -> torch.Tensor:
    """(H, W) int64 winning triangle per pixel, -1 = background.

    Brute-force z-buffer, triangles painted in index order, strictly
    closer depth wins (first-come on exact ties).
    """
    sx, sy, zn, w = _screen_xy(pos_clip, width, height)
    px = torch.arange(width, dtype=pos_clip.dtype) + 0.5
    py = torch.arange(height, dtype=pos_clip.dtype) + 0.5
    PX, PY = torch.meshgrid(px, py, indexing="xy")

    zbuf = torch.full((height, width), float("inf"), dtype=pos_clip.dtype)
    idbuf = torch.full((height, width), -1, dtype=torch.int64)
    for t in range(tris.shape[0]):
        i0, i1, i2 = tris[t, 0], tris[t, 1], tris[t, 2]
        if not (w[i0] > W_EPS and w[i1] > W_EPS and w[i2] > W_EPS):
            continue
        ax, ay = sx[i0], sy[i0]
        bx, by = sx[i1], sy[i1]
        cx, cy = sx[i2], sy[i2]
        area = _edge(ax, ay, bx, by, cx, cy)
        if area.abs() <= AREA_EPS:
            continue
        l0 = _edge(bx, by, cx, cy, PX, PY) / area
        l1 = _edge(cx, cy, ax, ay, PX, PY) / area
        l2 = _edge(ax, ay, bx, by, PX, PY) / area
        covered = (l0 >= 0) & (l1 >= 0) & (l2 >= 0)
        z = l0 * zn[i0] + l1 * zn[i1] + l2 * zn[i2]
        closer = covered & (z < zbuf)
        zbuf[closer] = z[closer]
        idbuf[closer] = t
    return idbuf


def rasterize(pos_clip: torch.Tensor, tris: torch.Tensor, height: int,
              width: int) -> torch.Tensor:
    """nvdiffrast dr.rasterize: (H, W, 4) = (u, v, z_ndc, tri_id + 1).

    Differentiable w.r.t. pos_clip through the per-pixel barycentric /
    depth recompute with the winner ids held fixed.
    """
    idbuf = visibility(pos_clip, tris, height, width)
    ys, xs = torch.nonzero(idbuf >= 0, as_tuple=True)
    out = torch.zeros((height, width, 4), dtype=pos_clip.dtype)
    if ys.numel() == 0:
        return out

    sx, sy, zn, w = _screen_xy(pos_clip, width, height)
    tid = idbuf[ys, xs]
    vi = tris[tid]                                    # (N, 3)
    pxc = xs.to(pos_clip.dtype) + 0.5
    pyc = ys.to(pos_clip.dtype) + 0.5

    ax, ay = sx[vi[:, 0]], sy[vi[:, 0]]
    bx, by = sx[vi[:, 1]], sy[vi[:, 1]]
    cx, cy = sx[vi[:, 2]], sy[vi[:, 2]]
    area = _edge(ax, ay, bx, by, cx, cy)
    a0 = _edge(bx, by, cx, cy, pxc, pyc) / area
    a1 = _edge(cx, cy, ax, ay, pxc, pyc) / area
    a2 = _edge(ax, ay, bx, by, pxc, pyc) / area

    # perspective correction: weight affine barycentrics by 1/w
    d0 = a0 / w[vi[:, 0]]
    d1 = a1 / w[vi[:, 1]]
    d2 = a2 / w[vi[:, 2]]
    denom = d0 + d1 + d2
    u = d0 / denom
    v = d1 / denom
    z = a0 * zn[vi[:, 0]] + a1 * zn[vi[:, 1]] + a2 * zn[vi[:, 2]]

    out[ys, xs, 0] = u
    out[ys, xs, 1] = v
    out[ys, xs, 2] = z
    out[ys, xs, 3] = (tid + 1).to(pos_clip.dtype)
    return out


# ----------------------------------------------------------------------------
# interpolate
# ----------------------------------------------------------------------------

def interpolate(attr: torch.Tensor, rast: torch.Tensor,
                tris: torch.Tensor) -> torch.Tensor:
    """nvdiffrast dr.interpolate: (H, W, C) barycentric attribute lerp.

    attr (V, C); background pixels produce 0.
    """
    idbuf = rast[..., 3].long() - 1
    mask = idbuf >= 0
    ids = idbuf.clamp(min=0)
    corners = attr[tris[ids]]                         # (H, W, 3, C)
    u = rast[..., 0:1]
    v = rast[..., 1:2]
    val = (u * corners[..., 0, :] + v * corners[..., 1, :]
           + (1.0 - u - v) * corners[..., 2, :])
    return torch.where(mask[..., None], val, torch.zeros_like(val))


# ----------------------------------------------------------------------------
# texture
# ----------------------------------------------------------------------------

def _index(i: torch.Tensor, size: int, boundary: str) -> torch.Tensor:
    if boundary == "wrap":
        return torch.remainder(i, size)
    return i.clamp(0, size - 1)


def _bilinear(tex: torch.Tensor, uv: torch.Tensor,
              boundary: str) -> torch.Tensor:
    th, tw = tex.shape[0], tex.shape[1]
    s = uv[..., 0] * tw - 0.5
    t = uv[..., 1] * th - 0.5
    sf = torch.floor(s)
    tf = torch.floor(t)
    ws = (s - sf)[..., None]
    wt = (t - tf)[..., None]
    s0 = _index(sf.long(), tw, boundary)
    s1 = _index(sf.long() + 1, tw, boundary)
    t0 = _index(tf.long(), th, boundary)
    t1 = _index(tf.long() + 1, th, boundary)
    row0 = tex[t0, s0] * (1 - ws) + tex[t0, s1] * ws
    row1 = tex[t1, s0] * (1 - ws) + tex[t1, s1] * ws
    return row0 * (1 - wt) + row1 * wt


def texture(tex: torch.Tensor, uv: torch.Tensor, uv_da=None,
            filter_mode: str = "linear", boundary_mode: str = "wrap",
            max_mip_level: int = 0) -> torch.Tensor:
    """nvdiffrast dr.texture: bilinear or trilinear-mipmap sampling.

    tex (TH, TW, C), uv (H, W, 2), uv_da (H, W, 4) screen-space uv
    derivatives for LOD selection.
    """
    if filter_mode == "linear":
        return _bilinear(tex, uv, boundary_mode)
    assert filter_mode == "linear-mipmap-linear" and uv_da is not None

    # box-filter pyramid
    levels = [tex]
    cur = tex
    while (len(levels) <= max_mip_level
           and min(cur.shape[0], cur.shape[1]) >= 2):
        th, tw, c = cur.shape
        cur = cur.reshape(th // 2, 2, tw // 2, 2, c).mean(dim=(1, 3))
        levels.append(cur)

    th, tw = tex.shape[0], tex.shape[1]
    dsdx = uv_da[..., 0] * tw
    dsdy = uv_da[..., 1] * tw
    dtdx = uv_da[..., 2] * th
    dtdy = uv_da[..., 3] * th
    rho = torch.sqrt(torch.clamp(
        torch.maximum(dsdx ** 2 + dtdx ** 2, dsdy ** 2 + dtdy ** 2),
        min=1e-20))
    lod = torch.clamp(torch.log2(rho), 0.0, float(len(levels) - 1))
    lo = lod.floor().long().clamp(0, len(levels) - 1)
    frac = (lod - lo.to(lod.dtype))[..., None]

    out = torch.zeros(uv.shape[:-1] + (tex.shape[-1],), dtype=tex.dtype)
    for lv in range(len(levels)):
        m_lo = lo == lv
        m_hi = (lo + 1).clamp(max=len(levels) - 1) == lv
        if not (m_lo.any() or m_hi.any()):
            continue
        smp = _bilinear(levels[lv], uv, boundary_mode)
        out = out + torch.where(m_lo[..., None], smp * (1 - frac),
                                torch.zeros_like(smp))
        out = out + torch.where(m_hi[..., None] & (lo < len(levels) - 1)[..., None],
                                smp * frac, torch.zeros_like(smp))
    return out


# ----------------------------------------------------------------------------
# antialias
# ----------------------------------------------------------------------------

def build_edge_map(tris: torch.Tensor) -> dict:
    """Edge (min_vi, max_vi) -> list of triangle indices sharing it.

    The role of nvdiffrast's topology hash.
    """
    emap: dict = {}
    tl = tris.tolist()
    for t, (i0, i1, i2) in enumerate(tl):
        for a, b in ((i0, i1), (i1, i2), (i2, i0)):
            key = (min(a, b), max(a, b))
            emap.setdefault(key, []).append(t)
    return emap


def antialias(color: torch.Tensor, rast: torch.Tensor,
              pos_clip: torch.Tensor, tris: torch.Tensor) -> torch.Tensor:
    """nvdiffrast dr.antialias: silhouette-edge blending of adjacent
    pixel pairs; the coverage-gradient path to vertex positions.

    Discontinuity pairs are found discretely, then each pair's blend
    weight is recomputed differentiably from the occluder's screen
    vertices (crossing position xi of the silhouette edge along the
    segment between the two pixel centers; blend = xi - 0.5 toward the
    farther pixel).
    """
    height, width = color.shape[0], color.shape[1]
    idbuf = rast[..., 3].long() - 1
    zplane = torch.where(idbuf >= 0, rast[..., 2].detach(),
                         torch.full_like(rast[..., 2], float("inf")))
    emap = build_edge_map(tris)
    sx, sy, _, _ = _screen_xy(pos_clip, width, height)
    tl = tris.tolist()

    out = color.clone()

    def do_pairs(ya, xa, yb, xb):
        """Pixel a = (ya, xa) vs neighbor b = (yb, xb), vectorized find,
        scalar differentiable blend per flagged pair."""
        id_a = idbuf[ya, xa]
        id_b = idbuf[yb, xb]
        differs = (id_a != id_b) & ((id_a >= 0) | (id_b >= 0))
        ii = torch.nonzero(differs, as_tuple=False)
        for k in range(ii.shape[0]):
            iy, ix = ii[k, 0].item(), ii[k, 1].item()
            ja, jb = (ya[iy, ix].item(), xa[iy, ix].item()), \
                     (yb[iy, ix].item(), xb[iy, ix].item())
            ta = id_a[iy, ix].item()
            tb = id_b[iy, ix].item()
            if zplane[ja] <= zplane[jb]:
                occ, other, p_occ, p_oth = ta, tb, ja, jb
            else:
                occ, other, p_occ, p_oth = tb, ta, jb, ja
            if occ < 0:
                continue
            pa = (ja[1] + 0.5, ja[0] + 0.5)
            pb = (jb[1] + 0.5, jb[0] + 0.5)
            verts = tl[occ]
            best = None
            for e in range(3):
                va, vb = verts[e], verts[(e + 1) % 3]
                key = (min(va, vb), max(va, vb))
                owners = emap.get(key, [])
                # silhouette test: continuous only if the edge's other
                # owner is the triangle on the other side of the pair
                if other >= 0 and other in owners and occ in owners:
                    continue
                f_a = _edge(sx[va], sy[va], sx[vb], sy[vb],
                            torch.tensor(pa[0], dtype=sx.dtype),
                            torch.tensor(pa[1], dtype=sx.dtype))
                f_b = _edge(sx[va], sy[va], sx[vb], sy[vb],
                            torch.tensor(pb[0], dtype=sx.dtype),
                            torch.tensor(pb[1], dtype=sx.dtype))
                if not (f_a * f_b).item() < 0.0:
                    continue
                xi = f_a / (f_a - f_b)
                score = abs(xi.item() - 0.5)
                if best is None or score < best[0]:
                    best = (score, xi)
            if best is None:
                continue
            xi = best[1]
            delta = torch.clamp(xi - 0.5, -0.5, 0.5)
            diff = color[ja] - color[jb]
            if delta.item() > 0:
                out[jb] = out[jb] + delta * diff
            elif delta.item() < 0:
                out[ja] = out[ja] - delta * (-diff)

    ygrid, xgrid = torch.meshgrid(torch.arange(height), torch.arange(width),
                                  indexing="ij")
    # horizontal neighbors
    do_pairs(ygrid[:, :-1], xgrid[:, :-1], ygrid[:, :-1], xgrid[:, :-1] + 1)
    # vertical neighbors
    do_pairs(ygrid[:-1, :], xgrid[:-1, :], ygrid[:-1, :] + 1, xgrid[:-1, :])
    return out


# ----------------------------------------------------------------------------
# full pipeline (reference fit.py:151-161 composition)
# ----------------------------------------------------------------------------

def render(mvp: torch.Tensor, pos: torch.Tensor, tris: torch.Tensor,
           uv: torch.Tensor, uv_idx: torch.Tensor, tex: torch.Tensor,
           height: int, width: int, background: float = 45.0 / 255.0,
           boundary_mode: str = "wrap") -> torch.Tensor:
    """rasterize -> interpolate(uv) -> texture -> antialias -> composite.

    Matches the reference render() op order (fit.py:134-162), including
    antialiasing before the constant-background composite. ``uv_idx`` must
    equal ``tris`` here (shared topology), as in all test scenes.
    """
    ones = torch.ones((pos.shape[0], 1), dtype=pos.dtype)
    pos_clip = torch.cat([pos, ones], dim=1) @ mvp.T
    rast = rasterize(pos_clip, tris, height, width)
    texc = interpolate(uv, rast, uv_idx)
    colour = texture(tex, texc, boundary_mode=boundary_mode)
    colour = antialias(colour, rast, pos_clip, tris)
    mask = rast[..., 3:4] > 0
    return torch.where(mask, colour, torch.full_like(colour, background))
