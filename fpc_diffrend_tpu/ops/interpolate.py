"""Barycentric attribute interpolation (nvdiffrast ``dr.interpolate``).

Replaces the CUDA interpolate kernel used at reference fit.py:154-157.
Pure-JAX gathers + arithmetic: autodiff produces the scatter-add backward
that nvdiffrast hand-writes.
"""

from __future__ import annotations

import jax.numpy as jnp

Array = jnp.ndarray


def interpolate(attr: Array, rast: Array, faces: Array,
                rast_db: Array | None = None, diff_attrs=None):
    """Interpolate per-vertex attributes at rasterized pixels.

    :param attr: (V, A) per-vertex attributes (e.g. UVs, (U, 2)).
    :param rast: (H, W, 4) rasterizer output (u, v, z, tri_id + 1).
    :param faces: (T, 3) int32 attribute indices per triangle (for UVs this
        is the ``fuv`` index buffer, reference fit.py:154 passes uv_idx).
    :param rast_db: (H, W, 4) bary pixel derivatives; required when
        ``diff_attrs`` is requested.
    :param diff_attrs: None or "all" — also return screen-space attribute
        derivatives (H, W, 2A) ordered (dA0/dx, dA0/dy, dA1/dx, ...),
        matching nvdiffrast's ``diff_attrs='all'`` layout.
    :return: out (H, W, A) [, out_da (H, W, 2A)]
    """
    u = rast[..., 0]
    v = rast[..., 1]
    mask = rast[..., 3] > 0
    ids = jnp.maximum(rast[..., 3].astype(jnp.int32) - 1, 0)

    tri_attr = attr[faces]                    # (T, 3, A)
    pa = tri_attr[ids]                        # (H, W, 3, A)
    a0, a1, a2 = pa[..., 0, :], pa[..., 1, :], pa[..., 2, :]

    w = 1.0 - u - v
    out = u[..., None] * a0 + v[..., None] * a1 + w[..., None] * a2
    out = jnp.where(mask[..., None], out, 0.0)

    if diff_attrs is None:
        return out, None
    if rast_db is None:
        raise ValueError("diff_attrs requires rast_db")
    if diff_attrs != "all":
        raise NotImplementedError("only diff_attrs='all' is supported")

    du_dx = rast_db[..., 0]
    du_dy = rast_db[..., 1]
    dv_dx = rast_db[..., 2]
    dv_dy = rast_db[..., 3]
    # a = u(a0 - a2) + v(a1 - a2) + a2
    d02 = a0 - a2
    d12 = a1 - a2
    da_dx = du_dx[..., None] * d02 + dv_dx[..., None] * d12   # (H, W, A)
    da_dy = du_dy[..., None] * d02 + dv_dy[..., None] * d12
    out_da = jnp.stack([da_dx, da_dy], axis=-1)               # (H, W, A, 2)
    out_da = out_da.reshape(*out_da.shape[:-2], -1)           # (H, W, 2A)
    out_da = jnp.where(mask[..., None], out_da, 0.0)
    return out, out_da
