"""Lens undistortion preprocessing (offline, like the reference).

The reference handles lens distortion entirely offline with cv2.undistort
over every frame (undistort.py; fit.py:540 comment). Two implementations:

  * ``undistort_image_cv2`` — exact OpenCV path when cv2 is available.
  * ``undistort_image_jax`` — pure-JAX Brown-Conrady remap (batched,
    differentiable, runs on TPU) for environments without OpenCV. Uses the
    standard 5-coefficient model (k1, k2, p1, p2, k3).
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def undistort_image_cv2(image: np.ndarray, intrinsic: np.ndarray,
                        distortion: np.ndarray) -> np.ndarray:
    import cv2

    return cv2.undistort(image, intrinsic, distortion)


def undistort_map(intrinsic, distortion, height: int, width: int):
    """(H, W, 2) sampling map: undistorted pixel -> distorted source pixel."""
    import jax.numpy as jnp

    fx, fy = intrinsic[0, 0], intrinsic[1, 1]
    cx, cy = intrinsic[0, 2], intrinsic[1, 2]
    k1, k2, p1, p2, k3 = [float(d) for d in np.asarray(distortion).reshape(-1)[:5]]

    ys, xs = jnp.meshgrid(jnp.arange(height, dtype=jnp.float32) + 0.5,
                          jnp.arange(width, dtype=jnp.float32) + 0.5,
                          indexing="ij")
    x = (xs - cx) / fx
    y = (ys - cy) / fy
    r2 = x * x + y * y
    radial = 1.0 + k1 * r2 + k2 * r2 ** 2 + k3 * r2 ** 3
    x_d = x * radial + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
    y_d = y * radial + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
    u = x_d * fx + cx
    v = y_d * fy + cy
    return jnp.stack([v, u], axis=-1)  # (H, W, 2) row/col source coords


def undistort_image_jax(image, intrinsic, distortion):
    """Bilinear remap through the distortion model (pure JAX)."""
    import jax.numpy as jnp

    image = jnp.asarray(image, jnp.float32)
    squeeze = image.ndim == 2
    if squeeze:
        image = image[..., None]
    h, w = image.shape[:2]
    m = undistort_map(np.asarray(intrinsic, np.float32),
                      np.asarray(distortion, np.float32), h, w)
    sy = m[..., 0] - 0.5
    sx = m[..., 1] - 0.5
    y0 = jnp.clip(jnp.floor(sy).astype(jnp.int32), 0, h - 1)
    x0 = jnp.clip(jnp.floor(sx).astype(jnp.int32), 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    fy = (sy - y0.astype(jnp.float32))[..., None]
    fx = (sx - x0.astype(jnp.float32))[..., None]
    out = (image[y0, x0] * (1 - fx) * (1 - fy) + image[y0, x1] * fx * (1 - fy)
           + image[y1, x0] * (1 - fx) * fy + image[y1, x1] * fx * fy)
    return out[..., 0] if squeeze else out


def undistort_take(takedir: str, outdir: str, calibpath: str,
                   use_cv2: bool = True) -> None:
    """Undistort every frame of every camera directory (undistort.py parity).

    Camera directory names end with the calibration key after the last
    '_' (undistort.py:37-38).
    """
    from PIL import Image

    with open(calibpath) as f:
        calib = json.load(f)
    os.makedirs(outdir, exist_ok=True)
    for cam in sorted(os.listdir(takedir)):
        campath = os.path.join(takedir, cam)
        if not os.path.isdir(campath):
            continue
        key = cam.split("_")[-1]
        intr = np.asarray(calib[key]["intrinsic"], np.float32)
        dist = np.asarray(calib[key]["distortion"], np.float32)
        outcam = os.path.join(outdir, cam)
        os.makedirs(outcam, exist_ok=True)
        for frame in sorted(os.listdir(campath)):
            img = np.array(Image.open(os.path.join(campath, frame)))
            if use_cv2:
                try:
                    und = undistort_image_cv2(img, intr, dist)
                except ImportError:
                    und = np.asarray(undistort_image_jax(img, intr, dist))
                    und = und.astype(img.dtype)
            else:
                und = np.asarray(undistort_image_jax(img, intr, dist))
                und = und.astype(img.dtype)
            Image.fromarray(und).save(os.path.join(outcam, frame))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--take", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--calib", required=True)
    ap.add_argument("--jax", action="store_true", help="use pure-JAX remap")
    args = ap.parse_args()
    undistort_take(args.take, args.out, args.calib, use_cv2=not args.jax)


if __name__ == "__main__":
    main()
