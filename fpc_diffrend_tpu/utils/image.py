"""Image utilities (whitening, blur, grids, saving).

Pure JAX / numpy equivalents of the reference's utils.py: whiten
(utils.py:39-52), normalize (utils.py:56-67), highlight reduction
(utils.py:12-35), gaussian kernels + smoothing (utils.py:71-156 — torch
conv modules there, a jax depthwise conv here), image grid make_img
(utils.py:179-190) and save_image (utils.py:242-244). The GLFW/OpenGL live
preview window (utils.py:195-237) is replaced by PNG snapshots — there is
no display attached to a TPU host.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def reduce_highlights(img, mean):
    """abs(img - (img - mean)) (reference utils.py:12-15)."""
    img = jnp.asarray(img)
    return jnp.abs(img - (img - mean))


def normalize_highlights(img, alpha: float = 0.99, beta: float = 0.5):
    """Gamma-ish highlight compression (reference utils.py:17-35)."""
    img = jnp.asarray(img)
    lo = jnp.min(img)
    rng = jnp.max(img) - lo
    scaled = (img - lo) / rng
    return (scaled ** alpha * rng + lo) * beta


def whiten(image, mean, std):
    """(image - mean) / std (reference utils.py:39-52)."""
    return (jnp.asarray(image) - mean) / std


def normalize_image(image, low, high):
    """(image - low) / (high - low) (reference utils.py:56-67)."""
    return (jnp.asarray(image) - low) / (high - low)


def gaussian_1d(m: int, std: float) -> Array:
    """Unnormalized 1D gaussian window (reference utils.py:139-143)."""
    n = jnp.arange(0, m, dtype=jnp.float32) - (m - 1.0) / 2.0
    return jnp.exp(-(n ** 2) / (2 * std * std))


def gaussian_kernel(kernel_size: int, std: float = 128.0) -> Array:
    """2D gaussian kernel via outer product (reference utils.py:147-156)."""
    k1 = gaussian_1d(kernel_size, std)
    return jnp.outer(k1, k1)


def gaussian_blur(image: Array, kernel_size: int, sigma: float) -> Array:
    """Depthwise gaussian blur of an (H, W, C) image.

    Equivalent of the reference's GaussianSmoothing module
    (utils.py:71-135); 'same' padding, normalized kernel.
    """
    k1 = gaussian_1d(kernel_size, sigma)
    k1 = k1 / jnp.sum(k1)
    c = image.shape[-1]
    x = jnp.moveaxis(image, -1, 0)[:, None]      # (C, 1, H, W)
    kh = jnp.broadcast_to(k1.reshape(1, 1, -1, 1), (c, 1, kernel_size, 1))
    kw = jnp.broadcast_to(k1.reshape(1, 1, 1, -1), (c, 1, 1, kernel_size))
    dn = jax.lax.conv_dimension_numbers(x.shape, kh.shape,
                                        ("NCHW", "OIHW", "NCHW"))
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), "SAME", dimension_numbers=dn,
                                     feature_group_count=c)
    x = jax.lax.conv_general_dilated(x, kw, (1, 1), "SAME", dimension_numbers=dn,
                                     feature_group_count=c)
    return jnp.moveaxis(x[:, 0], 0, -1)


def make_img(arr, ncols: int = 2):
    """Stack N same-shape images into a grid (reference utils.py:179-190)."""
    arr = np.asarray(arr)
    n, height, width, nc = arr.shape
    nrows = n // ncols
    assert n == nrows * ncols
    return (arr.reshape(nrows, ncols, height, width, nc)
            .swapaxes(1, 2)
            .reshape(height * nrows, width * ncols, nc))


def save_image(filepath: str, x) -> None:
    """Save an image array (uint8 or float [0,1]) as PNG/etc."""
    from PIL import Image

    x = np.asarray(x)
    if x.dtype != np.uint8:
        x = np.clip(np.rint(x * 255.0), 0, 255).astype(np.uint8)
    if x.ndim == 3 and x.shape[-1] == 1:
        x = x[..., 0]
    Image.fromarray(x).save(filepath)


def display_image(image, path: str = "preview.png") -> bool:
    """Headless stand-in for the reference's GL preview window
    (utils.py:195-237): writes the current frame to a PNG."""
    save_image(path, np.asarray(image))
    return True
