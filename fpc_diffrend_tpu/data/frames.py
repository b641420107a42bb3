"""Reference-frame ingestion: preload a take's frames to device memory.

The reference re-reads a TIF from disk with PIL on EVERY optimizer step
(fit.py:529-533) — a per-step host->device round trip and disk stall. Here
a take is loaded once into a (n_cams, n_frames, H, W) uint8 array (clipped
to [0, 140] and vertically flipped at ingest, matching fit.py:531-532),
optionally cached as a .npy memmap, and transferred to device once; the
train step gathers its batch on device.
"""

from __future__ import annotations

import os

import numpy as np


def frame_digits(n_frames: int) -> int:
    """Zero-padding width of frame numbers (reference fit.py:43)."""
    return 2 if n_frames < 100 else 3


def assert_num_frames(cams: list[str], imdir: str) -> tuple[int, int]:
    """Frame count + digit width, asserting all cameras agree (fit.py:29-43)."""
    n_frames = [len(os.listdir(os.path.join(imdir, c))) for c in cams]
    assert not any(x != n_frames[0] for x in n_frames), \
        "All cameras do not have the same number of frames!"
    return n_frames[0], frame_digits(n_frames[0])


def load_take(imdir: str, cams: list[str], clip_max: int = 140,
              cache: str | None = None) -> np.ndarray:
    """Load all frames of a take: (n_cams, n_frames, H, W) uint8.

    Frame files are ``{cam}/{cam}_{frame:0{digits}d}.tif`` (fit.py:529-530).
    Values are clipped to [0, clip_max] and flipped vertically (fit.py:531-532).

    :param cache: optional .npy path; if it exists it is memmapped instead
        of re-decoding TIFs.
    """
    if cache and os.path.exists(cache):
        return np.load(cache, mmap_mode="r")

    n_frames, digits = assert_num_frames(cams, imdir)
    paths = [os.path.join(imdir, cam, f"{cam}_{fi:0{digits}d}.tif")
             for cam in cams for fi in range(n_frames)]

    out = None
    # fast path: the native threaded TIFF decoder (runtime/csrc)
    try:
        from fpc_diffrend_tpu.runtime import native

        probe = native.tiff_probe(paths[0]) if native.available() else None
        if probe is not None:
            w, h = probe
            out = native.load_tiffs(paths, w, h, clip_max=clip_max,
                                    flip=True)
            out = out.reshape(len(cams), n_frames, h, w)
    except Exception:
        out = None

    if out is None:
        from PIL import Image

        first = np.array(Image.open(paths[0]))
        out = np.empty((len(cams), n_frames) + first.shape[:2], np.uint8)
        for ci, cam in enumerate(cams):
            for fi in range(n_frames):
                img = np.array(Image.open(paths[ci * n_frames + fi]))
                img = np.clip(img, 0, clip_max)
                out[ci, fi] = img[::-1].astype(np.uint8)

    if cache:
        np.save(cache, out)
    return out


def synthetic_take(render_fn, n_cams: int, n_frames: int) -> np.ndarray:
    """Render a synthetic ground-truth take (for tests/benchmarks).

    :param render_fn: fn(cam_idx, frame_idx) -> (H, W) float image in [0, 1].
    """
    sample = np.asarray(render_fn(0, 0))
    out = np.empty((n_cams, n_frames) + sample.shape, np.uint8)
    for c in range(n_cams):
        for f in range(n_frames):
            img = np.asarray(render_fn(c, f))
            out[c, f] = np.clip(np.rint(img * 255.0), 0, 255).astype(np.uint8)
    return out
