"""Native runtime (C++ .so) tests: builds with make, parity with PIL/Python."""

import os

import numpy as np
import pytest

from fpc_diffrend_tpu.runtime import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def test_tiff_decode_parity_with_pil(tmp_path, rng):
    from PIL import Image

    paths = []
    imgs = []
    for i in range(5):
        img = rng.integers(0, 255, size=(24, 32), dtype=np.uint8)
        p = str(tmp_path / f"f{i}.tif")
        Image.fromarray(img).save(p)
        paths.append(p)
        imgs.append(img)

    w, h = native.tiff_probe(paths[0])
    assert (w, h) == (32, 24)
    out = native.load_tiffs(paths, w, h, clip_max=140, flip=True)
    for i in range(5):
        want = np.clip(imgs[i], 0, 140)[::-1]
        np.testing.assert_array_equal(out[i], want)


def test_tiff_decode_16bit(tmp_path, rng):
    from PIL import Image

    img = rng.integers(0, 65535, size=(16, 16), dtype=np.uint16)
    p = str(tmp_path / "f16.tif")
    Image.fromarray(img).save(p)
    out = native.load_tiffs([p], 16, 16, clip_max=255, flip=False)
    # native keeps the high byte
    np.testing.assert_array_equal(out[0], (img >> 8).astype(np.uint8))


def test_obj_vertex_parse_parity(tmp_path, rng):
    from fpc_diffrend_tpu.data import obj as objlib

    paths = []
    refs = []
    for i in range(4):
        verts = rng.normal(size=(7, 3)).astype(np.float32)
        p = str(tmp_path / f"bs{i}.obj")
        objlib.save_obj(p, verts, np.zeros((7, 2)),
                        np.array([[0, 1, 2]], np.int32))
        paths.append(p)
        refs.append(verts.reshape(-1))

    out = native.parse_obj_vertices(paths, 21)
    for i in range(4):
        np.testing.assert_allclose(out[i], refs[i], rtol=1e-6)


def test_seq_bulk_read(tmp_path, rng):
    from fpc_diffrend_tpu.data import seq as seqlib

    frames = rng.integers(0, 255, size=(6, 8, 16), dtype=np.uint8)
    p = str(tmp_path / "take.seq")
    seqlib.write_seq(p, frames)
    r = seqlib.SeqReader(p)
    out = native.seq_read_frames(p, 1, 4, 16, 8,
                                 r.header.true_image_size)
    np.testing.assert_array_equal(out, frames[1:5])
    r.close()


def test_load_take_uses_native(tmp_path, rng):
    """data.frames.load_take must produce identical output either way."""
    from PIL import Image

    from fpc_diffrend_tpu.data import frames as frames_mod

    imdir = tmp_path / "take"
    for cam in ("take_camA", "take_camB"):
        d = imdir / cam
        d.mkdir(parents=True)
        for f in range(3):
            img = rng.integers(0, 255, size=(12, 10), dtype=np.uint8)
            Image.fromarray(img).save(d / f"{cam}_{f:02d}.tif")

    out = frames_mod.load_take(str(imdir), ["take_camA", "take_camB"])
    assert out.shape == (2, 3, 12, 10)
    # verify against direct PIL decode of one file
    ref = np.array(Image.open(imdir / "take_camA" / "take_camA_01.tif"))
    np.testing.assert_array_equal(out[0, 1], np.clip(ref, 0, 140)[::-1])
