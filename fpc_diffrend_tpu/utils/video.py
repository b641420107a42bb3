"""Progress video writing (reference mp4_interval behavior, fit.py:409-412,
637-638): periodically append a [reference | render] comparison frame to an
mp4. Host-side and fully gated — on headless/ffmpeg-less systems it
degrades to PNG frames.
"""

from __future__ import annotations

import os

import numpy as np


class ProgressVideo:
    """Accumulates comparison frames; mp4 via imageio or PNG fallback."""

    def __init__(self, out_dir: str, fps: int = 30,
                 filename: str = "progress.mp4"):
        os.makedirs(out_dir, exist_ok=True)
        self.out_dir = out_dir
        self.count = 0
        try:
            import imageio

            self.writer = imageio.get_writer(
                os.path.join(out_dir, filename), mode="I", fps=fps,
                codec="libx264", bitrate="16M")
        except Exception:
            self.writer = None

    def append(self, ref_img: np.ndarray, render_img: np.ndarray) -> None:
        """Side-by-side [ref | render], both (H, W, C) in [0, 1]-ish."""
        from fpc_diffrend_tpu.utils.image import make_img

        ref = np.asarray(ref_img, np.float32)
        ren = np.asarray(render_img, np.float32)
        if ref.ndim == 2:
            ref = ref[..., None]
        if ren.ndim == 2:
            ren = ren[..., None]
        frame = make_img(np.stack([ref, ren]))
        frame_u8 = np.clip(np.rint(frame * 255.0), 0, 255).astype(np.uint8)
        if self.writer is not None:
            self.writer.append_data(frame_u8)
        else:
            from fpc_diffrend_tpu.utils.image import save_image

            save_image(os.path.join(self.out_dir,
                                    f"progress_{self.count:05d}.png"),
                       frame_u8)
        self.count += 1

    def close(self) -> None:
        if self.writer is not None:
            self.writer.close()


def progress_callback(video: ProgressVideo, config, scene, interval: int,
                      frames_u8):
    """run_fit callback rendering a fixed (cam 0, frame 0) comparison every
    ``interval`` steps (the reference's display/mp4 sample is the current
    random sample; a fixed sample makes progress legible)."""
    import jax.numpy as jnp

    from fpc_diffrend_tpu.fit import loop as fit_loop

    def cb(i, state, metrics):
        if not interval or i % interval:
            return
        img, _ = fit_loop.render_sample(config, scene, state.params,
                                        jnp.int32(0), jnp.int32(0))
        ref = np.asarray(frames_u8[0, 0], np.float32)[..., None] / 255.0
        video.append(ref[::-1], np.asarray(img)[::-1])

    return cb
