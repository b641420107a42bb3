"""Fit configuration: the typed equivalent of fitTake's 30-kwarg signature.

The reference uses the ``fitTake`` signature itself as the config schema and
dumps ``locals()`` to config.txt (reference fit.py:323-357, 401, 655-657).
Here the schema is an explicit frozen dataclass, extended with TPU-first
fields (batching, sharding, checkpointing, rasterizer implementation).
"""

from __future__ import annotations

import dataclasses
import json
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class FitConfig:
    # --- optimization (reference fit.py:323-332) ---
    max_iter: int = 80000
    lr_base: float = 1e-3
    lr_tex_coef: float = 0.5
    lr_ramp: float = 0.005
    lr_t: float = 1e-5
    lr_q: float = 1e-5

    # --- data paths (reference fit.py:329-336) ---
    basemeshpath: str = ""
    localblpath: str = ""
    globalblpath: str = ""
    imdir: str = ""
    calibpath: str = ""
    texpath: str = ""
    maskpath: str = ""
    out_dir: str = "out"

    # --- rendering (reference fit.py:336-341) ---
    enable_mip: bool = False
    max_mip_level: int = 6
    texshape: Tuple[int, int, int] = (1024, 1024, 1)
    resolution: Tuple[int, int] = (1600, 1200)

    # --- logging / saving (reference fit.py:332-341) ---
    display_interval: int = 0
    log_interval: int = 50
    mp4_interval: int = 0

    # --- staging ratios (reference fit.py:342-344; accepted but unused in
    #     the reference loop body — kept for config parity) ---
    tex_startlearnratio: int = 20
    tex_ramplearnratio: Tuple[float, float] = (2.0, 0.75)
    free_startlearnratio: int = 4

    # --- regularizers (reference fit.py:345-357) ---
    weight_laplacian: float = 0.0
    weight_meshedge: float = 0.0
    meshedge_target: float = 0.05
    weight_normalconsistency: float = 0.0
    regularize_correctives: bool = False
    regularize_prior: bool = False
    # temporal smoothness across neighboring frames (BASELINE.json config
    # 3; no reference equivalent): L2 on pose/activation deltas between
    # frame f and f-1.
    weight_temporal: float = 0.0

    # --- scene / mode (reference fit.py:349-356) ---
    cam_idxs: Tuple[int, ...] = (0, 1, 2, 3, 4, 5, 6, 7, 8)
    whiten_mean: float = 50.0
    whiten_std: float = 25.0
    mode: str = "prior"
    combined_corrective_coefficient: float = 1.0

    # --- TPU-first extensions (no reference equivalent) ---
    batch_size: int = 1          # (cam, frame) samples per step (vs 1, fit.py:525)
    seed: int = 0
    raster_impl: str = "auto"    # auto | pallas | scan
    aa_max_pairs: int = 0        # 0 = auto (8*(H+W)); -1 = exact full grid
    # Backward bin-entry cap for the Pallas gradient reduction. 0 = auto:
    # fit_take measures the scene with raster_stats and sizes the cap so
    # no gradient contribution can be dropped; >0 = explicit cap.
    pair_cap: int = 0
    steps_per_dispatch: int = 1  # lax.scan-ed steps per host dispatch
    checkpoint_interval: int = 0  # steps between orbax checkpoints (0 = off)
    checkpoint_dir: str = ""
    mesh_axes: Tuple[str, ...] = ()   # e.g. ("frame", "view") for sharding
    mesh_shape: Tuple[int, ...] = ()

    def validate(self) -> None:
        valid_modes = ("prior", "free", "combined")
        if self.mode not in valid_modes:
            raise ValueError(
                f"No valid mode ({self.mode!r}) selected from valid "
                f"configurations {valid_modes}")

    def save(self, path: str) -> None:
        """Dump all fields (the config.txt record, reference fit.py:655-657)."""
        with open(path, "w") as f:
            for k, v in dataclasses.asdict(self).items():
                f.write(f"{k}: '{v}'\n")

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)
