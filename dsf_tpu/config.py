"""Configuration system: a dataclass with the reference Config's exact
field surface (ref: config.py:1-99), plus TPU-specific knobs.

The reference is an edit-the-file static class; here the same fields are
a frozen dataclass constructible from kwargs / CLI / dict, with the same
per-dataset tables and the same auto-composed run name.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

JOINT = {"nyu": 14, "icvl": 16, "msra": 21, "shrec": 21}
STEP = {"nyu": 10, "msra": 5, "icvl": 4, "shrec": 5}
EPOCH = {"nyu": 15, "msra": 10, "icvl": 8, "shrec": 10}
CUBE = {
    "nyu": (250, 250, 250),
    "msra": (200, 200, 200),
    "icvl": (200, 200, 200),
    "shrec": (200, 200, 200),
}


@dataclasses.dataclass(frozen=True)
class Config:
    # phase / stage (ref: config.py:32-39)
    phase: str = "train"                  # 'train' | 'test'
    root_dir: str = "./data"
    dataset: str = "nyu"                  # 'nyu' | 'icvl' | 'msra' | 'shrec'
    model_save: str = ""
    add_info: str = "Finetune-Stage"
    train_stage: str = "Finetune"         # 'Pretrain' | 'Finetune'
    stage_num: int = 2
    mask: bool = True

    # exports (ref: config.py:41-43)
    save_mesh: bool = False
    save_result: bool = True
    save_obj: bool = False

    # loss weights (ref: config.py:45-50)
    deconv_weight: float = 1.0
    coord_weight: float = 100.0
    model_weight: float = 1.0
    partICP_weight: float = 1.0
    M2P_weight: float = 1.0
    coll_weight: float = 1.0

    # checkpoints / assets (ref: config.py:53-69)
    finetune_dir: str = ""
    load_model: str = ""
    transferNet_pth: str = ""             # fixing the reference's typo
    mano_model_path: str = "./MANO/mano_right.npz"

    save_dir: str = "./checkpoint"
    train_img_type: str = "real"
    test_img_type: str = "real"
    test_id: int = 0                      # msra leave-one-out subject

    test_during_train: bool = True
    image_every: int = 200                # TB pose/depth overlays cadence
                                          # (0 = off; ref logs each iter)

    batch_size: int = 32
    input_size: int = 128

    center_type: str = "refine"           # 'joint_mean' | 'refine'
    loss_type: str = "L1Loss"
    augment_para: Tuple[float, float, float] = (10, 0.2, 180)

    lr: float = 1e-3
    opt: str = "adamw"
    scheduler: str = "step"

    net: str = "ResNet_stage_18"
    feature_type: Tuple[str, ...] = ("offset",)
    feature_para: Tuple[float, ...] = (0.8,)

    # TPU-specific
    num_devices: int = 1                  # data-parallel size
    n_fsdp: int = 1                       # >1: shard params/optimizer over
                                          # an 'fsdp' mesh axis (ZeRO-3 via
                                          # GSPMD; parallel/mesh.py)
    compute_dtype: str = "float32"        # 'float32' | 'bfloat16'
    cache_depths: bool = True             # RAM-cache decoded train depth
                                          # frames (uint16; bounded to half
                                          # of available RAM in loop.py)
    seed: int = 0

    @property
    def joint_num(self) -> int:
        return JOINT[self.dataset]

    @property
    def cube_size(self) -> Tuple[int, int, int]:
        return CUBE[self.dataset]

    @property
    def max_epoch(self) -> int:
        return EPOCH[self.dataset]

    @property
    def step_size(self) -> int:
        return STEP[self.dataset]

    def run_name(self) -> str:
        """Auto-composed run directory name (ref: train_render.py:42-62)."""
        if self.model_save:
            return self.model_save
        name = (f"{self.net}_{self.opt}_centerType{self.center_type}"
                f"_coord_weight_{self.coord_weight}"
                f"_deconv_weight_{self.deconv_weight}"
                f"_step_size_{self.step_size}"
                f"_CubeSize_{self.cube_size[0]}_")
        name += "".join(f"{ft}_{fp}" for ft, fp in
                        zip(self.feature_type, self.feature_para))
        if self.finetune_dir:
            name = "finetune_" + name
        return name + self.add_info

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)
