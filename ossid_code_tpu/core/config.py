"""Typed-ish config tree.

One config system replaces the reference's three-tier setup (edit-in-place
constants in config.py, Hydra YAML groups in conf/, argparse in
scripts/online_learning.py — see SURVEY.md §5.6). A `Config` is a recursive
attribute dict that can round-trip YAML, so the reference's saved OmegaConf
files (e.g. dtoid_conf_lmo.yaml) load directly.

Path roots come from environment variables instead of hard-coded home paths
(ref config.py:4-12).
"""

from __future__ import annotations

import os
import copy
import yaml


class Config(dict):
    """dict with attribute access, recursively."""

    def __init__(self, *args, **kwargs):
        super().__init__()
        self.update(dict(*args, **kwargs))

    def update(self, other):
        for k, v in other.items():
            self[k] = v

    def __setitem__(self, k, v):
        if isinstance(v, dict) and not isinstance(v, Config):
            v = Config(v)
        super().__setitem__(k, v)

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        self[k] = v

    def __deepcopy__(self, memo):
        return Config({k: copy.deepcopy(v, memo) for k, v in self.items()})

    def to_dict(self) -> dict:
        return {k: (v.to_dict() if isinstance(v, Config) else v) for k, v in self.items()}

    def save(self, path: str):
        with open(path, "w") as f:
            yaml.safe_dump(self.to_dict(), f, sort_keys=False)

    @classmethod
    def load(cls, path: str) -> "Config":
        with open(path) as f:
            return cls(yaml.safe_load(f))

    def merged(self, other: dict) -> "Config":
        out = copy.deepcopy(self)

        def _merge(dst, src):
            for k, v in src.items():
                if k in dst and isinstance(dst[k], dict) and isinstance(v, dict):
                    _merge(dst[k], v)
                else:
                    dst[k] = v

        _merge(out, other)
        return out


# ---------------------------------------------------------------------------
# Path roots (env-var overridable; ref config.py:4-20)
# ---------------------------------------------------------------------------

def _env(name, default):
    return os.environ.get(name, default)


OSSID_ROOT = _env("OSSID_ROOT", os.path.join(os.path.expanduser("~"), "ossid_workspace"))
BOP_DATASETS_ROOT = _env("BOP_DATASETS_ROOT", os.path.join(OSSID_ROOT, "bop"))
OSSID_CKPT_ROOT = _env("OSSID_CKPT_ROOT", os.path.join(OSSID_ROOT, "ckpts"))
OSSID_DATA_ROOT = _env("OSSID_DATA_ROOT", os.path.join(OSSID_ROOT, "data"))
OSSID_RESULT_ROOT = _env("OSSID_RESULT_ROOT", os.path.join(OSSID_ROOT, "results"))
BOP_RESULTS_FOLDER = _env("BOP_RESULTS_FOLDER", os.path.join(OSSID_ROOT, "bop_results"))
OSSID_DET_ROOT = _env("OSSID_DET_ROOT", os.path.join(OSSID_ROOT, "det_eval"))
BOP_TOOLKIT_PATH = _env("BOP_TOOLKIT_PATH", os.path.join(OSSID_ROOT, "bop_toolkit"))


# ---------------------------------------------------------------------------
# Default config groups (values mirror ref conf/model/dtoid.yaml and
# conf/dataset/dtoid_bop.yaml)
# ---------------------------------------------------------------------------

def dtoid_model_config() -> Config:
    return Config(
        name="dtoid",
        lam_seg=20.0,
        lam_center=20.0,
        lam_cls=1.0,
        lam_reg=1.0,
        learning_rate=1e-4,
        weight_decay=1e-6,
        nms_iou_thresh=0.5,
        img_h=480,
        img_w=640,
        heatmap_h=29,
        heatmap_w=39,
        template_size=124,
        filter_z=False,
        valid_all_templates=False,
        use_pretrained_dtoid=False,
        pretrained_dtoid_path=None,
        monitor="valunseen_seg_IoU",
        monitor_mode="max",
        max_epochs=100,
        save_top_k=5,
        # TPU-specific knobs (no reference analogue)
        compute_dtype="float32",  # 'bfloat16' for the inference fast path
        # DenseNet block2/3/4 repeats (torchvision densenet121 = 12/24/16).
        # Reducible for compile-cost-bound dryruns (the sharded train step's
        # Mesh/PartitionSpec structure is depth-independent); weight-port
        # parity requires the default.
        densenet_blocks=(12, 24, 16),
        topk_pre_nms=1000,  # ref network.py:555
        topk_post_nms=500,  # ref models/dtoid/__init__.py:117
        # seg mask transfer: 'packed' = thresholded bitmask, 8x smaller fetch
        # (the loop only consumes the mask thresholded at 0.5); 'u8' keeps
        # quantized probabilities like the reference's float mask
        seg_transfer="packed",
    )


def dtoid_bop_dataset_config() -> Config:
    return Config(
        name="dtoid_bop",
        bop_root=BOP_DATASETS_ROOT,
        grid_root=os.path.join(OSSID_DATA_ROOT, "grid_processed"),
        use_provided_template=False,
        test_dataset_name="lmo",
        train_dataset_name=None,
        load_zephyr_result=False,
        zephyr_result_path=None,
        zephyr_filter_key="score",
        zephyr_filter_threshold=20,
        zephyr_results_percent=1.0,
        keep_aspect_ratio=True,
        shorter_length=480,
        heatmap_var=1.5,
        heatmap_shorter_length=29,
        ttt_sampling=False,
        train_local_template_sample_from=1,
        n_local_test=10,
        img_h=480,
        img_w=640,
        heatmap_h=29,
        heatmap_w=39,
        n_classes=15,
    )


def default_config() -> Config:
    return Config(
        dataset=dtoid_bop_dataset_config(),
        model=dtoid_model_config(),
        train=Config(
            batch_size=4,
            num_workers=0,
            val_shuffle=False,
            n_epochs=100,
            # device-mesh shape for offline training: data-parallel axis size,
            # -1 = all available devices
            dp_devices=-1,
        ),
        resume_path=None,
        weights_path=None,
        debug=False,
        exp_name="exp",
        seed=42,
    )
