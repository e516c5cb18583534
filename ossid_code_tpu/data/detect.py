"""Per-image multi-object detection dataset (the Mask R-CNN path's data,
ref datasets/detect_dataset/__init__.py:114-262): each sample is one frame
with boxes/labels/per-class masks for every annotated object, where labels can
come from GT or from zephyr pseudo-labels, plus a per-class confidence vector
(ref :202-206).

The vendored torchvision distributed/logging helpers of the reference's
detect_dataset/utils.py (SmoothedValue, init_distributed_mode with NCCL+SLURM)
have no role here: multi-device training goes through jax.sharding
(parallel/mesh.py) and metric aggregation is a psum inside the jitted step.
"""

from __future__ import annotations

import numpy as np
import cv2

from ossid_code_tpu.utils.image import process_data


def get_detect_dataloaders(cfg):
    """(train, valid, test) loaders of per-frame multi-object detection
    samples for the train CLI (ref datasets/__init__.py:20-22 dispatches
    'detect' to detect_dataset.getDataloaders). Frames split 80/20
    train/valid; labels come from zephyr pseudo-labels when a result pkl is
    configured, else GT (ref detect_dataset/__init__.py:202-206)."""
    from ossid_code_tpu.data.bop import BopDataset, BopDatasetArgs
    from ossid_code_tpu.data.dtoid_bop import NumpyLoader

    d = cfg.dataset
    bop = BopDataset(BopDatasetArgs(
        bop_root=d.bop_root, dataset_name=d.get("train_dataset_name") or d.test_dataset_name,
        split_name=d.get("split_name", "bop_test"), split=d.get("split", "test"),
    ))
    zephyr_results = None
    if d.get("load_zephyr_result") and d.get("zephyr_result_path"):
        import pickle

        with open(d.zephyr_result_path, "rb") as f:
            zr_list = pickle.load(f)
        zephyr_results = {(r["obj_id"], r["scene_id"], r["im_id"]): r for r in zr_list}

    full = DetectDataset(bop, d, zephyr_results)
    train_ds = DetectDataset(bop, d, zephyr_results)
    valid_ds = DetectDataset(bop, d, zephyr_results)
    train_ds.frames = [f for i, f in enumerate(full.frames) if i % 5 != 4]
    valid_ds.frames = [f for i, f in enumerate(full.frames) if i % 5 == 4] or full.frames[:1]
    b = int(cfg.train.batch_size)
    return (
        NumpyLoader(train_ds, batch_size=b, shuffle=True, drop_last=True),
        NumpyLoader(valid_ds, batch_size=b, drop_last=True),
        NumpyLoader(full, batch_size=1),
    )


class DetectDataset:
    def __init__(self, bop_dataset, cfg, zephyr_results: dict | None = None, seed=0):
        self.bop_dataset = bop_dataset
        self.cfg = cfg
        self.zephyr_results = zephyr_results
        self.n_classes = int(cfg.n_classes)
        self.rng = np.random.default_rng(seed)

        # group targets per frame
        frames: dict = {}
        for t in bop_dataset.targets:
            frames.setdefault((t["scene_id"], t["im_id"]), []).append(t["obj_id"])
        self.frames = sorted(frames.items())

    def __len__(self):
        return len(self.frames)

    def __getitem__(self, idx):
        (scene_id, im_id), obj_ids = self.frames[idx]
        boxes, labels = [], []
        data0 = None
        h = w = None
        masks_by_class = None
        confidences = np.zeros(self.n_classes, np.float32)

        for obj_id in obj_ids:
            data = self.bop_dataset.getDataByIds(obj_id, scene_id, im_id)
            if data0 is None:
                data0 = data
                proc = process_data(
                    data["img"],
                    np.zeros(data["depth"].shape, np.float32),
                    data["depth"],
                    np.asarray(data["scene_camera"]["cam_K"]),
                    keep_aspect_ratio=self.cfg.keep_aspect_ratio,
                    shorter_length=self.cfg.shorter_length,
                    compute_xyz=False,
                )
                h, w = proc["mask"].shape[:2]
                masks_by_class = np.zeros((h, w, self.n_classes), np.float32)

            zr = None if self.zephyr_results is None else self.zephyr_results.get(
                (obj_id, scene_id, im_id)
            )
            if zr is not None:
                mask = np.asarray(zr["pred_mask_visib"]).astype(np.float32)
                confidences[obj_id - 1] = zr.get("score", 0.0)
            else:
                mask = np.asarray(data["mask_gt_visib"]).astype(np.float32) / 255.0
                confidences[obj_id - 1] = 1.0
            if mask.shape != (h, w):
                mask = cv2.resize(mask, (w, h), interpolation=cv2.INTER_NEAREST)

            ys, xs = (mask > 0.5).nonzero()
            if len(ys) == 0:
                continue
            boxes.append([xs.min(), ys.min(), xs.max(), ys.max(), obj_id - 1])
            labels.append(obj_id)
            masks_by_class[..., obj_id - 1] = np.maximum(
                masks_by_class[..., obj_id - 1], (mask > 0.5).astype(np.float32)
            )

        max_obj = self.cfg.get("max_objects", 8)
        bbox_gt = -np.ones((max_obj, 5), np.float32)
        for i, b in enumerate(boxes[:max_obj]):
            bbox_gt[i] = b
        return {
            "img": proc["img"],
            "bbox_gt": bbox_gt,
            "masks": masks_by_class,
            "labels": np.asarray(labels[:max_obj] + [0] * (max_obj - len(labels[:max_obj]))),
            "confidences": confidences,
            "scene_id": scene_id,
            "im_id": im_id,
        }
