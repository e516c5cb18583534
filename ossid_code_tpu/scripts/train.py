"""Offline training CLI — role of the reference's Hydra entry point
(ref train.py:15-117): `python -m ossid_code_tpu.scripts.train dataset=dtoid_bop
model=dtoid train.batch_size=4 exp_name=myrun`.

Overrides use dotted key=value pairs on the default config tree (replacing
Hydra groups); experiment directories are versioned with the config saved as
config_v<N>.yaml like the reference (ref train.py:55-64,75-81); the best
checkpoint by the monitored metric is kept (ref train.py:83-91).
"""

from __future__ import annotations

import os
import sys

import numpy as np

from ossid_code_tpu.core import config as C
from ossid_code_tpu.core.config import Config, default_config
from ossid_code_tpu.utils.logging import MetricLogger


def parse_overrides(argv) -> dict:
    tree: dict = {}
    for arg in argv:
        if "=" not in arg:
            raise SystemExit(f"override must be key=value, got {arg!r}")
        key, value = arg.split("=", 1)
        # yaml-parse the value for types
        import yaml

        value = yaml.safe_load(value)
        node = tree
        parts = key.split(".")
        for p in parts[:-1]:
            nxt = node.setdefault(p, {})
            if not isinstance(nxt, dict):
                # a group shortcut like `dataset=dtoid_bop` came first;
                # lift it into {'name': ...} so dotted overrides compose
                nxt = {"name": nxt}
                node[p] = nxt
            node = nxt
        node[parts[-1]] = value
    return tree


def build_dataloaders(cfg):
    """Dataset dispatcher (role of ref datasets/__init__.py:7-24, which routes
    fewshot_bop / render / dtoid / dtoid_bop / detect; fss_1000 and ycbv_sift
    are this framework's drivers for the reference's remaining data classes)."""
    name = cfg.dataset.name
    if name == "dtoid_bop":
        from ossid_code_tpu.data.dtoid_bop import get_dataloaders

        return get_dataloaders(cfg)
    if name in ("dtoid", "render"):
        from ossid_code_tpu.data.hdf5_render import get_render_dataloaders

        return get_render_dataloaders(cfg)
    if name == "fewshot_bop":
        from ossid_code_tpu.data.fewshot import get_fewshot_dataloaders

        return get_fewshot_dataloaders(cfg)
    if name == "fss_1000":
        from ossid_code_tpu.data.fewshot import get_fss1000_dataloaders

        return get_fss1000_dataloaders(cfg)
    if name == "detect":
        from ossid_code_tpu.data.detect import get_detect_dataloaders

        return get_detect_dataloaders(cfg)
    if name == "ycbv_sift":
        from ossid_code_tpu.data.ycbv_sift import get_ycbv_sift_dataloaders

        return get_ycbv_sift_dataloaders(cfg)
    raise SystemExit(
        f"unknown dataset {name!r} (dtoid_bop, dtoid, render, fewshot_bop, "
        "fss_1000, detect, ycbv_sift)"
    )


# model family each dataset trains when `model=` is not given explicitly
# (ref pairs detect with maskrcnn via --use_maskrcnn; the few-shot and sift
# families' models predate the reference repo — see models/fewshot_seg.py,
# models/matcher.py)
_DEFAULT_MODEL = {
    "fewshot_bop": "fewshot_seg",
    "fss_1000": "fewshot_seg",
    "detect": "maskrcnn",
    "ycbv_sift": "matcher",
}


def build_model(cfg):
    """Model dispatcher (role of ref models/__init__.py getModel:3-15)."""
    name = cfg.model.get("name", "dtoid")
    if name == "dtoid":
        from ossid_code_tpu.models.dtoid.module import DtoidModel

        return DtoidModel(cfg, seed=cfg.seed)
    if name == "maskrcnn":
        from ossid_code_tpu.models.maskrcnn import MaskRCNN

        return MaskRCNN(cfg, seed=cfg.seed)
    if name == "fewshot_seg":
        from ossid_code_tpu.models.fewshot_seg import FewshotSegModel

        return FewshotSegModel(cfg, seed=cfg.seed)
    if name in ("matcher", "superglue"):
        from ossid_code_tpu.models.matcher import SiftMatcher

        return SiftMatcher(cfg, seed=cfg.seed)
    raise SystemExit(
        f"unknown model {name!r} (dtoid, maskrcnn, fewshot_seg, matcher)"
    )


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    overrides = parse_overrides([a for a in argv if "=" in a])
    # group shortcuts: dataset=NAME / model=NAME select config groups,
    # resolved against the YAML presets in ossid_code_tpu/conf/ when present
    from ossid_code_tpu.conf import load_group, post_process_conf

    for group in ("dataset", "model"):
        ov = overrides.get(group)
        if isinstance(ov, str):
            ov = {"name": ov}
        if isinstance(ov, dict) and "name" in ov:
            # resolve the YAML preset, then apply dotted overrides on top
            # (`dataset=dtoid_bop dataset.bop_root=...` composes)
            preset = load_group(group, ov["name"]) or {}
            merged = {**preset, **ov}
            merged["name"] = preset.get("name", ov["name"])
            overrides[group] = merged
    # model follows the dataset family when not explicitly chosen
    ds_name = (overrides.get("dataset") or {}).get("name")
    model_ov = overrides.get("model") or {}
    if "name" not in model_ov and ds_name in _DEFAULT_MODEL:
        mname = _DEFAULT_MODEL[ds_name]
        preset = load_group("model", mname) or {}
        preset["name"] = preset.get("name", mname)
        overrides["model"] = {**preset, **model_ov, "name": preset["name"]}
        print(f"dataset={ds_name}: selecting model={mname}")

    cfg = post_process_conf(default_config().merged(overrides))
    np.random.seed(cfg.seed)

    exp_root = os.path.join(C.OSSID_RESULT_ROOT, "train", cfg.exp_name)
    os.makedirs(exp_root, exist_ok=True)
    version = 0
    while os.path.exists(os.path.join(exp_root, f"config_v{version}.yaml")):
        version += 1
    cfg.save(os.path.join(exp_root, f"config_v{version}.yaml"))
    print(f"experiment {cfg.exp_name} v{version} -> {exp_root}")

    train_loader, valid_loaders, test_loader = build_dataloaders(cfg)
    if not isinstance(valid_loaders, (list, tuple)):
        valid_loaders = [valid_loaders]

    from ossid_code_tpu.train.offline import OfflineTrainer, GenericTrainer
    from ossid_code_tpu.core.checkpoint import load_checkpoint

    model = build_model(cfg)
    if cfg.get("weights_path"):
        model.load_state_dict(load_checkpoint(cfg.weights_path))
        print("loaded weights from", cfg.weights_path)

    if cfg.model.get("name", "dtoid") == "dtoid":
        n_dev = None if cfg.train.dp_devices in (-1, None) else cfg.train.dp_devices
        trainer = OfflineTrainer(model, cfg, n_devices=n_dev, ckpt_dir=exp_root)
    else:
        trainer = GenericTrainer(model, cfg, ckpt_dir=exp_root)
    if cfg.get("resume_path"):
        # full resume: weights + optimizer state + epoch (ref train.py:27-41,97)
        full = trainer.restore_trainer_state(cfg.resume_path)
        print(
            f"resumed from {cfg.resume_path} at epoch {trainer.epoch}"
            + ("" if full else " (weights only; no optimizer state in ckpt)")
        )
    # jsonl + TensorBoard events (the reference's W&B/TB logging role,
    # ref train.py:75-80; `tensorboard --logdir <exp>/tb` works directly)
    logger = MetricLogger(os.path.join(exp_root, f"metrics_v{version}.jsonl"),
                          tb_dir=os.path.join(exp_root, "tb"))

    monitor = cfg.model.get("monitor", "val_metric")
    fig_interval = int(cfg.model.get("figure_interval", 0) or 0)
    max_epochs = int(cfg.model.max_epochs)
    for epoch in range(trainer.epoch, max_epochs):
        metrics = trainer.train_epoch(train_loader)
        val = trainer.validate(valid_loaders[0], monitor=monitor)
        if fig_interval and hasattr(trainer, "log_figures") and (
            epoch % fig_interval == 0 or epoch == max_epochs - 1
        ):
            # periodic prediction figures (role of the reference's W&B figure
            # logging, ref models/dtoid/__init__.py:319-322)
            trainer.log_figures(valid_loaders[0], exp_root, epoch)
        logger.log(epoch, **metrics, **{monitor: val})
        print(
            f"epoch {epoch}: loss={metrics.get('loss', float('nan')):.4f} "
            f"{monitor}={val:.4f} (best {trainer.best_metric:.4f})"
        )
    logger.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
