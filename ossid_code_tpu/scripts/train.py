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
    """Dataset dispatcher (role of ref datasets/__init__.py:7-24)."""
    name = cfg.dataset.name
    if name == "dtoid_bop":
        from ossid_code_tpu.data.dtoid_bop import get_dataloaders

        return get_dataloaders(cfg)
    if name in ("dtoid", "render"):
        from ossid_code_tpu.data.hdf5_render import get_render_dataloaders

        return get_render_dataloaders(cfg)
    raise SystemExit(f"unknown dataset {name!r} (dtoid_bop, dtoid, render)")


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    overrides = parse_overrides([a for a in argv if "=" in a])
    # group shortcuts: dataset=NAME / model=NAME select config groups,
    # resolved against the YAML presets in ossid_code_tpu/conf/ when present
    from ossid_code_tpu.conf import load_group, post_process_conf

    for group in ("dataset", "model"):
        if isinstance(overrides.get(group), str):
            name = overrides[group]
            preset = load_group(group, name) or {}
            preset["name"] = preset.get("name", name)
            overrides[group] = preset

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

    from ossid_code_tpu.models.dtoid.module import DtoidModel
    from ossid_code_tpu.train.offline import OfflineTrainer
    from ossid_code_tpu.core.checkpoint import load_checkpoint

    model = DtoidModel(cfg, seed=cfg.seed)
    if cfg.get("weights_path"):
        model.load_state_dict(load_checkpoint(cfg.weights_path))
        print("loaded weights from", cfg.weights_path)

    n_dev = None if cfg.train.dp_devices in (-1, None) else cfg.train.dp_devices
    trainer = OfflineTrainer(model, cfg, n_devices=n_dev, ckpt_dir=exp_root)
    if cfg.get("resume_path"):
        # full resume: weights + optimizer state + epoch (ref train.py:27-41,97)
        full = trainer.restore_trainer_state(cfg.resume_path)
        print(
            f"resumed from {cfg.resume_path} at epoch {trainer.epoch}"
            + ("" if full else " (weights only; no optimizer state in ckpt)")
        )
    logger = MetricLogger(os.path.join(exp_root, f"metrics_v{version}.jsonl"))

    max_epochs = int(cfg.model.max_epochs)
    for epoch in range(trainer.epoch, max_epochs):
        metrics = trainer.train_epoch(train_loader)
        val = trainer.validate(valid_loaders[0], monitor=cfg.model.monitor)
        logger.log(epoch, **metrics, valunseen_seg_IoU=val)
        print(
            f"epoch {epoch}: loss={metrics.get('loss', float('nan')):.4f} "
            f"valunseen_seg_IoU={val:.4f} (best {trainer.best_metric:.4f})"
        )
    logger.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
