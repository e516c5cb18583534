"""YAML config-group presets (role of the reference's Hydra conf/ tree,
ref conf/config.yaml + conf/{dataset,model}/*.yaml). The train CLI resolves
`dataset=<name>` / `model=<name>` first against these files, then against the
built-in defaults in core/config.py."""

from __future__ import annotations

import os

import yaml

CONF_DIR = os.path.dirname(os.path.abspath(__file__))


def load_group(group: str, name: str) -> dict | None:
    """Load conf/<group>/<name>.yaml if present."""
    path = os.path.join(CONF_DIR, group, f"{name}.yaml")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return yaml.safe_load(f) or {}


def post_process_conf(config):
    """Config fix-ups after merging (role of ref conf/__init__.py:2-8)."""
    d = config.dataset
    if d.get("name") == "ycbv_sift":
        if d.get("n_kpts_model") is None:
            d.n_kpts_model = d.get("n_kpts", 128)
        if d.get("n_kpts_obs") is None:
            d.n_kpts_obs = d.get("n_kpts", 128)
    return config
