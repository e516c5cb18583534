"""Checkpoint save/load.

Two formats:
  * native: pickled pytree of numpy arrays ({'params': ..., 'batch_stats': ...}),
    written atomically; the online loop embeds the same structure in its result
    pickle (parity with the reference embedding torch state_dicts,
    ref scripts/online_learning.py:593-600);
  * torch import: `.ckpt`/`.pth` files saved by the reference are loaded with
    torch (CPU) and converted through the name-mapping shim in
    models/dtoid/torch_import.py.
"""

from __future__ import annotations

import os
import pickle

import jax
import numpy as np


def save_checkpoint(path: str, state: dict, extra: dict | None = None):
    payload = {"state": jax.device_get(state)}
    if extra:
        payload.update(extra)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> dict:
    """Load a checkpoint into a state dict {'params', 'batch_stats'}.

    Dispatches on content: native pickles load directly; torch state_dicts go
    through the import shim.
    """
    if path.endswith((".pth", ".pth.tar", ".ckpt")):
        try:
            return _load_torch(path)
        except Exception:
            pass  # fall through: may be a native pickle with a .ckpt name
    with open(path, "rb") as f:
        payload = pickle.load(f)
    if "state" in payload:
        return payload["state"]
    if "params" in payload:
        return payload
    raise ValueError(f"unrecognized checkpoint format: {path}")


def _load_torch(path: str) -> dict:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state_dict = ckpt.get("state_dict", ckpt.get("model_state_dict", ckpt))
    state_dict = {k: np.asarray(v) for k, v in state_dict.items() if hasattr(v, "numpy") or isinstance(v, np.ndarray)}

    from ossid_code_tpu.models.dtoid.torch_import import convert_dtoid_state_dict

    return convert_dtoid_state_dict(state_dict)
