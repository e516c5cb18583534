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


def save_checkpoint(path: str, state: dict, extra: dict | None = None,
                    torch_format: bool = False):
    """Write a checkpoint. Native format by default; torch_format=True writes
    a file `torch.load` can read with the exact reference state_dict names
    (the inverse of the import shims), closing the round trip of BASELINE's
    "checkpoint formats preserved" — a model finetuned here loads back into
    the reference implementation (ref scripts/online_learning.py:159-162)."""
    if torch_format:
        return save_checkpoint_torch(path, state, extra)
    payload = {"state": jax.device_get(state)}
    if extra:
        payload.update(extra)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f)
    os.replace(tmp, path)


def save_checkpoint_torch(path: str, state: dict, extra: dict | None = None):
    """Export {'params', 'batch_stats'} as a torch checkpoint
    {'state_dict': <reference names>}. The model family is detected from the
    pytree: a zephyr PointNet2SSG tree (sa1/fc1 modules) exports through
    export_pointnet2_state_dict — its TPU-only calibrated align_head (no
    reference analogue, models/zephyr/pointnet2.py) is stripped, everything
    else round-trips bit-exact; a DTOID tree exports with the Lightning
    'model.' prefix (ref DtoidNet wraps the network as `self.model`)."""
    import torch

    state = jax.device_get(state)
    params, bstats = state["params"], state["batch_stats"]
    if "sa1" in params:
        from ossid_code_tpu.models.zephyr.torch_import import export_pointnet2_state_dict

        sd = export_pointnet2_state_dict(params, bstats)
    else:
        from ossid_code_tpu.models.dtoid.torch_import import export_dtoid_state_dict

        sd = export_dtoid_state_dict(params, bstats, with_model_prefix=True)
    payload = {"state_dict": {
        k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()
    }}
    if extra:
        payload.update(extra)
    tmp = path + ".tmp"
    torch.save(payload, tmp)
    os.replace(tmp, path)


def _is_torch_file(path: str) -> bool:
    """torch.save produces a zip archive (>=1.6) or a legacy tar/pickle with a
    magic protocol header; native checkpoints here are plain pickles."""
    import zipfile

    if zipfile.is_zipfile(path):
        return True
    # legacy torch format starts with a pickled magic number written by
    # torch.serialization; cheapest reliable signal is the file suffix then
    return path.endswith(".pth.tar")


def load_checkpoint(path: str, align_feats: bool = False) -> dict:
    """Load a checkpoint into a state dict {'params', 'batch_stats'}.

    Dispatches on CONTENT, not suffix: torch files (zip archives) go through
    the name-mapping shims — DTOID or zephyr-PointNet2 chosen by key names —
    and conversion errors (e.g. a missing/renamed layer) propagate instead of
    being masked as pickle errors (ADVICE r1: load_checkpoint swallowed them).

    align_feats: when the target is a zephyr scorer with the
    alignment-fraction head inputs, torch reference ckpts get fc1's 9 new
    input columns zero-padded (torch_import.py) so scores reproduce exactly.
    """
    if _is_torch_file(path):
        return _load_torch(path, align_feats=align_feats)
    with open(path, "rb") as f:
        try:
            payload = pickle.load(f)
        except pickle.UnpicklingError:
            # torch legacy non-zip format
            return _load_torch(path, align_feats=align_feats)
    if "state" in payload:
        return payload["state"]
    if "params" in payload:
        return payload
    # --save_each snapshots: {iteration, model_state_dict, conf}
    msd = payload.get("model_state_dict")
    if isinstance(msd, dict) and "params" in msd:
        return msd
    raise ValueError(f"unrecognized checkpoint format: {path}")


def _load_torch(path: str, align_feats: bool = False) -> dict:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state_dict = ckpt.get("state_dict", ckpt.get("model_state_dict", ckpt))
    state_dict = {k: np.asarray(v) for k, v in state_dict.items() if hasattr(v, "numpy") or isinstance(v, np.ndarray)}

    if any(k.split("model.", 1)[-1].startswith(("SA_modules.", "FC_layer.", "fc_layer."))
           for k in state_dict):
        from ossid_code_tpu.models.zephyr.torch_import import convert_pointnet2_state_dict

        return convert_pointnet2_state_dict(state_dict, align_feats=align_feats)
    from ossid_code_tpu.models.dtoid.torch_import import convert_dtoid_state_dict

    return convert_dtoid_state_dict(state_dict)
