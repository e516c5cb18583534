"""Metric logging + log scraping.

Replaces the reference's W&B/TensorBoard stack (SURVEY.md §5.5: WandbLogger at
ref train.py:75-80, self.log streams, TB scrapers at utils/tb.py, result-pkl
loaders at utils/results.py and utils/ttt.py) with a dependency-free JSONL
metric stream plus pandas readers with the same roles.
"""

from __future__ import annotations

import json
import os
import pickle
import time

import numpy as np
import pandas as pd


class MetricLogger:
    """Append-only JSONL metric stream: one {'step', 'time', **scalars} per
    line. With tb_dir set, scalars are ALSO written as TensorBoard event
    files (torch.utils.tensorboard), so the reference's TB-based workflows —
    `tensorboard --logdir` and event-file scraping (ref utils/tb.py:8-53,
    tflog2pandas) — work against this framework's training runs unchanged."""

    def __init__(self, path: str, tb_dir: str | None = None):
        self.path = path
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self._f = open(path, "a")
        self._tb = None
        if tb_dir is not None:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir=tb_dir)
            except Exception as e:  # noqa: BLE001 — TB is optional observability
                print(f"MetricLogger: tensorboard writer unavailable ({e!r}); "
                      f"jsonl only")

    def log(self, step: int, **scalars):
        row = {"step": int(step), "time": time.time()}
        for k, v in scalars.items():
            row[k] = float(v) if np.isscalar(v) or hasattr(v, "item") else v
        self._f.write(json.dumps(row) + "\n")
        self._f.flush()
        if self._tb is not None:
            for k, v in row.items():
                if k not in ("step", "time") and isinstance(v, float):
                    self._tb.add_scalar(k, v, int(step))
            self._tb.flush()

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()


def tflog2pandas(path: str) -> pd.DataFrame:
    """TensorBoard event file/dir -> long-form DataFrame with columns
    {metric, value, step} — same shape as the reference's tflog2pandas
    (ref utils/tb.py:8-53), so its downstream analysis notebooks port as-is."""
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )

    acc = EventAccumulator(path, size_guidance={"scalars": 0})
    acc.Reload()
    rows = {"metric": [], "value": [], "step": []}
    for tag in acc.Tags().get("scalars", []):
        for ev in acc.Scalars(tag):
            rows["metric"].append(tag)
            rows["value"].append(float(ev.value))
            rows["step"].append(int(ev.step))
    return pd.DataFrame(rows)


def read_log(path: str) -> pd.DataFrame:
    """JSONL metric stream -> DataFrame (role of ref utils/tb.py:8-53)."""
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    return pd.DataFrame(rows)


def load_result(path: str) -> pd.DataFrame:
    """Online-loop result pickle -> per-frame DataFrame
    (role of ref utils/results.py:12 and utils/ttt.py:5)."""
    with open(path, "rb") as f:
        payload = pickle.load(f)
    rows = payload["test_results"] if isinstance(payload, dict) else payload
    scalar_rows = []
    for r in rows:
        scalar_rows.append(
            {k: v for k, v in r.items() if np.isscalar(v) or isinstance(v, (bool, int, float, str))}
        )
    return pd.DataFrame(scalar_rows)


def summarize_result(path: str) -> dict:
    """Headline numbers the reference prints at the end of a run
    (ref scripts/online_learning.py:610-613)."""
    df = load_result(path)
    out = {}
    if "dtoid_iou" in df:
        out["dtoid_mean_iou"] = float(df["dtoid_iou"].mean())
        out["dtoid_valid_iou_recall"] = float((df["dtoid_iou"] > 0.5).mean())
    if "pred_iou_visib" in df:
        out["zephyr_valid_iou_recall"] = float((df["pred_iou_visib"] > 0.5).mean())
    if "pred_add01d" in df:
        out["add01d"] = float(df["pred_add01d"].mean())
    for k in ("time_dtoid", "time_ppf", "time_zephyr", "time_finetune"):
        if k in df:
            out[f"mean_{k}"] = float(df[k].dropna().mean())
    return out
