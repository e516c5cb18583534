"""BOP19 results CSV writer/reader — format-identical to the reference
(ref utils/bop_utils.py:10-75) so the unchanged bop_toolkit `eval_bop19.py`
consumes it directly. Launching the external eval script is optional and gated
on the toolkit being installed (the reference shells out unconditionally,
ref bop_utils.py:53)."""

from __future__ import annotations

import csv
import os
import subprocess

import numpy as np

from ossid_code_tpu.core.config import BOP_TOOLKIT_PATH


def save_results_bop(
    results,
    output_folder,
    result_name,
    dataset_name,
    split_name="test",
    pose_key="pose",
    score_key="score",
    time_key="time",
    run_eval_script=False,
):
    """results: list of dicts with scene_id/im_id/obj_id + a 4x4 pose in
    meters (converted to mm in the CSV, ref bop_utils.py:32-46). Returns the
    CSV path."""
    os.makedirs(output_folder, exist_ok=True)
    result_name = result_name.replace("_", "-")
    output_filename = f"{result_name}_{dataset_name}-{split_name}.csv"
    output_path = os.path.join(output_folder, output_filename)

    with open(output_path, "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=["scene_id", "im_id", "obj_id", "score", "R", "t", "time"])
        writer.writeheader()
        for r in results:
            mat = np.asarray(r[pose_key], np.float64).copy()
            mat[:3, 3] = mat[:3, 3] * 1000.0
            writer.writerow(
                {
                    "scene_id": r["scene_id"],
                    "im_id": r["im_id"],
                    "obj_id": r["obj_id"],
                    "score": r.get(score_key, 1),
                    "R": " ".join(str(x) for x in mat[:3, :3].flatten()),
                    "t": " ".join(str(x) for x in mat[:3, 3].flatten()),
                    "time": r.get(time_key, -1),
                }
            )

    if run_eval_script:
        script = os.path.join(BOP_TOOLKIT_PATH, "scripts", "eval_bop19.py")
        if os.path.exists(script):
            subprocess.Popen(
                ["python", "scripts/eval_bop19.py", "--renderer_type=cpp",
                 f"--result_filenames={output_filename}"],
                cwd=BOP_TOOLKIT_PATH,
            )
        else:
            print(f"bop_toolkit not found at {BOP_TOOLKIT_PATH}; skipping external eval")
    return output_path


def read_results_bop(path):
    results = []
    with open(path) as f:
        for row in csv.DictReader(f):
            pose = np.eye(4)
            pose[:3, :3] = np.asarray([float(x) for x in row["R"].split()]).reshape(3, 3)
            pose[:3, 3] = np.asarray([float(x) for x in row["t"].split()])
            results.append(
                {
                    "obj_id": int(row["obj_id"]),
                    "scene_id": int(row["scene_id"]),
                    "im_id": int(row["im_id"]),
                    "score": float(row["score"]),
                    "time": float(row["time"]),
                    "pose": pose,
                }
            )
    return results
