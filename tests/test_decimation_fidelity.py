"""Quantified decimated-mask fidelity (VERDICT r2 next-step 9): `--fast` mode
permanently decimates renderer meshes to 12,000 faces via vertex clustering
(render/rasterizer.py); the pseudo-label masks rendered from the decimated
mesh must stay within a measured IoU of the full-mesh ones on a DENSE mesh —
otherwise finetuning silently learns from eroded labels."""

import os

import numpy as np
import pytest
from scipy.spatial.transform import Rotation


def _dense_mesh():
    """>=100k-face version of a hard-world object."""
    from ossid_code_tpu.render.mesh import make_wedge_mesh, subdivide_mesh

    m = make_wedge_mesh(90, 60, 45, taper=0.55, shear=0.3)
    while len(m.faces) < 100_000:
        m = subdivide_mesh(m, 1)
    return m


def test_decimated_pseudo_label_masks_iou(tmp_path):
    from ossid_code_tpu.render.mesh import save_ply
    from ossid_code_tpu.render.rasterizer import Renderer

    mesh = _dense_mesh()
    assert len(mesh.faces) >= 100_000
    path = str(tmp_path / "obj_000001.ply")
    save_ply(path, mesh)

    K = np.array([[572.0, 0, 160], [0, 572.0, 120], [0, 0, 1.0]])
    meta = {"camera_fx": K[0, 0], "camera_fy": K[1, 1],
            "camera_cx": K[0, 2], "camera_cy": K[1, 2]}

    r_full = Renderer(meta, img_h=240, img_w=320)
    r_full.addObject(1, path, mm2m=True, simplify=False)
    r_fast = Renderer(meta, img_h=240, img_w=320)
    r_fast.addObject(1, path, mm2m=True, simplify=True)
    assert len(r_fast.meshes[1].faces) <= 13000  # decimation actually happened

    rng = np.random.default_rng(0)
    ious, depth_errs = [], []
    for i in range(6):
        pose = np.eye(4)
        pose[:3, :3] = Rotation.random(random_state=i).as_matrix()
        pose[:3, 3] = [rng.uniform(-0.02, 0.02), rng.uniform(-0.02, 0.02), 0.45]
        for r in (r_full, r_fast):
            r.obj_nodes[1].matrix = pose
        _, d_full = r_full.render(depth_only=True)
        _, d_fast = r_fast.render(depth_only=True)
        m_full, m_fast = d_full > 0, d_fast > 0
        inter = np.logical_and(m_full, m_fast).sum()
        union = np.logical_or(m_full, m_fast).sum()
        assert union > 500
        ious.append(inter / union)
        both = np.logical_and(m_full, m_fast)
        depth_errs.append(float(np.abs(d_full[both] - d_fast[both]).mean()))

    # pseudo-label fidelity: decimated masks track full-mesh masks closely,
    # and surface depth (feeds estimate_visib_mask_gt at 15 mm tolerance)
    # moves far less than the visibility tolerance
    assert min(ious) >= 0.95, ious
    assert max(depth_errs) < 0.005, depth_errs
