"""SIFT-based pose hypothesis generation (host-side; OpenCV SIFT).

Replaces the reference's zephyr SIFT pipeline (SURVEY.md Z11/N6:
`FeatureModel.construct/match` + `featurizeScene`, call sites ref
scripts/online_learning.py:53-76,283-285,423-437): each object's template grid
views are SIFT-featurized once with their keypoints lifted to 3D object-frame
points; at test time, SIFT keypoints in the masked scene region are lifted to
3D via depth and matched to the model descriptors; RANSAC over 3-point rigid
(Kabsch) alignments yields ranked pose hypotheses.
"""

from __future__ import annotations

import time

import numpy as np
import cv2
from scipy.spatial import cKDTree

from ossid_code_tpu.utils.geometry import depth2xyz, estimate_rigid_body_transform


def featurize_scene(img_u8: np.ndarray, depth: np.ndarray, mask: np.ndarray, cam_K: np.ndarray,
                    max_kpts: int = 500):
    """SIFT keypoints + descriptors in the masked region, lifted to 3D.

    Returns (kpts_uv (N, 2), descs (N, 128), points3d (N, 3) camera frame)."""
    gray = cv2.cvtColor(img_u8, cv2.COLOR_RGB2GRAY)
    sift = cv2.SIFT_create(nfeatures=max_kpts)
    m8 = (np.asarray(mask) > 0).astype(np.uint8) * 255
    kpts, descs = sift.detectAndCompute(gray, m8)
    if not kpts:
        raise ValueError("no SIFT features in the masked region")
    uv = np.asarray([k.pt for k in kpts])  # (u, v)
    iu = np.clip(uv[:, 0].round().astype(int), 0, depth.shape[1] - 1)
    iv = np.clip(uv[:, 1].round().astype(int), 0, depth.shape[0] - 1)
    z = depth[iv, iu]
    ok = z > 1e-6
    if not ok.any():
        raise ValueError("no SIFT features with valid depth")
    uv, descs, iu, iv, z = uv[ok], descs[ok], iu[ok], iv[ok], z[ok]
    x = (iu - cam_K[0, 2]) * z / cam_K[0, 0]
    y = (iv - cam_K[1, 2]) * z / cam_K[1, 1]
    pts3d = np.stack([x, y, z], 1)
    return uv, descs.astype(np.float32), pts3d


class SiftFeatureModel:
    """Per-object 3D SIFT feature bank built from a template grid."""

    def __init__(self, max_kpts_per_view: int = 200):
        self.max_kpts_per_view = max_kpts_per_view
        self.descs: np.ndarray | None = None
        self.points_obj: np.ndarray | None = None
        self._tree: cKDTree | None = None

    def construct_from_templates(self, template_dataset, obj_id: int,
                                 view_dist: float | None = None):
        """Featurize every grid view; template xyz maps are camera-frame, so
        object-frame points are R^T (x - t) with the grid view pose (R, t).
        Poses come from the grid's vid2pose.pkl when present, else from
        vid2rot + `view_dist`."""
        poses = template_dataset.get_view_poses(obj_id)
        if poses is None:
            if view_dist is None:
                raise ValueError("grid has no view poses; pass view_dist")
        sift = cv2.SIFT_create(nfeatures=self.max_kpts_per_view)
        all_desc, all_pts = [], []
        for vi, vid in enumerate(template_dataset.view_ids):
            img, xyz, mask = template_dataset.getTemplate(obj_id, vid)
            gray = cv2.cvtColor((img * 255).astype(np.uint8), cv2.COLOR_RGB2GRAY)
            m8 = (mask[..., 0] > 0).astype(np.uint8) * 255
            kpts, descs = sift.detectAndCompute(gray, m8)
            if not kpts:
                continue
            if poses is not None:
                R = poses[vi][:3, :3]
                t = poses[vi][:3, 3]
            else:
                R = template_dataset.grid_rots[vi]
                t = np.array([0.0, 0.0, view_dist])
            for k, d in zip(kpts, descs):
                u, v = int(round(k.pt[0])), int(round(k.pt[1]))
                u = np.clip(u, 0, xyz.shape[1] - 1)
                v = np.clip(v, 0, xyz.shape[0] - 1)
                p_cam = xyz[v, u]
                if p_cam[2] <= 1e-6:
                    continue
                all_desc.append(d)
                all_pts.append(R.T @ (p_cam - t))
        if not all_desc:
            raise ValueError(f"no SIFT features on templates of obj {obj_id}")
        self.descs = np.stack(all_desc).astype(np.float32)
        self.points_obj = np.stack(all_pts)
        self._tree = cKDTree(self.descs)
        return self

    def match(self, img_u8, depth, mask, cam_K, n_hypos: int = 20,
              ransac_iters: int = 200, inlier_th: float = 0.01, seed: int = 0):
        """Scene -> ranked pose hypotheses (M, 4, 4), camera frame, meters."""
        rng = np.random.default_rng(seed)
        uv, descs, scene3d = featurize_scene(img_u8, depth, mask, cam_K)
        dist, idx = self._tree.query(descs, k=1)
        # keep the best correspondences by descriptor distance
        order = np.argsort(dist)
        keep = order[: max(20, len(order) // 2)]
        src = self.points_obj[idx[keep]]  # object frame
        dst = scene3d[keep]               # camera frame

        if len(src) < 3:
            raise ValueError("too few SIFT correspondences")

        hypos, scores = [], []
        n = len(src)
        for _ in range(ransac_iters):
            sel = rng.choice(n, 3, replace=False)
            try:
                R, t = estimate_rigid_body_transform(src[sel].T, dst[sel].T)
            except np.linalg.LinAlgError:
                continue
            pred = src @ R.T + t[:, 0]
            inliers = np.linalg.norm(pred - dst, axis=1) < inlier_th
            ninl = int(inliers.sum())
            if ninl >= 3:
                # refine on inliers
                R2, t2 = estimate_rigid_body_transform(src[inliers].T, dst[inliers].T)
                pose = np.eye(4)
                pose[:3, :3] = R2
                pose[:3, 3] = t2[:, 0]
                hypos.append(pose)
                scores.append(ninl)
        if not hypos:
            raise ValueError("SIFT RANSAC found no consistent pose")
        order = np.argsort(scores)[::-1]
        hypos = np.stack(hypos)[order[:n_hypos]]
        return hypos


class SiftHypoGen:
    """Loop-facing adapter with the reference's `match(img, depth, mask, meta)`
    shape (ref scripts/online_learning.py:427-437)."""

    def __init__(self, feature_model: SiftFeatureModel, cam_K: np.ndarray, n_hypos: int = 20):
        self.fm = feature_model
        self.cam_K = cam_K
        self.n_hypos = n_hypos

    def match(self, img, depth, mask, scene_meta=None):
        img_u8 = img if img.dtype == np.uint8 else (np.clip(img, 0, 1) * 255).astype(np.uint8)
        K = self.cam_K
        if scene_meta is not None and "camera_fx" in scene_meta:
            K = np.array(
                [[scene_meta["camera_fx"], 0, scene_meta["camera_cx"]],
                 [0, scene_meta["camera_fy"], scene_meta["camera_cy"]],
                 [0, 0, 1.0]]
            )
        return self.fm.match(img_u8, depth, np.asarray(mask), K, n_hypos=self.n_hypos)
