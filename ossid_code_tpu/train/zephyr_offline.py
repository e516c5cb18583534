"""Offline training of the Zephyr hypothesis scorer.

The reference consumes pretrained zephyr checkpoints (ref
scripts/online_learning.py:212-227) whose training lives in the external
zephyr repo. This driver closes that gap TPU-natively: for each training
frame, generate pose hypotheses (PPF/fake) plus GT-anchored positives, label
each hypothesis by its ADD(-S) error against GT (< 0.1 * diameter =>
positive, the criterion the paper scores with), assemble score features on
device, and train PointNet2SSG with sigmoid BCE — one jitted step per batch
of hypotheses.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ossid_code_tpu.eval.pose_metrics import add_err, adi_err, object_diameter
from ossid_code_tpu.models.zephyr.features import assemble_score_features
from ossid_code_tpu.models.zephyr.module import _blur5
from ossid_code_tpu.utils.geometry import perturb_trans


def perturb_pose(mat: np.ndarray, n: int, sig_rot: float, sig_t: float, rng) -> np.ndarray:
    """SE(3) perturbations with configurable magnitudes (perturb_trans with
    the reference's fixed sigmas is too coarse for sub-0.1d positives)."""
    from scipy.spatial.transform import Rotation

    axes = rng.normal(size=(n, 3))
    axes /= np.linalg.norm(axes, axis=1, keepdims=True)
    rots = Rotation.from_rotvec(axes * rng.normal(0, sig_rot, n)[:, None]).as_matrix()
    out = np.repeat(mat[None].copy(), n, axis=0)
    out[:, :3, :3] = np.einsum("ijk,ikl->ijl", rots, out[:, :3, :3])
    out[:, :3, 3] += rng.normal(0, sig_t, (n, 3))
    return out


class ZephyrOfflineTrainer:
    def __init__(self, zephyr_model, bop_dataset, model_clouds: dict,
                 hypo_gens: dict | None = None, n_hypos: int = 64, seed: int = 0):
        self.model = zephyr_model
        self.bop = bop_dataset
        self.model_clouds = model_clouds
        self.hypo_gens = hypo_gens or {}
        self.n_hypos = n_hypos
        self.rng = np.random.default_rng(seed)
        self.diameters = {o: object_diameter(c[0]) for o, c in model_clouds.items()}
        for oid, (pts, cols, nrms) in model_clouds.items():
            self.model.prepare_object(oid, pts, cols, nrms)

        @jax.jit
        def _assemble(img, depth, cam_K, pd, cd, nd, poses):
            # identical preprocessing to the inference program (module._score
            # blurs the frame in-graph, ref utils/zephyr_utils.py:13): training
            # on raw pixels while scoring blurred ones shifts every HSV-diff
            # feature, which is fatal on textured objects
            point_x, _, _ = assemble_score_features(
                _blur5(img), depth, cam_K, pd, cd, nd, poses)
            return point_x

        self._assemble = _assemble

    def make_training_batch(self, target: dict):
        """One frame -> (point_x (M, N, D), labels (M,), valid (M,))."""
        oid = target["obj_id"]
        data = self.bop.getDataByIds(oid, target["scene_id"], target["im_id"])
        cam_K = np.asarray(data["scene_camera"]["cam_K"], np.float32)
        gt = np.asarray(data["mat_gt"], np.float32)

        # hypotheses: mostly REAL generator output (the test-time distribution
        # the scorer must rank — surface-aligned wrong poses are the hard
        # negatives, ICP-refined near-correct ones the true positives), topped
        # up with a few GT perturbations so every frame has positives and a
        # graded error range. A half-synthetic-positive mix lets BCE fit
        # "tight perturbation vs junk" shortcuts that do not transfer to
        # ranking PPF sets (measured: 0.15 pick rate at a 0.74 ceiling).
        n = self.n_hypos
        diam = self.diameters[oid]
        n_near = max(4, n // 8)
        near_t = perturb_pose(gt, n_near // 2, sig_rot=0.05, sig_t=0.02 * diam, rng=self.rng)
        near_m = perturb_pose(gt, n_near - n_near // 2, sig_rot=0.2, sig_t=0.08 * diam,
                              rng=self.rng)
        near = np.concatenate([near_t, near_m])
        near[0] = gt
        if oid in self.hypo_gens:
            mask = np.asarray(data["mask_gt_visib"]) > 0
            from ossid_code_tpu.utils.geometry import depth2cloud

            cloud = depth2cloud(data["depth"], mask & (data["depth"] > 0), cam_K)
            far, _, _ = self.hypo_gens[oid].find_surface_model(cloud)
            far = far[: n - len(near)]
            if len(far) < n - len(near):
                far = np.concatenate(
                    [far, perturb_trans(gt, n - len(near) - len(far), rng=self.rng)]
                )
        else:
            far = perturb_trans(gt, n - len(near), rng=self.rng)
            far[:, :3, 3] += self.rng.normal(0, 0.05, (len(far), 3))
        poses = np.concatenate([near, far]).astype(np.float32)

        pts, cols, nrms = self.model_clouds[oid]
        is_sym = oid in self.bop.sym_obj_ids
        err_fn = adi_err if is_sym else add_err
        errs = np.asarray(
            [err_fn(p[:3, :3], p[:3, 3], gt[:3, :3], gt[:3, 3], pts) for p in poses]
        )
        labels = (errs < 0.1 * self.diameters[oid]).astype(np.float32)

        pd, cd, nd, *_ = self.model._objects[oid]
        point_x = self._assemble(
            jnp.asarray(data["img"].astype(np.float32) / 255.0),
            jnp.asarray(data["depth"], jnp.float32), jnp.asarray(cam_K),
            pd, cd, nd, jnp.asarray(poses),
        )
        return np.asarray(point_x), labels, np.ones(len(poses), bool)

    def train_epoch(self, max_frames: int | None = None, seed: int = 0) -> float:
        losses = []
        targets = list(self.bop.targets)
        self.rng.shuffle(targets)
        for i, t in enumerate(targets[:max_frames]):
            point_x, labels, valid = self.make_training_batch(t)
            losses.append(self.model.train_step(point_x, labels, valid, seed=seed * 10000 + i))
        return float(np.mean(losses)) if losses else float("nan")

    def eval_top1(self, max_frames: int | None = None) -> float:
        """Fraction of frames where the scorer's argmax hypothesis is correct."""
        correct = []
        for t in list(self.bop.targets)[:max_frames]:
            oid = t["obj_id"]
            data = self.bop.getDataByIds(oid, t["scene_id"], t["im_id"])
            gt = np.asarray(data["mat_gt"], np.float32)
            diam = self.diameters[oid]
            near = perturb_pose(gt, self.n_hypos // 2, sig_rot=0.05,
                                sig_t=0.02 * diam, rng=self.rng)
            far = perturb_trans(gt, self.n_hypos - len(near), rng=self.rng)
            far[:, :3, 3] += self.rng.normal(0, 0.05, (len(far), 3))
            poses = np.concatenate([near, far]).astype(np.float32)
            pts, cols, nrms = self.model_clouds[oid]
            out = self.model.score_hypotheses(
                {
                    "img": data["img"], "depth": data["depth"],
                    "cam_K": np.asarray(data["scene_camera"]["cam_K"]),
                    "model_points": pts, "model_colors": cols, "model_normals": nrms,
                    "pose_hypos": poses,
                },
                obj_id=oid,
            )
            err = add_err(
                out["pred_pose"][:3, :3], out["pred_pose"][:3, 3],
                gt[:3, :3], gt[:3, 3], pts,
            )
            correct.append(err < 0.1 * self.diameters[oid])
        return float(np.mean(correct)) if correct else 0.0
