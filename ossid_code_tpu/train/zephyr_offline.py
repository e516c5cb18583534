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

    def _collect_real_sets(self, targets):
        """Real-PPF hypothesis sets with oracle visible masks: per frame,
        (raw scores sans align head, 12-cell alignment fractions, ADD errors,
        diameter). Shared by align-head calibration and eval_top1."""
        import jax.numpy as jnp

        from ossid_code_tpu.models.zephyr.pointnet2 import alignment_fractions
        from ossid_code_tpu.utils.geometry import depth2cloud

        params = self.model.state_dict()["params"]
        head = params.get("align_head")
        rows = []
        for t in targets:
            oid = t["obj_id"]
            if oid not in self.hypo_gens:
                continue
            data = self.bop.getDataByIds(oid, t["scene_id"], t["im_id"])
            gt = np.asarray(data["mat_gt"], np.float32)
            cam_K = np.asarray(data["scene_camera"]["cam_K"], np.float64)
            depth = np.asarray(data["depth"], np.float32)
            mask = np.asarray(data["mask_gt_visib"]) > 0
            cloud = depth2cloud(depth, mask & (depth > 0), cam_K)
            if len(cloud) < 50:
                continue
            poses, _, _ = self.hypo_gens[oid].find_surface_model(cloud)
            if not len(poses):
                rows.append(None)
                continue
            poses = poses.astype(np.float32)
            pts, cols, nrms = self.model_clouds[oid]
            out = self.model.score_hypotheses(
                {"img": data["img"], "depth": depth, "cam_K": cam_K,
                 "model_points": pts, "model_colors": cols,
                 "model_normals": nrms, "pose_hypos": poses},
                obj_id=oid,
            )
            pd, cd, nd, *_ = self.model._objects[oid]
            point_x = self._assemble(
                jnp.asarray(data["img"].astype(np.float32) / 255.0),
                jnp.asarray(depth, jnp.float32),
                jnp.asarray(cam_K.astype(np.float32)), pd, cd, nd,
                jnp.asarray(poses))
            stats9 = np.asarray(alignment_fractions(point_x))
            scores = np.asarray(out["scores"], np.float64)
            if head is not None:
                # strip the current head's contribution -> raw backbone scores
                scores = scores - (stats9 @ np.asarray(head["kernel"])[:, 0]
                                   + float(np.asarray(head["bias"])[0]))
            is_sym = oid in self.bop.sym_obj_ids
            err_fn = adi_err if is_sym else add_err
            errs = np.asarray([
                err_fn(p[:3, :3], p[:3, 3], gt[:3, :3], gt[:3, 3], pts)
                for p in poses
            ])
            rows.append({"scores": scores, "stats9": stats9, "errs": errs,
                         "th": 0.1 * self.diameters[oid]})
        return rows

    def calibrate_align_head(self, max_frames: int | None = None,
                             weights=(0.0, 1.0, 2.0, 4.0, 8.0, 16.0, 32.0)):
        """Fit the scorer's residual alignment head (pointnet2.PointNet2SSG
        align_feats) on REAL PPF hypothesis sets: grid-search the (tolerance
        cell, weight) maximizing the training pick rate of
        argmax(raw_score + w * stat_cell), z-scoring neither (set-independent
        scores). The bias centers the head so a hypothesis at the training
        positives' mean alignment keeps its raw score — the absolute
        confidence-gate scale is preserved. Deterministic; SGD never touches
        the head (stop_gradient), so training dynamics match the plain
        recipe exactly. Returns {'cell', 'weight', 'pick'}."""
        if not getattr(self.model, "align_feats", False):
            raise ValueError("scorer was built without align_feats")
        rows = [r for r in self._collect_real_sets(
            list(self.bop.targets)[:max_frames]) if r]
        if not rows:
            return None
        n_cells = rows[0]["stats9"].shape[1]
        best = (0, 0.0, -1.0)
        for cell in range(n_cells):
            for w in weights:
                picks = []
                for r in rows:
                    i = int(np.argmax(r["scores"] + w * r["stats9"][:, cell]))
                    picks.append(r["errs"][i] < r["th"])
                pick = float(np.mean(picks))
                # prefer smaller weights at equal pick (less gate disruption)
                if pick > best[2] + 1e-9:
                    best = (cell, w, pick)
        cell, w, pick = best
        # bias: keep the mean CORRECT hypothesis at its raw score
        pos_stats = np.concatenate([
            r["stats9"][r["errs"] < r["th"], cell] for r in rows
        ]) if any((r["errs"] < r["th"]).any() for r in rows) else np.zeros(1)
        mu = float(pos_stats.mean()) if len(pos_stats) else 0.0

        sd = self.model.state_dict()
        head = sd["params"]["align_head"]
        kernel = np.zeros_like(np.asarray(head["kernel"]))
        kernel[cell, 0] = w
        bias = np.zeros_like(np.asarray(head["bias"]))
        bias[0] = -w * mu
        sd["params"]["align_head"] = {"kernel": kernel, "bias": bias}
        self.model.load_state_dict(sd)
        return {"cell": int(cell), "weight": float(w), "pick": pick,
                "bias": float(bias[0])}

    def eval_top1(self, max_frames: int | None = None,
                  return_ceiling: bool = False):
        """Fraction of frames where the scorer's argmax hypothesis is
        ADD-correct, evaluated on REAL generator (PPF) hypothesis sets with
        oracle visible masks — the distribution the online loop actually ranks.

        Round 3 proved synthetic GT-perturbation sets are misleading here
        (BCE-on-synthetic read healthy at a 0.15 real pick rate, RESULTS.md;
        VERDICT r3 weak #6), so frames without a hypothesis generator are
        SKIPPED rather than padded with perturbations. Frames whose set
        contains no correct hypothesis still count (the pick cannot be right),
        mirroring the `ab_rank_blend.py` harness; `return_ceiling=True` also
        returns the fraction of frames where a correct hypothesis existed."""
        rows = self._collect_real_sets(list(self.bop.targets)[:max_frames])
        params = self.model.state_dict()["params"]
        head = params.get("align_head")
        correct, winnable = [], []
        for r in rows:
            if r is None:  # generator found nothing: the pick cannot be right
                correct.append(False)
                winnable.append(False)
                continue
            s = r["scores"]
            if head is not None:
                s = s + (r["stats9"] @ np.asarray(head["kernel"])[:, 0]
                         + float(np.asarray(head["bias"])[0]))
            i = int(np.argmax(s))
            correct.append(bool(r["errs"][i] < r["th"]))
            winnable.append(bool(r["errs"].min() < r["th"]))
        pick = float(np.mean(correct)) if correct else 0.0
        if return_ceiling:
            return pick, (float(np.mean(winnable)) if winnable else 0.0)
        return pick
