"""ZephyrModel: host wrapper for pose-hypothesis scoring.

Counterpart of the reference's zephyr glue (`networkInference`, ref
utils/zephyr_utils.py:10-47): one jitted program takes the frame (img, depth,
K), the object's sampled model cloud, and a padded batch of pose hypotheses,
assembles per-point features on device and scores every hypothesis with
PointNet2SSG. Hypothesis counts vary per frame, so poses are padded to a fixed
bucket size (pow-2 ceiling) and masked — each bucket size compiles once.

Hypotheses whose free-space-violation ratio exceeds `inconst_ratio_th` get
score -inf, reproducing the reference's pre-network hypothesis dropping
(ScoreDataset `inconst_ratio_th`, ref scripts/online_learning.py:174-195) with
fixed shapes instead of data-dependent filtering.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ossid_code_tpu.models.zephyr.features import assemble_score_features, DIM_POINT
from ossid_code_tpu.models.zephyr.pointnet2 import PointNet2SSG


def _bucket(m: int, minimum: int = 64) -> int:
    b = minimum
    while b < m:
        b *= 2
    return b


class ZephyrModel:
    def __init__(self, num_points: int = 512, inconst_ratio_th: float = 100.0, seed: int = 0):
        self.num_points = num_points
        self.inconst_ratio_th = inconst_ratio_th
        self.net = PointNet2SSG(num_class=1, dim_point=DIM_POINT)
        rng = jax.random.PRNGKey(seed)
        # jit the init: eager init dispatches each op individually, which is
        # pathological over the remote-TPU tunnel (~1ms+ per dispatch)
        variables = jax.jit(lambda r, x: self.net.init(r, x, train=False))(
            rng, jnp.zeros((2, num_points, DIM_POINT))
        )
        self.params = variables["params"]
        self.batch_stats = variables["batch_stats"]
        self.tx = optax.adam(1e-3)
        self.opt_state = self.tx.init(self.params)
        self._build_jits()

    def _build_jits(self):
        net = self.net
        th = self.inconst_ratio_th

        @jax.jit
        def score(params, batch_stats, img, depth, cam_K, model_points, model_colors,
                  model_normals, poses, valid):
            point_x, uv, inconst = assemble_score_features(
                img, depth, cam_K, model_points, model_colors, model_normals, poses
            )
            raw = net.apply(
                {"params": params, "batch_stats": batch_stats}, point_x, train=False
            )
            ok = valid & (inconst < th)
            scores = jnp.where(ok, raw, -jnp.inf)
            raw_masked = jnp.where(valid, raw, -jnp.inf)
            return scores, raw_masked, uv, inconst

        @jax.jit
        def train_step(params, batch_stats, opt_state, point_x, labels, valid, dropout_rng):
            def loss_fn(p):
                logits, mutated = net.apply(
                    {"params": p, "batch_stats": batch_stats},
                    point_x,
                    train=True,
                    mutable=["batch_stats"],
                    rngs={"dropout": dropout_rng},
                )
                losses = optax.sigmoid_binary_cross_entropy(logits, labels)
                loss = jnp.where(valid, losses, 0.0).sum() / jnp.clip(valid.sum(), 1)
                return loss, mutated["batch_stats"]

            (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, new_opt = self.tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), new_stats, new_opt, loss

        self._score = score
        self._train_step = train_step

    # ----------------------------------------------------------------- API
    def score_hypotheses(self, data: dict) -> dict:
        """data: img (H,W,3) [0,1] float; depth (H,W); cam_K (3,3);
        model_points/colors/normals (N,3) (N will be sub/re-sampled to
        num_points); pose_hypos (M,4,4). Returns dict with numpy 'scores' (M,),
        'uv' (M,N,2), 'inconst_ratio' (M,), 'pred_idx', 'pred_score', 'pred_pose'.
        """
        poses = np.asarray(data["pose_hypos"], np.float32)
        m = len(poses)
        mb = _bucket(m)
        poses_p = np.concatenate([poses, np.tile(np.eye(4, dtype=np.float32), (mb - m, 1, 1))])
        valid = np.zeros((mb,), bool)
        valid[:m] = True

        pts, cols, nrms = self._resample_model(
            data["model_points"], data["model_colors"], data["model_normals"]
        )
        scores, raw_scores, uv, inconst = self._score(
            self.params, self.batch_stats,
            jnp.asarray(data["img"], jnp.float32),
            jnp.asarray(data["depth"], jnp.float32),
            jnp.asarray(data["cam_K"], jnp.float32),
            pts, cols, nrms,
            jnp.asarray(poses_p), jnp.asarray(valid),
        )
        scores = np.asarray(scores)[:m]
        uv = np.asarray(uv)[:m]
        inconst = np.asarray(inconst)[:m]
        if m and not np.isfinite(scores).any():
            # every hypothesis was pruned by the free-space check; fall back to
            # raw network scores so the loop always gets a pose (the reference
            # would have no hypotheses left to score here)
            scores = np.asarray(raw_scores)[:m]
        idx = int(np.argmax(scores)) if m else -1
        return {
            "scores": scores,
            "uv": uv,
            "inconst_ratio": inconst,
            "pred_idx": idx,
            "pred_score": float(scores[idx]) if m else -np.inf,
            "pred_pose": poses[idx] if m else np.eye(4),
        }

    def _resample_model(self, points, colors, normals):
        """Deterministically subsample/pad the model cloud to num_points."""
        points = np.asarray(points, np.float32)
        colors = np.asarray(colors, np.float32)
        normals = np.asarray(normals, np.float32)
        n = len(points)
        if n >= self.num_points:
            idx = np.linspace(0, n - 1, self.num_points).round().astype(int)
        else:
            idx = np.resize(np.arange(n), self.num_points)
        return jnp.asarray(points[idx]), jnp.asarray(colors[idx]), jnp.asarray(normals[idx])

    def train_step(self, point_x, labels, valid, seed: int = 0) -> float:
        rng = jax.random.PRNGKey(seed)
        self.params, self.batch_stats, self.opt_state, loss = self._train_step(
            self.params, self.batch_stats, self.opt_state,
            jnp.asarray(point_x), jnp.asarray(labels), jnp.asarray(valid), rng,
        )
        return float(loss)

    def state_dict(self):
        return {
            "params": jax.device_get(self.params),
            "batch_stats": jax.device_get(self.batch_stats),
        }

    def load_state_dict(self, sd):
        self.params = jax.device_put(sd["params"])
        self.batch_stats = jax.device_put(sd["batch_stats"])
