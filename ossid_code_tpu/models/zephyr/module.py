"""ZephyrModel: host wrapper for pose-hypothesis scoring.

Counterpart of the reference's zephyr glue (`networkInference`, ref
utils/zephyr_utils.py:10-47): one jitted program takes the frame (img, depth,
K), the object's prepared model cloud, and a padded batch of pose hypotheses,
assembles per-point features on device and scores every hypothesis with
PointNet2SSG. Hypothesis counts vary per frame, so poses are padded to a fixed
bucket size (pow-2 ceiling) and masked — each bucket size compiles once.

TPU-first data-path design:
  * per-object state (model cloud, colors, normals, PointNet++ grouping
    indices) is prepared ONCE and lives on device — grouping is rigid-
    invariant, so FPS/ball-query never run in the per-frame path;
  * the frame ships as uint8 RGB + uint16 depth (the host<->device link, not
    compute, is the bottleneck on remote-attached chips); the reference's
    GaussianBlur preprocessing (ref utils/zephyr_utils.py:13) runs in-graph;
  * only the scores (+argmax) come back per frame; the per-point uv map needed
    by ICP is fetched lazily.

Hypotheses whose free-space-violation ratio exceeds `inconst_ratio_th` get
score -inf, reproducing the reference's pre-network hypothesis dropping
(ScoreDataset `inconst_ratio_th`, ref scripts/online_learning.py:174-195) with
fixed shapes instead of data-dependent filtering.
"""

from __future__ import annotations

import os

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


def _fps_np(pts: np.ndarray, n: int) -> np.ndarray:
    if n >= len(pts):
        return np.arange(len(pts))
    idxs = np.zeros(n, np.int32)
    d = np.full(len(pts), np.inf)
    last = 0
    for i in range(1, n):
        d = np.minimum(d, ((pts - pts[last]) ** 2).sum(1))
        last = int(d.argmax())
        idxs[i] = last
    return idxs


def _ball_np(centers: np.ndarray, pts: np.ndarray, r: float, k: int) -> np.ndarray:
    d2 = ((centers[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    idx = np.zeros((len(centers), k), np.int32)
    for i in range(len(centers)):
        inside = np.nonzero(d2[i] <= r * r)[0]
        if len(inside) == 0:
            continue
        sel = inside[:k]
        idx[i, : len(sel)] = sel
        idx[i, len(sel) :] = sel[0]
    return idx


# cv2 GaussianBlur((5,5), 0) kernel == [1, 4, 6, 4, 1] / 16
_BLUR_K = np.asarray([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0  # numpy: no backend init at import


def _blur5(img: jnp.ndarray) -> jnp.ndarray:
    """Separable 5x5 Gaussian blur, reflecting cv2's default border replicate-ish
    behavior closely enough for feature sampling (edges only)."""
    pad = [(2, 2), (0, 0), (0, 0)]
    x = jnp.pad(img, pad, mode="edge")
    x = sum(_BLUR_K[i] * x[i : i + img.shape[0]] for i in range(5))
    x = jnp.pad(x, [(0, 0), (2, 2), (0, 0)], mode="edge")
    x = sum(_BLUR_K[i] * x[:, i : i + img.shape[1]] for i in range(5))
    return x


class ZephyrModel:
    def __init__(self, num_points: int = 512, inconst_ratio_th: float = 100.0, seed: int = 0,
                 need_uv: bool = True, refine_top: int = 0,
                 refine_max_dist: float = 0.01, refine_iters: int = 16,
                 rank_weight: float = 1.0, align_feats: bool = False):
        self.num_points = num_points
        self.inconst_ratio_th = inconst_ratio_th
        # feed the 12-cell alignment-fraction grid to the classifier head (see
        # pointnet2.alignment_fractions); newly trained scorers should enable
        # this — default False keeps reference-checkpoint shape compatibility
        # for parity paths
        self.align_feats = bool(align_feats)
        # weight of the listwise ranking term in train_step (0 = pure BCE)
        self.rank_weight = float(rank_weight)
        self.need_uv = need_uv  # uv map only needed for the ICP path (YCB-V)
        # in-graph dense refinement of the first refine_top hypotheses (PPF
        # orders by vote score) BEFORE scoring — the device-side equivalent of
        # Halcon DensePoseRefinement (ref online_learning.py:442-447), riding
        # the scoring program's uploads instead of 5-10 ms/hypo host ICP
        self.refine_top = int(refine_top)
        self.refine_max_dist = float(refine_max_dist)
        self.refine_iters = int(refine_iters)
        # blended hypothesis ranking: argmax of z-scored net score plus
        # rank_blend times a z-scored geometric alignment statistic (the
        # fraction of valid projected model points within 10 mm of the
        # observed depth AND 0.05 circular hue distance). Measured on the hard
        # hermetic world (scripts/ab_rank_blend.py, oracle masks, 72 targets):
        # net-only picks 0.583 ADD<0.1d, the statistic alone 0.62-0.69, blends
        # 0.67-0.68 at a 0.764 ceiling. The reported pred_score stays the NET
        # score of the pick (the pseudo-label gate's calibration). 0 disables.
        # Host-side _pick config only (no jitted program depends on it), so it
        # lives here, not in _build_jits — callers may overwrite it after
        # construction and a jit rebuild must not reset it.
        self.rank_blend = float(os.environ.get("OSSID_RANK_BLEND", "0"))
        self.net = PointNet2SSG(num_class=1, dim_point=DIM_POINT,
                                align_feats=self.align_feats)
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
        self._objects: dict = {}
        self._build_jits()

    def _build_jits(self):
        net = self.net
        th = self.inconst_ratio_th

        need_uv = self.need_uv
        # opt-in bf16 for the PointNet2 scorer MLPs (feature assembly — the
        # geometry — stays f32): env OSSID_BF16_SCORER=1
        import os as _os

        bf16 = _os.environ.get("OSSID_BF16_SCORER") == "1"
        # opt-in fused inference forward (BN folded into the matmuls; on TPU
        # the SA MLP+max chains run in one VMEM-resident pallas kernel each —
        # see ops/sa_fused.py). OSSID_FUSED_PALLAS=0 keeps the fused math but
        # lowers it through plain XLA (also the automatic non-TPU fallback).
        # (the opt-in fused kernel predates align_feats and omits the head
        # concat — measured negative anyway, see RESULTS.md)
        fused = _os.environ.get("OSSID_FUSED_SCORER") == "1" and not self.align_feats
        # single-gather packed bilinear taps in the feature assembly
        # (bit-identical math). Default ON: measured on the real v5e chip the
        # whole score program gains 1.23-1.41x (M=512 f32 74.7->60.7 ms, bf16
        # 51.9->37.4 ms; scripts/ab_scorer.py). OSSID_PACKED_SAMPLE=0 reverts
        # to the four-tap gather path.
        packed_sample = _os.environ.get("OSSID_PACKED_SAMPLE", "1") == "1"
        fused_pallas = (
            _os.environ.get("OSSID_FUSED_PALLAS", "1") == "1"
            and jax.default_backend() not in ("cpu", "gpu")
        )

        refine_top = self.refine_top
        refine_max_dist = self.refine_max_dist
        refine_iters = self.refine_iters

        @jax.jit
        def score(params, batch_stats, img_u8, depth_u16, depth_origin, cam_K,
                  model_points, model_colors, model_normals,
                  sa1c, sa1g, sa2c, sa2g, ricp_pts, ricp_nrms, poses, valid):
            img = _blur5(img_u8.astype(jnp.float32) / 255.0)
            depth = depth_u16.astype(jnp.float32) / 1000.0
            refined = None
            if refine_top > 0:
                from ossid_code_tpu.ops.icp_device import (
                    batched_icp, sample_valid_points,
                )

                # point-to-POINT: robust when the visible surface is nearly
                # planar (single-face views, tabletops), where the plane
                # variant's 6x6 solve is rank-deficient and drifts; extra
                # iterations are nearly free on device
                K = min(refine_top, poses.shape[0])
                scene_pts, scene_ok = sample_valid_points(
                    depth, cam_K, origin=depth_origin, k=4096
                )
                refined = batched_icp(
                    poses[:K], ricp_pts, scene_pts, scene_ok,
                    max_dist=refine_max_dist, iters=refine_iters,
                    model_normals=ricp_nrms,
                )
                refined = jnp.where(valid[:K, None, None], refined, poses[:K])
                poses = jnp.concatenate([refined, poses[K:]], axis=0)
            point_x, uv, inconst = assemble_score_features(
                img, depth, cam_K, model_points, model_colors, model_normals, poses,
                return_uv=need_uv, depth_origin=depth_origin,
                packed_sample=packed_sample,
            )
            if uv is None:
                uv = jnp.zeros((poses.shape[0], 1, 2), jnp.float32)
            # geometric alignment statistic per hypothesis (see rank_blend):
            # computed on the f32 features before any bf16 cast
            okp = point_x[..., 10]
            aligned = okp * (jnp.abs(point_x[..., 6]) < 0.01) * (point_x[..., 3] < 0.05)
            align_stat = aligned.sum(-1) / jnp.maximum(okp.sum(-1), 1.0)
            static_idx = {"sa1": (sa1c, sa1g), "sa2": (sa2c, sa2g)}
            # in bf16 mode params/batch_stats arrive already cast (stored-cast
            # in score_hypotheses_async); only the activations cast in-graph
            variables = {"params": params, "batch_stats": batch_stats}
            if bf16:
                point_x = point_x.astype(jnp.bfloat16)
            if fused:
                from ossid_code_tpu.ops.sa_fused import pointnet2_fused_apply

                raw = pointnet2_fused_apply(
                    params, batch_stats, point_x, static_idx,
                    use_pallas=fused_pallas,
                ).astype(jnp.float32)
            else:
                raw = net.apply(
                    variables, point_x, train=False, static_idx=static_idx,
                ).astype(jnp.float32)
            ok = valid & (inconst < th)
            scores = jnp.where(ok, raw, -jnp.inf)
            raw_masked = jnp.where(valid, raw, -jnp.inf)
            return scores, raw_masked, uv, inconst, align_stat, refined

        rank_weight = self.rank_weight

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
                # class-balanced BCE: hypothesis sets are dominated by
                # negatives (a PPF set has ~1 good pose in dozens), and an
                # unbalanced mean drives even correct picks to logits < 0 —
                # under the loop's absolute confidence gate
                # (zephyr_confident_threshold) nothing would ever pseudo-label
                pos = (labels > 0.5) & valid
                neg = (labels <= 0.5) & valid
                wpos = jnp.where(pos, losses, 0.0).sum() / jnp.clip(pos.sum(), 1)
                wneg = jnp.where(neg, losses, 0.0).sum() / jnp.clip(neg.sum(), 1)
                loss = 0.5 * (wpos + wneg)
                if rank_weight > 0.0:
                    # listwise ranking over THIS frame's hypothesis set: the
                    # online loop consumes argmax(score), and BCE alone lets
                    # the net fit per-hypothesis calibration shortcuts without
                    # ever learning the comparative judgment (measured on the
                    # hard hermetic world: hand-crafted feature stats picked a
                    # correct pose 0.67 of frames vs 0.15 for the BCE-trained
                    # net at an 0.74 ceiling). Softmax CE with the positive
                    # hypotheses as targets directly optimizes the ordering.
                    neg_inf = jnp.asarray(-1e9, logits.dtype)
                    masked = jnp.where(valid, logits, neg_inf)
                    logz = jax.scipy.special.logsumexp(masked)
                    npos = pos.sum()
                    # uniform target over the positives, shifted by its
                    # log(npos) floor so the converged loss reads ~0. Measured
                    # against multi-positive InfoNCE (-log total positive
                    # mass) on the hard world: pushing EVERY positive up
                    # ranks better (pick 0.583 vs 0.542 at 16 epochs), so the
                    # uniform target stays
                    tgt = pos.astype(logits.dtype) / jnp.clip(npos, 1)
                    rank = -(tgt * (masked - logz)).sum() - jnp.log(
                        jnp.clip(npos.astype(logits.dtype), 1.0))
                    has_both = (npos > 0) & (npos < valid.sum())
                    loss = loss + rank_weight * jnp.where(has_both, rank, 0.0)
                return loss, mutated["batch_stats"]

            (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, new_opt = self.tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), new_stats, new_opt, loss

        self._score = score
        self._train_step = train_step
        self._bf16_score = bf16
        if bf16:
            self._cast_tree = jax.jit(
                lambda t: jax.tree_util.tree_map(
                    lambda a: a.astype(jnp.bfloat16)
                    if jnp.issubdtype(a.dtype, jnp.floating) else a, t))
        self._score_vars_cache = None  # (src_params, src_stats, cast_params, cast_stats)

    def _score_vars(self):
        """Scoring-dtype weights: identity in f32 mode; bf16 mode re-casts only
        after the weights object changes (training / checkpoint load). The
        cache holds the source trees, so identity comparison is safe (no
        recycled-id aliasing)."""
        if not self._bf16_score:
            return self.params, self.batch_stats
        c = self._score_vars_cache
        if c is None or c[0] is not self.params or c[1] is not self.batch_stats:
            self._score_vars_cache = c = (
                self.params, self.batch_stats,
                self._cast_tree(self.params), self._cast_tree(self.batch_stats))
        return c[2], c[3]

    # -------------------------------------------------------- object prep
    def prepare_object(self, obj_id, points, colors, normals):
        """Resample the model cloud to num_points, precompute rigid-invariant
        PointNet++ grouping indices, and pin everything on device."""
        if obj_id in self._objects:
            return self._objects[obj_id]
        points = np.asarray(points, np.float32)
        colors = np.asarray(colors, np.float32)
        normals = np.asarray(normals, np.float32)
        n = len(points)
        if n >= self.num_points:
            idx = np.linspace(0, n - 1, self.num_points).round().astype(int)
        else:
            idx = np.resize(np.arange(n), self.num_points)
        pts, cols, nrms = points[idx], colors[idx], normals[idx]

        centered = pts - pts.mean(0, keepdims=True)
        sa1_n = min(512, self.num_points)
        sa2_n = min(128, sa1_n)
        sa1c = (np.arange(sa1_n, dtype=np.int32) if sa1_n == self.num_points
                else _fps_np(centered, sa1_n))
        c1 = centered[sa1c]
        sa1g = _ball_np(c1, centered, 0.2, min(64, self.num_points))
        sa2c = _fps_np(c1, sa2_n)
        sa2g = _ball_np(c1[sa2c], c1, 0.4, 64)

        # refinement cloud: denser than the scoring cloud (ICP accuracy scales
        # with correspondence count; scoring uses num_points which may be small)
        n_ref = min(384, n)
        ridx = np.linspace(0, n - 1, n_ref).round().astype(int)
        prep = tuple(
            jax.device_put(jnp.asarray(a))
            for a in (pts, cols, nrms, sa1c.astype(np.int32), sa1g.astype(np.int32),
                      sa2c.astype(np.int32), sa2g.astype(np.int32),
                      points[ridx], normals[ridx])
        )
        self._objects[obj_id] = prep
        return prep

    # ----------------------------------------------------------------- API
    def score_hypotheses_async(self, data: dict, obj_id=None) -> dict:
        """Dispatch the scoring program and start streaming the (small) score
        outputs back to the host without blocking. Returns an opaque handle for
        `fetch_scores`. Splitting dispatch from fetch lets the online loop hide
        the per-fetch RPC latency of a remote-attached chip behind the next
        frame's host work (the fetch is the stage's dominant cost there)."""
        poses = np.asarray(data["pose_hypos"], np.float32)
        m = len(poses)
        mb = _bucket(m)
        poses_p = np.concatenate([poses, np.tile(np.eye(4, dtype=np.float32), (mb - m, 1, 1))])
        valid = np.zeros((mb,), bool)
        valid[:m] = True

        if obj_id is not None:
            key = obj_id
        else:
            # content hash, not id(): python ids are recycled, which could
            # silently hit a stale cache entry for a different object
            import hashlib

            key = hashlib.sha1(
                np.ascontiguousarray(data["model_points"]).tobytes()
            ).hexdigest()
        pts, cols, nrms, sa1c, sa1g, sa2c, sa2g, ricp_pts, ricp_nrms = self.prepare_object(
            key, data["model_points"], data["model_colors"], data["model_normals"]
        )

        img = data["img"]
        if not (hasattr(img, "dtype") and img.dtype == np.uint8):
            img = (np.clip(np.asarray(img), 0, 1) * 255).astype(np.uint8)
        depth = data["depth"]  # full frame or an (S, S) crop + 'depth_origin'
        if not (hasattr(depth, "dtype") and depth.dtype == np.uint16):
            depth = (np.asarray(depth, np.float64) * 1000.0).round().clip(0, 65535).astype(np.uint16)
        origin = np.asarray(data.get("depth_origin", (0, 0)), np.int32)

        sparams, sstats = self._score_vars()
        scores, raw_scores, uv, inconst, align_stat, refined = self._score(
            sparams, sstats,
            jnp.asarray(img), jnp.asarray(depth), jnp.asarray(origin),
            jnp.asarray(np.asarray(data["cam_K"], np.float32)),
            pts, cols, nrms, sa1c, sa1g, sa2c, sa2g, ricp_pts, ricp_nrms,
            jnp.asarray(poses_p), jnp.asarray(valid),
        )
        small = (scores, raw_scores, inconst, align_stat) + (
            () if refined is None else (refined,))
        for a in small:
            if hasattr(a, "copy_to_host_async"):
                a.copy_to_host_async()
        return {"dev": (scores, raw_scores, inconst, align_stat), "uv_dev": uv,
                "poses": poses, "m": m, "refined_dev": refined}

    def _pick(self, scores_np: np.ndarray, stat_np: np.ndarray) -> int:
        """Winning hypothesis index: argmax of the net score, or — with
        rank_blend — of z-scored net score + rank_blend * z-scored alignment
        statistic over the non-pruned entries (scripts/ab_rank_blend.py)."""
        lam = self.rank_blend
        finite = np.isfinite(scores_np)
        if not lam or finite.sum() < 2:
            return np.argmax(scores_np)
        s = scores_np[finite]
        sz = (s - s.mean()) / max(float(s.std()), 1e-6)
        t = stat_np[finite]
        tz = (t - t.mean()) / max(float(t.std()), 1e-6)
        return np.flatnonzero(finite)[np.argmax(sz + lam * tz)]

    def fetch_scores(self, handle: dict, fetched=None, refined_fetched=None) -> dict:
        """Block on the score outputs of `score_hypotheses_async` and build the
        result dict ('scores', 'inconst_ratio', 'pred_idx/score/pose', device
        'uv_dev' for the lazy ICP path). `fetched`/`refined_fetched` let the
        caller batch these arrays into one jax.device_get with other pending
        outputs (each device_get call is a ~30 ms RPC on a remote-attached
        chip)."""
        poses, m = handle["poses"], handle["m"]
        # single host fetch of the small outputs; uv stays on device
        scores_np, raw_np, inconst_np, stat_np = (
            fetched if fetched is not None else jax.device_get(handle["dev"]))
        scores_np = np.asarray(scores_np)[:m]
        raw_np = np.asarray(raw_np)
        inconst_np = np.asarray(inconst_np)[:m]
        stat_np = np.asarray(stat_np)[:m]
        if m and not np.isfinite(scores_np).any():
            # every hypothesis was pruned by the free-space check; fall back to
            # raw network scores so the loop always gets a pose (the reference
            # would have no hypotheses left to score here)
            scores_np = raw_np[:m]
        idx = int(self._pick(scores_np, stat_np)) if m else -1
        pred_pose = poses[idx] if m else np.eye(4)
        if m and handle.get("refined_dev") is not None and idx >= 0:
            refined_np = np.asarray(
                refined_fetched if refined_fetched is not None
                else jax.device_get(handle["refined_dev"]))
            if idx < len(refined_np):
                # scored (and therefore reported) pose is the device-refined one
                pred_pose = refined_np[idx]
        return {
            "scores": scores_np,
            "align_stat": stat_np,
            "inconst_ratio": inconst_np,
            "uv_dev": handle["uv_dev"],
            "pred_idx": idx,
            "pred_score": float(scores_np[idx]) if m else -np.inf,
            "pred_pose": pred_pose,
        }

    def score_hypotheses(self, data: dict, obj_id=None, fetch_uv: bool = False) -> dict:
        """data: img (H,W,3) uint8 or float [0,1]; depth (H,W) float meters or
        uint16 mm; cam_K (3,3); model_points/colors/normals (N,3);
        pose_hypos (M,4,4). Returns numpy 'scores' (M,), 'inconst_ratio',
        'pred_idx', 'pred_score', 'pred_pose', and device 'uv_dev' (fetch with
        fetch_uv=True for the ICP path)."""
        out = self.fetch_scores(self.score_hypotheses_async(data, obj_id=obj_id))
        if fetch_uv:
            out["uv"] = np.asarray(jax.device_get(out["uv_dev"]))[: len(data["pose_hypos"])]
        return out

    def fetch_uv(self, out: dict, index: int) -> np.ndarray:
        """Fetch the projected uv of one hypothesis (for ICP cropping)."""
        return np.asarray(jax.device_get(out["uv_dev"][index]))

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
