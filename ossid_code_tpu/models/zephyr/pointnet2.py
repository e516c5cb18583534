"""PointNet++ (SSG) hypothesis-scoring network (flax linen).

TPU-native replacement for `zephyr.models.pointnet2.PointNet2SSG`
(SURVEY.md Z2/N3, call site ref scripts/online_learning.py:212-227,461-464):
the classic single-scale-grouping classifier of Qi et al. 2017, with the CUDA
furthest-point-sampling / ball-query / grouping kernels replaced by dense
fixed-shape XLA ops (ops/pointcloud.py) that ride the MXU.

Input is a batch of hypotheses: point_x (M, N, D) where the first 3 channels
are centered camera-frame xyz and the rest are appearance/consistency features
(see features.py). Output: one score per hypothesis (num_class=1).

Layer plan (erikwijmans/pointnet2 SSG-cls defaults, which zephyr builds on):
  SA1: 512 centers, r=0.2, k=64, MLP (64, 64, 128)
  SA2: 128 centers, r=0.4, k=64, MLP (128, 128, 256)
  SA3: global,               MLP (256, 512, 1024)
  FC:  512 -> 256 -> num_class, dropout 0.5

Kernel note (measured, round 2): a fused-SetAbstraction pallas kernel was
evaluated and REJECTED. The only TPU-viable in-kernel gather is a one-hot
matmul; benchmarked in pure XLA with the same static indices it is ~2x
slower than XLA's native gather lowering (17.1 vs 9.4 ms at M=128, 67.5 vs
33.8 ms at M=512 on v5e, bf16) because the one-hot contraction triples the
FLOPs. XLA's gather+conv chain is ~35% MXU-utilized at f32 and ~2x faster
in bf16 (cast weights once — see ZephyrModel._score_vars), so the XLA path
stays. Do not revisit without a pallas arbitrary-row-gather primitive.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn

from ossid_code_tpu.ops.pointcloud import farthest_point_sample, ball_query, gather_points


class SetAbstraction(nn.Module):
    npoint: int
    radius: float
    nsample: int
    mlp: Sequence[int]

    @nn.compact
    def __call__(self, xyz, feats, train: bool = False, static_idx=None):
        """xyz (B, N, 3); feats (B, N, C) or None -> (new_xyz (B, S, 3),
        new_feats (B, S, mlp[-1])).

        static_idx: optional (center_idx (S,), group_idx (S, k)) precomputed on
        the model cloud. FPS and ball query depend only on inter-point
        distances, which are invariant under the rigid per-hypothesis
        transform — so for hypothesis scoring the indices are computed ONCE per
        object instead of per call (kills the sequential FPS loop on TPU)."""
        if static_idx is not None:
            center_idx, group_idx = static_idx
            new_xyz = xyz[:, center_idx]
            grouped_xyz = xyz[:, group_idx] - new_xyz[:, :, None, :]
            grouped_feats = feats[:, group_idx] if feats is not None else None
        else:
            idx = farthest_point_sample(xyz, self.npoint)  # (B, S)
            new_xyz = gather_points(xyz, idx)
            group_idx = ball_query(new_xyz, xyz, self.radius, self.nsample)  # (B, S, k)
            grouped_xyz = gather_points(xyz, group_idx) - new_xyz[:, :, None, :]
            grouped_feats = gather_points(feats, group_idx) if feats is not None else None
        if grouped_feats is not None:
            grouped = jnp.concatenate([grouped_xyz, grouped_feats], axis=-1)
        else:
            grouped = grouped_xyz
        x = grouped  # (B, S, k, C)
        for i, ch in enumerate(self.mlp):
            # use_bias=False: BN follows immediately, and the torch layout this
            # imports from (erikwijmans SharedMLP with bn=True, which zephyr's
            # PointNet2SSG builds on) has no conv bias either
            x = nn.Conv(ch, (1, 1), use_bias=False, name=f"mlp{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9, name=f"bn{i}")(x)
            x = nn.relu(x)
        return new_xyz, jnp.max(x, axis=2)


class GlobalAbstraction(nn.Module):
    mlp: Sequence[int]

    @nn.compact
    def __call__(self, xyz, feats, train: bool = False):
        x = jnp.concatenate([xyz, feats], axis=-1)[:, :, None, :]  # (B, N, 1, C)
        for i, ch in enumerate(self.mlp):
            x = nn.Conv(ch, (1, 1), use_bias=False, name=f"mlp{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9, name=f"bn{i}")(x)
            x = nn.relu(x)
        return jnp.max(x[:, :, 0, :], axis=1)  # (B, mlp[-1])


# alignment-fraction tolerance grid (depth meters x circular hue): spans the
# cells that ranked best in the r3 hand-statistic sweep (ab_rank_blend.py)
ALIGN_TAU_D = (0.005, 0.01, 0.015, 0.02)
ALIGN_TAU_H = (0.05, 0.12, 0.5)


def alignment_fractions(point_x: jnp.ndarray) -> jnp.ndarray:
    """Per-hypothesis fraction of valid projected points that are depth-aligned
    AND hue-consistent, over a 4x3 tolerance grid -> (M, 12) in [0, 1].

    This is the hand-crafted ranking statistic that outperformed the r3
    BCE+rank-trained net (pick 0.667 vs 0.583 at a 0.764 PPF ceiling,
    RESULTS.md): a MEAN over points, which PointNet's max-pooling pathways
    cannot represent — so it is computed explicitly from the point features
    and fed to the classifier head as a global feature (VERDICT r3 next-step
    2: make the learned scorer at least match the hand statistic)."""
    dh = point_x[..., 3].astype(jnp.float32)
    dd = jnp.abs(point_x[..., 6]).astype(jnp.float32)
    ok = point_x[..., 10].astype(jnp.float32)
    nval = jnp.maximum(ok.sum(-1), 1.0)
    stats = [
        (ok * (dd < td) * (dh < th)).sum(-1) / nval
        for td in ALIGN_TAU_D
        for th in ALIGN_TAU_H
    ]
    return jnp.stack(stats, axis=-1)


class PointNet2SSG(nn.Module):
    num_class: int = 1
    dim_point: int = 11  # total channels incl. the 3 xyz
    # residual alignment head: logit += Dense(12->num_class)(alignment
    # fractions), zero-initialized and excluded from SGD (stop_gradient):
    # the backbone trains exactly as without it, and the head is then set by
    # ZephyrOfflineTrainer.calibrate_align_head — a deterministic post-hoc
    # fit of (cell, weight, bias) on real-PPF training sets. Measured (r4,
    # hard world, 72 eval targets, 0.764 ceiling): SGD-trained variants of
    # the same feature LOSE (fc1-concat 0.528, constant-prior head 0.514,
    # both below the 0.583 plain net — the BCE+rank objective on 24-frame
    # epochs does not preserve the statistic's ranking), while the
    # calibrated head inherits the statistic/blend level directly.
    # Set-independent (raw fractions, no cross-hypothesis normalization).
    # Reference torch checkpoints import with a ZERO head injected
    # (torch_import.py) and reproduce their scores exactly.
    align_feats: bool = False

    @nn.compact
    def __call__(self, point_x, train: bool = False, static_idx=None):
        """point_x (M, N, dim_point) -> scores (M,) if num_class == 1 else (M, C).

        static_idx: optional {'sa1': (cidx, gidx), 'sa2': (cidx, gidx)} of
        precomputed grouping indices (see SetAbstraction)."""
        xyz = point_x[..., :3]
        feats = point_x[..., 3:] if self.dim_point > 3 else None

        n = point_x.shape[1]
        sa1_n = min(512, n)
        sa2_n = min(128, sa1_n)

        s1 = static_idx.get("sa1") if static_idx else None
        s2 = static_idx.get("sa2") if static_idx else None
        xyz, feats = SetAbstraction(sa1_n, 0.2, min(64, n), (64, 64, 128), name="sa1")(
            xyz, feats, train, static_idx=s1)
        xyz, feats = SetAbstraction(sa2_n, 0.4, 64, (128, 128, 256), name="sa2")(
            xyz, feats, train, static_idx=s2)
        x = GlobalAbstraction((256, 512, 1024), name="sa3")(xyz, feats, train)

        # fc1/fc2 bias-free (BN follows), matching the torch FC(bn=True) layout
        x = nn.relu(nn.BatchNorm(use_running_average=not train, momentum=0.9, name="bn_fc1")(nn.Dense(512, use_bias=False, name="fc1")(x)))
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = nn.relu(nn.BatchNorm(use_running_average=not train, momentum=0.9, name="bn_fc2")(nn.Dense(256, use_bias=False, name="fc2")(x)))
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = nn.Dense(self.num_class, name="fc3")(x)
        if self.align_feats:
            import jax

            head = nn.Dense(
                self.num_class, use_bias=True, name="align_head",
                kernel_init=nn.initializers.zeros,
            )(alignment_fractions(point_x).astype(x.dtype))
            # calibrated, not SGD-trained: gradients never flow into the head
            x = x + jax.lax.stop_gradient(head)
        if self.num_class == 1:
            return x[..., 0]
        return x
