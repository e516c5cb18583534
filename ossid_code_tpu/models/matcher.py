"""Attentional SIFT-correspondence matcher — the model family trained by the
reference's `dataset=ycbv_sift` config (SuperGlue-style).

The reference carries the dataset (ref datasets/ycbv_sift_dataset.py builds GT
correspondence matrices with dustbin rows/cols at :209-211,265) and a
`conf/model/superglue.yaml`, but the model itself predates the repo and is
missing from getModel (ref models/__init__.py:3-15). This module supplies a
working TPU-native matcher: MLP keypoint encoders (descriptor + position),
alternating self/cross attention, and differentiable optimal transport with a
learned dustbin score (Sinkhorn in log space — a fixed-iteration, fixed-shape
program that jits cleanly). Loss is the negative log-likelihood of the GT
assignment matrix; the monitored metric is match recall
(utils/metrics.py match_recall semantics, ref utils/metrics.py:4-67).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
import optax
import flax.linen as nn


def log_optimal_transport(scores, alpha, iters: int):
    """Sinkhorn in log space over the dustbin-augmented score matrix.

    scores (B, M, N); alpha scalar dustbin score. Returns log assignment
    (B, M+1, N+1) whose exp has row sums ~1 (plus dustbin mass)."""
    b, m, n = scores.shape
    bins0 = jnp.full((b, m, 1), alpha)
    bins1 = jnp.full((b, 1, n), alpha)
    corner = jnp.full((b, 1, 1), alpha)
    couplings = jnp.concatenate(
        [jnp.concatenate([scores, bins0], -1), jnp.concatenate([bins1, corner], -1)], 1
    )
    norm = -jnp.log(float(m + n))
    log_mu = jnp.concatenate([jnp.full((m,), norm), jnp.array([np.log(n) + norm])])
    log_nu = jnp.concatenate([jnp.full((n,), norm), jnp.array([np.log(m) + norm])])

    def body(_, uv):
        u, v = uv
        u = log_mu[None] - jax.nn.logsumexp(couplings + v[:, None, :], axis=2)
        v = log_nu[None] - jax.nn.logsumexp(couplings + u[:, :, None], axis=1)
        return u, v

    u, v = jax.lax.fori_loop(
        0, iters, body, (jnp.zeros((b, m + 1)), jnp.zeros((b, n + 1)))
    )
    return couplings + u[:, :, None] + v[:, None, :] - norm


class _Attention(nn.Module):
    dim: int
    heads: int = 4

    @nn.compact
    def __call__(self, x, source):
        """x (B, M, D) attends to source (B, N, D)."""
        h, d = self.heads, self.dim // self.heads
        q = nn.Dense(self.dim, name="q")(x).reshape(x.shape[0], -1, h, d)
        k = nn.Dense(self.dim, name="k")(source).reshape(x.shape[0], -1, h, d)
        v = nn.Dense(self.dim, name="v")(source).reshape(x.shape[0], -1, h, d)
        att = jax.nn.softmax(jnp.einsum("bmhd,bnhd->bhmn", q, k) / np.sqrt(d), axis=-1)
        out = jnp.einsum("bhmn,bnhd->bmhd", att, v).reshape(x.shape[0], -1, self.dim)
        msg = nn.Dense(self.dim, name="merge")(out)
        y = nn.Dense(self.dim * 2, name="mlp1")(jnp.concatenate([x, msg], -1))
        y = nn.Dense(self.dim, name="mlp2")(nn.relu(y))
        return x + y


class MatcherNetwork(nn.Module):
    dim: int = 128
    n_layers: int = 2  # each layer = self + cross attention on both sides
    sinkhorn_iters: int = 30

    @nn.compact
    def __call__(self, obs_desc, obs_pos, model_desc, model_pos):
        def encode(desc, pos, tag):
            d = nn.Dense(self.dim, name=f"{tag}_desc")(desc / 512.0)
            p = nn.Dense(self.dim, name=f"{tag}_pos2")(
                nn.relu(nn.Dense(64, name=f"{tag}_pos1")(pos))
            )
            return d + p

        fo = encode(obs_desc, obs_pos, "obs")
        fm = encode(model_desc, model_pos, "model")
        for i in range(self.n_layers):
            fo = _Attention(self.dim, name=f"self_obs{i}")(fo, fo)
            fm = _Attention(self.dim, name=f"self_model{i}")(fm, fm)
            fo2 = _Attention(self.dim, name=f"cross_obs{i}")(fo, fm)
            fm2 = _Attention(self.dim, name=f"cross_model{i}")(fm, fo)
            fo, fm = fo2, fm2
        fo = nn.Dense(self.dim, name="final_obs")(fo)
        fm = nn.Dense(self.dim, name="final_model")(fm)
        scores = jnp.einsum("bmd,bnd->bmn", fo, fm) / np.sqrt(self.dim)
        alpha = self.param("dustbin", nn.initializers.ones, ())
        return log_optimal_transport(scores, alpha, self.sinkhorn_iters)


class SiftMatcher:
    """Host wrapper: jitted train/eval + state_dict (generic-trainer API)."""

    train_feed_keys = ("obs_desc", "obs_uv", "model_desc", "model_pts", "matches")

    def __init__(self, cfg, seed: int = 0):
        self.cfg = cfg
        d = cfg.dataset
        self.n_obs = int(d.get("n_kpts_obs") or d.get("n_kpts", 128))
        self.n_model = int(d.get("n_kpts_model") or d.get("n_kpts", 128))
        self.net = MatcherNetwork(
            dim=int(cfg.model.get("dim", 128)),
            n_layers=int(cfg.model.get("n_layers", 2)),
            sinkhorn_iters=int(cfg.model.get("sinkhorn_iters", 30)),
        )
        rng = jax.random.PRNGKey(seed)
        variables = jax.jit(self.net.init)(
            rng, jnp.zeros((1, self.n_obs, 128)), jnp.zeros((1, self.n_obs, 2)),
            jnp.zeros((1, self.n_model, 128)), jnp.zeros((1, self.n_model, 3)),
        )
        self.params = variables["params"]
        self.tx = optax.chain(
            optax.add_decayed_weights(cfg.model.get("weight_decay", 1e-6)),
            optax.amsgrad(cfg.model.get("learning_rate", 1e-4)),
        )
        self.opt_state = self.tx.init(self.params)
        self._build_jits()

    def _apply(self, params, batch):
        # normalize pixel coords to ~[-1, 1]; model points are meters already
        pos_o = batch["obs_uv"] / 320.0 - 1.0
        return self.net.apply({"params": params}, batch["obs_desc"], pos_o,
                              batch["model_desc"], batch["model_pts"])

    def _build_jits(self):
        tx = self.tx

        @jax.jit
        def train_step(params, opt_state, batch):
            def loss_fn(p):
                Z = self._apply(p, batch)  # (B, M+1, N+1) log assignment
                M = batch["matches"]
                return -(M * Z).sum() / jnp.clip(M.sum(), 1.0, None)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, new_opt = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), new_opt, {"loss": loss}

        self._train_step_jit = train_step
        self._eval_forward = jax.jit(lambda p, b: self._apply(p, b))

    def _feed(self, batch):
        return {k: jnp.asarray(np.asarray(batch[k], np.float32))
                for k in self.train_feed_keys}

    def train_step(self, batch: dict) -> dict:
        self.params, self.opt_state, metrics = self._train_step_jit(
            self.params, self.opt_state, self._feed(batch)
        )
        return {k: float(v) for k, v in metrics.items()}

    def eval_metric(self, batch: dict) -> list[float]:
        """Per-sample match recall: fraction of GT (non-dustbin) matches whose
        row-argmax of the predicted assignment is the GT column."""
        Z = np.asarray(self._eval_forward(self.params, self._feed(batch)))
        M = np.asarray(batch["matches"])
        out = []
        for z, m in zip(Z, M):
            gt_r, gt_c = np.nonzero(m[:-1, :-1])
            if len(gt_r) == 0:
                out.append(1.0)
                continue
            pred_c = z[:-1, :].argmax(axis=1)
            out.append(float(np.mean(pred_c[gt_r] == gt_c)))
        return out

    def reset_optimizer(self):
        self.opt_state = self.tx.init(self.params)

    def state_dict(self):
        return {"params": jax.device_get(self.params)}

    def load_state_dict(self, sd):
        self.params = jax.device_put(sd["params"])
