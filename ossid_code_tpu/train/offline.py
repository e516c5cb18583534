"""Offline DTOID (pre)training with a data-parallel device mesh.

Counterpart of the reference's Lightning trainer (ref train.py:15-117, DDP at
:93-102): params/optimizer state replicated, batches sharded over the 'dp'
mesh axis, gradients reduced by XLA via the global-batch-mean loss. One jitted
step; checkpointing via core/checkpoint; MultiStep LR schedule matching the
reference (milestones [20, 40] epochs, gamma 0.1,
ref models/dtoid/__init__.py:258).
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from ossid_code_tpu.models.dtoid.losses import dtoid_losses
from ossid_code_tpu.parallel.mesh import make_mesh
from ossid_code_tpu.core.checkpoint import save_checkpoint


def make_multistep_schedule(base_lr: float, steps_per_epoch: int,
                            milestones=(20, 40), gamma: float = 0.1):
    boundaries = {int(m * steps_per_epoch): gamma for m in milestones}
    return optax.piecewise_constant_schedule(base_lr, boundaries)


def make_sharded_train_step(net, anchors, tx, mesh, cfg_model):
    """Build the jitted data-parallel train step for a DtoidNetwork."""
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("dp"))

    def step(params, batch_stats, opt_state, batch):
        def loss_fn(p):
            out, mutated = net.apply(
                {"params": p, "batch_stats": batch_stats},
                batch["img"], batch["limg"], batch["lmask"],
                batch["gimg"], batch["gmask"],
                train=True,
                mutable=["batch_stats"],
            )
            loss, metrics = dtoid_losses(
                out, batch, anchors,
                lam_seg=cfg_model.lam_seg, lam_center=cfg_model.lam_center,
                lam_cls=cfg_model.lam_cls, lam_reg=cfg_model.lam_reg,
            )
            return loss, (metrics, mutated["batch_stats"])

        grads, (metrics, new_stats) = jax.grad(loss_fn, has_aux=True)(params)
        updates, new_opt_state = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_stats, new_opt_state, metrics

    return jax.jit(
        step,
        in_shardings=(repl, repl, repl, data),
        out_shardings=(repl, repl, repl, repl),
    )


class GenericTrainer:
    """Epoch trainer for the non-DTOID model families (MaskRCNN on
    dataset=detect, FewshotSegModel on fewshot_bop/fss_1000, SiftMatcher on
    ycbv_sift — the families the reference dispatches from the same train CLI,
    ref datasets/__init__.py:7-24). Drives any model exposing
    train_step(batch)->metrics, eval_metric(batch)->list[float], state_dict().
    Same checkpoint layout (last.ckpt rolling resume, best.ckpt on the
    monitored metric) as OfflineTrainer."""

    def __init__(self, model, cfg, ckpt_dir: str | None = None):
        self.model = model
        self.cfg = cfg
        self.ckpt_dir = ckpt_dir
        self.history: list[dict] = []
        self.best_metric = -np.inf
        self.epoch = 0

    def train_epoch(self, loader):
        epoch_metrics = []
        for batch in loader:
            epoch_metrics.append(self.model.train_step(batch))
        out = {
            k: float(np.mean([e[k] for e in epoch_metrics]))
            for k in (epoch_metrics[0] if epoch_metrics else {})
        }
        self.history.append(out)
        self.epoch += 1
        if self.ckpt_dir:
            save_checkpoint(
                os.path.join(self.ckpt_dir, "last.ckpt"), self.model.state_dict(),
                extra={"epoch": self.epoch, "best_metric": float(self.best_metric)},
            )
        return out

    def restore_trainer_state(self, path: str) -> bool:
        import pickle

        with open(path, "rb") as f:
            payload = pickle.load(f)
        self.model.load_state_dict(payload.get("state", payload))
        self.epoch = int(payload.get("epoch", 0))
        self.best_metric = float(payload.get("best_metric", -np.inf))
        return "epoch" in payload

    def validate(self, loader, monitor: str = "metric"):
        scores = []
        for batch in loader:
            scores += list(self.model.eval_metric(batch))
        score = float(np.mean(scores)) if scores else 0.0
        if self.ckpt_dir and score > self.best_metric:
            self.best_metric = score
            os.makedirs(self.ckpt_dir, exist_ok=True)
            save_checkpoint(
                os.path.join(self.ckpt_dir, "best.ckpt"), self.model.state_dict(),
                extra={"monitor": {monitor: score}},
            )
        return score


class OfflineTrainer:
    """Minimal epoch-driven trainer over NumpyLoader-style loaders."""

    def __init__(self, model, cfg, n_devices: int | None = None, ckpt_dir: str | None = None):
        self.model = model
        self.cfg = cfg
        import jax

        n_avail = n_devices or len(jax.devices())
        b = int(cfg.train.batch_size)
        # the dp axis must divide the global batch; use the largest divisor
        n_use = max(d for d in range(1, n_avail + 1) if b % d == 0)
        self.mesh = make_mesh(n_use)
        self.ckpt_dir = ckpt_dir
        sched = make_multistep_schedule(
            cfg.model.learning_rate, steps_per_epoch=max(cfg.train.get("steps_per_epoch", 1000), 1)
        )
        self.tx = optax.chain(
            optax.add_decayed_weights(cfg.model.weight_decay),
            optax.amsgrad(sched),
        )
        self.opt_state = self.tx.init(model.params)
        self.step_fn = make_sharded_train_step(
            model.net, model.anchors, self.tx, self.mesh, cfg.model
        )
        self.history: list[dict] = []
        self.best_metric = -np.inf
        self.epoch = 0

    def train_epoch(self, loader, feed_keys=("img", "limg", "lmask", "gimg", "gmask",
                                             "bbox_gt", "heatmap", "mask")):
        m = self.model
        epoch_metrics = []
        for batch in loader:
            feed = {k: jnp.asarray(batch[k]) for k in feed_keys}
            m.params, m.batch_stats, self.opt_state, metrics = self.step_fn(
                m.params, m.batch_stats, self.opt_state, feed
            )
            epoch_metrics.append(metrics)
        out = {
            k: float(np.mean([float(e[k]) for e in epoch_metrics]))
            for k in (epoch_metrics[0] if epoch_metrics else {})
        }
        self.history.append(out)
        self.epoch += 1
        if self.ckpt_dir:
            # rolling resume point with FULL trainer state (the reference's
            # Lightning resume restores optimizer + epoch, ref train.py:27-41,97)
            self.save_trainer_state(os.path.join(self.ckpt_dir, "last.ckpt"))
        return out

    # ----------------------------------------------------- full-state resume
    def save_trainer_state(self, path: str):
        """Checkpoint model + optimizer state + epoch + best metric."""
        save_checkpoint(
            path,
            self.model.state_dict(),
            extra={
                "opt_state": jax.device_get(self.opt_state),
                "epoch": self.epoch,
                "best_metric": float(self.best_metric),
            },
        )

    def restore_trainer_state(self, path: str) -> bool:
        """Restore a save_trainer_state checkpoint. Returns True if optimizer
        state was present (full resume) — a plain weights ckpt restores only
        the model and training restarts its schedule."""
        import pickle

        with open(path, "rb") as f:
            payload = pickle.load(f)
        state = payload.get("state", payload)
        self.model.load_state_dict(state)
        if "opt_state" not in payload:
            return False
        self.opt_state = jax.device_put(payload["opt_state"])
        self.epoch = int(payload.get("epoch", 0))
        self.best_metric = float(payload.get("best_metric", -np.inf))
        return True

    def log_figures(self, loader, out_dir: str, epoch: int, n: int = 2):
        """Periodic prediction figures during training (role of the
        reference's W&B figure logging, ref models/dtoid/__init__.py:262-305,
        319-322): saved as PNGs under <out_dir>/figures/."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        from ossid_code_tpu.utils.vis import vis_in_out

        os.makedirs(os.path.join(out_dir, "figures"), exist_ok=True)
        done = 0
        for batch in loader:
            if np.asarray(batch["limg"]).ndim == 5:
                batch = dict(batch)
                batch["limg"] = batch["limg"][:, 0]
                batch["lmask"] = batch["lmask"][:, 0]
            out = self.model._eval_forward(
                self.model.params, self.model.batch_stats,
                {k: jnp.asarray(batch[k]) for k in
                 ("img", "limg", "lmask", "gimg", "gmask", "bbox_gt", "heatmap", "mask")},
            )
            out = {k: np.asarray(v) for k, v in out.items() if hasattr(v, "shape")}
            for i in range(len(np.asarray(batch["img"]))):
                fig, _ = vis_in_out(batch, out, idx=i)
                fig.savefig(os.path.join(out_dir, "figures", f"epoch{epoch}_{done}.png"))
                plt.close(fig)
                done += 1
                if done >= n:
                    return

    def validate(self, loader, monitor: str = "seg_IoU"):
        """Validation with the seg-IoU metric the reference monitors for
        checkpointing (ref train.py:83-91, monitor valunseen_seg_IoU)."""
        m = self.model
        ious = []
        for batch in loader:
            if np.asarray(batch["limg"]).ndim == 5:
                # all-templates validation batches: use the first local view
                batch = dict(batch)
                batch["limg"] = batch["limg"][:, 0]
                batch["lmask"] = batch["lmask"][:, 0]
            out = m._eval_forward(
                m.params, m.batch_stats,
                {k: jnp.asarray(batch[k]) for k in
                 ("img", "limg", "lmask", "gimg", "gmask", "bbox_gt", "heatmap", "mask")},
            )
            seg = np.asarray(jax.nn.sigmoid(out["seg_logits"])) > 0.5
            gt = np.asarray(batch["mask"]) > 0.5
            inter = np.logical_and(seg, gt).sum(axis=(1, 2, 3))
            union = np.logical_or(seg, gt).sum(axis=(1, 2, 3))
            ious += list(inter / np.clip(union, 1, None))
        score = float(np.mean(ious)) if ious else 0.0
        if self.ckpt_dir and score > self.best_metric:
            self.best_metric = score
            os.makedirs(self.ckpt_dir, exist_ok=True)
            save_checkpoint(
                os.path.join(self.ckpt_dir, "best.ckpt"),
                self.model.state_dict(),
                extra={"monitor": {monitor: score}},
            )
        return score
