"""Support-conditioned few-shot segmentation model — the model family trained
by the reference's `dataset=fewshot_bop` / FSS-1000 configs.

The reference repo carries the datasets (ref datasets/fewshot_bop_dataset.py,
datasets/fss1000dataset.py) and dispatches them from its train CLI
(ref datasets/__init__.py:7-11), but the model that consumed them predates the
repo and is absent from getModel (ref models/__init__.py:3-15). This module
supplies a working TPU-native model for those episodes so the data families
are trainable end-to-end: a shared conv trunk encodes the query; supports
(RGB + mask, 4 channels like DTOID's template encoders,
ref models/dtoid/network.py:195-279) are encoded and mask-pooled into a
prototype vector that modulates the query features (FiLM + cosine
correlation), and a light decoder predicts the query mask.

All shapes are static: k supports are a fixed leading axis, query/support
resolutions are set by the config — one jitted train step, one jitted eval.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
import optax
import flax.linen as nn

from ossid_code_tpu.ops.resize import upsample_nearest, resize_nearest


class _Trunk(nn.Module):
    """3-stage stride-8 conv encoder (NHWC; channels sized for the MXU)."""

    width: int = 64

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, ch in enumerate((self.width, self.width * 2, self.width * 4)):
            x = nn.Conv(ch, (3, 3), strides=(2, 2), padding=1, name=f"conv{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9, name=f"bn{i}")(x)
            x = nn.relu(x)
            x = nn.Conv(ch, (3, 3), padding=1, name=f"conv{i}b")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9, name=f"bn{i}b")(x)
            x = nn.relu(x)
        return x  # (B, H/8, W/8, 4*width)


class FewshotSegNetwork(nn.Module):
    img_size: tuple  # query (H, W)
    width: int = 64

    @nn.compact
    def __call__(self, img, simg, smask, train: bool = False):
        """img (B,H,W,3); simg (B,K,h,w,3); smask (B,K,h,w,1) ->
        seg logits (B,H,W,1)."""
        c = self.width * 4
        q = _Trunk(width=self.width, name="query_trunk")(img, train)  # (B,H8,W8,C)

        b, k = simg.shape[0], simg.shape[1]
        sup = jnp.concatenate([simg, smask], axis=-1).reshape((b * k,) + simg.shape[2:4] + (4,))
        sfeat = _Trunk(width=self.width, name="support_trunk")(sup, train)
        smask8 = resize_nearest(smask.reshape((b * k,) + smask.shape[2:4] + (1,)),
                                sfeat.shape[1:3])
        # masked global average pool -> one prototype per support, mean over k
        num = (sfeat * smask8).sum(axis=(1, 2))
        den = jnp.clip(smask8.sum(axis=(1, 2)), 1.0, None)
        proto = (num / den).reshape(b, k, c).mean(axis=1)  # (B, C)

        # FiLM modulation + cosine-similarity channel
        gamma = nn.Dense(c, name="film_gamma")(proto)[:, None, None, :]
        beta = nn.Dense(c, name="film_beta")(proto)[:, None, None, :]
        cos = jnp.sum(
            q * proto[:, None, None, :], axis=-1, keepdims=True
        ) / (jnp.linalg.norm(q, axis=-1, keepdims=True)
             * jnp.linalg.norm(proto, axis=-1)[:, None, None, None] + 1e-6)
        x = jnp.concatenate([q * (1 + gamma) + beta, cos], axis=-1)

        x = nn.relu(nn.BatchNorm(use_running_average=not train, momentum=0.9, name="dn1")(
            nn.Conv(128, (3, 3), padding=1, name="d1")(x)))
        x = upsample_nearest(x, 2)
        x = nn.relu(nn.BatchNorm(use_running_average=not train, momentum=0.9, name="dn2")(
            nn.Conv(64, (3, 3), padding=1, name="d2")(x)))
        x = upsample_nearest(x, 2)
        x = nn.relu(nn.BatchNorm(use_running_average=not train, momentum=0.9, name="dn3")(
            nn.Conv(32, (3, 3), padding=1, name="d3")(x)))
        x = resize_nearest(x, self.img_size)
        return nn.Conv(1, (3, 3), padding=1, name="seg_final",
                       kernel_init=nn.initializers.zeros,
                       bias_init=nn.initializers.constant(-2.0))(x)


class FewshotSegModel:
    """Host wrapper: jitted train/eval steps + state_dict interface (parity
    with DtoidModel/MaskRCNN so the generic trainer drives all three)."""

    train_feed_keys = ("img", "mask", "simg", "smask")

    def __init__(self, cfg, seed: int = 0):
        self.cfg = cfg
        d = cfg.dataset
        if d.get("name") == "fss_1000":
            s = int(d.get("image_size", 224))
            h = w = s
            sh = sw = s
        else:
            h, w = int(cfg.model.get("img_h", d.get("img_h", 480))), int(
                cfg.model.get("img_w", d.get("img_w", 640)))
            sh = sw = int(d.get("template_size", 128))
        self.img_size = (h, w)
        self.support_size = (sh, sw)
        self.net = FewshotSegNetwork(img_size=self.img_size,
                                     width=int(cfg.model.get("width", 64)))
        k = int(d.get("k_support", d.get("k_shot", 1)))
        rng = jax.random.PRNGKey(seed)
        variables = jax.jit(functools.partial(self.net.init, train=False))(
            rng, jnp.zeros((1, h, w, 3)), jnp.zeros((1, k, sh, sw, 3)),
            jnp.zeros((1, k, sh, sw, 1)),
        )
        self.params = variables["params"]
        self.batch_stats = variables["batch_stats"]
        self.tx = optax.chain(
            optax.add_decayed_weights(cfg.model.get("weight_decay", 1e-6)),
            optax.amsgrad(cfg.model.get("learning_rate", 1e-4)),
        )
        self.opt_state = self.tx.init(self.params)
        self._build_jits()

    def _build_jits(self):
        net = self.net
        tx = self.tx

        @jax.jit
        def train_step(params, batch_stats, opt_state, batch):
            def loss_fn(p):
                logits, mutated = net.apply(
                    {"params": p, "batch_stats": batch_stats},
                    batch["img"], batch["simg"], batch["smask"],
                    train=True, mutable=["batch_stats"],
                )
                probs = jnp.clip(jax.nn.sigmoid(logits), 1e-7, 1 - 1e-7)
                gt = batch["mask"]
                loss = -(gt * jnp.log(probs) + (1 - gt) * jnp.log(1 - probs)).mean()
                return loss, mutated["batch_stats"]

            (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, new_opt = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), new_stats, new_opt, {"loss": loss}

        @jax.jit
        def eval_forward(params, batch_stats, batch):
            return net.apply({"params": params, "batch_stats": batch_stats},
                             batch["img"], batch["simg"], batch["smask"], train=False)

        self._train_step = train_step
        self._eval_forward = eval_forward

    def _feed(self, batch):
        feed = {}
        for k in self.train_feed_keys:
            if k not in batch:
                continue
            v = np.asarray(batch[k], np.float32)
            if k in ("mask", "smask") and v.shape[-1] != 1:
                v = v[..., None]
            feed[k] = jnp.asarray(v)
        return feed

    def train_step(self, batch: dict) -> dict:
        feed = self._feed(batch)
        self.params, self.batch_stats, self.opt_state, metrics = self._train_step(
            self.params, self.batch_stats, self.opt_state, feed
        )
        return {k: float(v) for k, v in metrics.items()}

    def eval_metric(self, batch: dict) -> list[float]:
        """Per-sample seg IoU (the monitored metric)."""
        feed = self._feed(batch)
        logits = np.asarray(self._eval_forward(self.params, self.batch_stats, feed))
        pred = logits[..., 0] > 0.0
        gt = np.asarray(batch["mask"])[..., 0] > 0.5
        inter = np.logical_and(pred, gt).sum(axis=(1, 2))
        union = np.logical_or(pred, gt).sum(axis=(1, 2))
        return list(inter / np.clip(union, 1, None))

    def reset_optimizer(self):
        self.opt_state = self.tx.init(self.params)

    def state_dict(self):
        return {"params": jax.device_get(self.params),
                "batch_stats": jax.device_get(self.batch_stats)}

    def load_state_dict(self, sd):
        self.params = jax.device_put(sd["params"])
        self.batch_stats = jax.device_put(sd["batch_stats"])
