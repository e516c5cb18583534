"""Visualization helpers (matplotlib) for training/debug logging
(ref utils/vis.py:10-145)."""

from __future__ import annotations

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def vis_bbox(img, pred_bbox=None, pred_score=None, gt_bbox=None, ax=None, topk=5):
    """Draw top-k predicted boxes (red, with scores) and GT boxes (green)."""
    if ax is None:
        _, ax = plt.subplots()
    ax.imshow(img)
    ax.axis("off")
    if pred_bbox is not None:
        for i, box in enumerate(np.asarray(pred_bbox)[:topk]):
            x1, y1, x2, y2 = box[:4]
            ax.add_patch(
                plt.Rectangle((x1, y1), x2 - x1, y2 - y1, fill=False, color="red", lw=1)
            )
            if pred_score is not None:
                ax.text(x1, y1 - 2, f"{float(np.asarray(pred_score)[i]):.2f}",
                        color="red", fontsize=5)
    if gt_bbox is not None:
        for box in np.atleast_2d(np.asarray(gt_bbox)):
            x1, y1, x2, y2 = box[:4]
            ax.add_patch(
                plt.Rectangle((x1, y1), x2 - x1, y2 - y1, fill=False, color="lime", lw=1)
            )
    return ax


def vis_mask(img, mask, alpha=0.5, color=(1.0, 0.0, 0.0), ax=None):
    """Overlay a binary/probability mask on an image."""
    if ax is None:
        _, ax = plt.subplots()
    img = np.asarray(img, np.float32)
    if img.max() > 1.5:
        img = img / 255.0
    mask = np.asarray(mask, np.float32)
    if mask.ndim == 3:
        mask = mask[..., 0]
    overlay = img.copy()
    for c in range(3):
        overlay[..., c] = img[..., c] * (1 - alpha * mask) + color[c] * alpha * mask
    ax.imshow(np.clip(overlay, 0, 1))
    ax.axis("off")
    return ax


def plot_images(images, titles=None, axes=None, dpi=150):
    """Grid of images with titles (ref utils/vis.py:120)."""
    n = len(images)
    if axes is None:
        _, axes = plt.subplots(1, n, dpi=dpi, figsize=(2 * n, 2))
        axes = np.atleast_1d(axes)
    for i, img in enumerate(images):
        img = np.asarray(img)
        axes[i].imshow(img, cmap="viridis" if img.ndim == 2 else None)
        axes[i].axis("off")
        if titles:
            axes[i].set_title(titles[i], fontsize=6)
    return axes


def vis_in_out(batch, out, idx=0):
    """Training-step visualization figure (ref models/dtoid/__init__.py:262-305):
    detected boxes, templates, GT/pred heatmaps + masks."""
    fig, axes = plt.subplots(2, 4, dpi=150, figsize=(8, 4))
    axes = axes.reshape(-1)

    img = np.asarray(batch["img"][idx])
    gimg = np.asarray(batch["gimg"][idx])
    limg = np.asarray(batch["limg"][idx])
    if limg.ndim == 4:
        limg = limg[0]

    plot_images([gimg, limg], ["G temp", "L temp"], axes=axes[1:3])
    axes[3].axis("off")
    seg = out.get("seg_logits")
    seg_img = 1 / (1 + np.exp(-np.asarray(seg[idx, ..., 0]))) if seg is not None else np.zeros(img.shape[:2])
    plot_images(
        [
            np.asarray(batch["heatmap"][idx, ..., 0]),
            np.asarray(out["heat_map"][idx, ..., 0]),
            np.asarray(batch["mask"][idx, ..., 0]),
            seg_img,
        ],
        ["GT heatmap", "pred heatmap", "GT mask", "pred mask"],
        axes=axes[4:8],
    )

    axes[0].set_title("input", fontsize=6)
    gt_bbox = np.asarray(batch["bbox_gt"])[idx, :, :4]
    vis_bbox(img, gt_bbox=gt_bbox, ax=axes[0])
    return fig, axes
