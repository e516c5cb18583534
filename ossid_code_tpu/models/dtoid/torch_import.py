"""Torch state_dict -> flax pytree conversion for DTOID checkpoints.

The reference ships three DTOID checkpoint families (its ckpts/readme.md): the
Lightning `.ckpt` files (keys prefixed `model.`) and the original-author
`.pth.tar`. This shim maps every torch parameter/buffer name onto this
framework's flax tree (models/dtoid/network.py), transposing conv kernels
(OIHW -> HWIO) and splitting BatchNorm into params (scale/bias) and
batch_stats (mean/var).

Key layout on the torch side follows the reference's nn.Sequential splits
(ref models/dtoid/network.py:164-219,244-258):
  image_feature_extractor.backdense_0.0                  = densenet conv0
  image_feature_extractor.backdense_1.[0|3]              = norm0 | denseblock1
  image_feature_extractor.backdense_2.[0..6]             = trans1, block2,
        trans2, block3, trans3, block4, norm5
  template_feature_extractor[_global].backbone_0.0       = 4ch conv1
  template_feature_extractor[_global].backbone_1.[2|3]   = fire2 | fire3
  template_feature_extractor[_global].backbone_2.[1,2,4,5,6,7] = fire4..fire9
"""

from __future__ import annotations

import numpy as np


def _conv(w_dict, params, bstats, tprefix, fpath, bias=True):
    w = w_dict.get(tprefix + ".weight")
    if w is None:
        return False
    node = _dig(params, fpath)
    node["kernel"] = np.transpose(w, (2, 3, 1, 0))
    if bias and (tprefix + ".bias") in w_dict:
        node["bias"] = np.asarray(w_dict[tprefix + ".bias"])
    return True


def _bn(w_dict, params, bstats, tprefix, fpath):
    if (tprefix + ".weight") not in w_dict:
        return False
    node = _dig(params, fpath)
    node["scale"] = np.asarray(w_dict[tprefix + ".weight"])
    node["bias"] = np.asarray(w_dict[tprefix + ".bias"])
    snode = _dig(bstats, fpath)
    snode["mean"] = np.asarray(w_dict[tprefix + ".running_mean"])
    snode["var"] = np.asarray(w_dict[tprefix + ".running_var"])
    return True


def _dig(tree, path):
    node = tree
    for p in path.split("/"):
        node = node.setdefault(p, {})
    return node


def _dense_backbone_entries(prefix):
    """(torch_prefix, flax_path, kind) entries for the DenseNet trunk."""
    out = [
        (f"{prefix}.backdense_0.0", "image_feature_extractor/stem/conv0", "conv0"),
        (f"{prefix}.backdense_1.0", "image_feature_extractor/early/norm0", "bn"),
        (f"{prefix}.c1", "image_feature_extractor/c1", "conv"),
        (f"{prefix}.n1", "image_feature_extractor/n1", "bn"),
    ]
    block_cfg = {"denseblock1": 6, "denseblock2": 12, "denseblock3": 24, "denseblock4": 16}
    t_block = {
        "denseblock1": f"{prefix}.backdense_1.3",
        "denseblock2": f"{prefix}.backdense_2.1",
        "denseblock3": f"{prefix}.backdense_2.3",
        "denseblock4": f"{prefix}.backdense_2.5",
    }
    f_block = {
        "denseblock1": "image_feature_extractor/early/denseblock1",
        "denseblock2": "image_feature_extractor/late/denseblock2",
        "denseblock3": "image_feature_extractor/late/denseblock3",
        "denseblock4": "image_feature_extractor/late/denseblock4",
    }
    for blk, nlayers in block_cfg.items():
        for i in range(1, nlayers + 1):
            for sub, kind in (("norm1", "bn"), ("conv1", "convnb"), ("norm2", "bn"), ("conv2", "convnb")):
                out.append(
                    (f"{t_block[blk]}.denselayer{i}.{sub}", f"{f_block[blk]}/denselayer{i}/{sub}", kind)
                )
    for tname, fname in (
        (f"{prefix}.backdense_2.0", "image_feature_extractor/late/transition1"),
        (f"{prefix}.backdense_2.2", "image_feature_extractor/late/transition2"),
        (f"{prefix}.backdense_2.4", "image_feature_extractor/late/transition3"),
    ):
        out.append((f"{tname}.norm", f"{fname}/norm", "bn"))
        out.append((f"{tname}.conv", f"{fname}/conv", "convnb"))
    out.append((f"{prefix}.backdense_2.6", "image_feature_extractor/late/norm5", "bn"))
    return out


def _squeeze_backbone_entries(tprefix, fprefix, with_global_head):
    fires = {
        "fire2": f"{tprefix}.backbone_1.2",
        "fire3": f"{tprefix}.backbone_1.3",
        "fire4": f"{tprefix}.backbone_2.1",
        "fire5": f"{tprefix}.backbone_2.2",
        "fire6": f"{tprefix}.backbone_2.4",
        "fire7": f"{tprefix}.backbone_2.5",
        "fire8": f"{tprefix}.backbone_2.6",
        "fire9": f"{tprefix}.backbone_2.7",
    }
    out = [(f"{tprefix}.backbone_0.0", f"{fprefix}/stem/conv1", "conv")]
    for fname, tf in fires.items():
        stage = "early" if fname in ("fire2", "fire3") else "late"
        for sub in ("squeeze", "expand1x1", "expand3x3"):
            out.append((f"{tf}.{sub}", f"{fprefix}/{stage}/{fname}/{sub}", "conv"))
    out.append((f"{tprefix}.norm_1", f"{fprefix}/norm_1", "bn"))
    out.append((f"{tprefix}.norm_2", f"{fprefix}/norm_2", "bn"))
    if with_global_head:
        for i in (1, 2):
            out.append((f"{tprefix}.final_conv_{i}", f"{fprefix}/final_conv_{i}", "conv"))
            out.append((f"{tprefix}.final_norm_{i}", f"{fprefix}/final_norm_{i}", "bn"))
    return out


def _correlation_entries(prefix):
    p = f"{prefix}.correlation_model"
    f = "correlation_model"
    out = []
    for c, n in (("c1", "n1"), ("c2", "n2")):
        out.append((f"{p}.{c}", f"{f}/{c}", "conv"))
        out.append((f"{p}.{n}", f"{f}/{n}", "bn"))
    for name in ("dot", "dot3x3", "sub"):
        out.append((f"{p}.corr_conv_{name}", f"{f}/corr_conv_{name}", "conv"))
        out.append((f"{p}.norm_corr_{name}", f"{f}/norm_corr_{name}", "bn"))
    out.append((f"{p}.cf", f"{f}/cf", "conv"))
    out.append((f"{p}.nf", f"{f}/nf", "bn"))
    for i in range(1, 6):
        out.append((f"{p}.s{i}", f"{f}/s{i}", "conv"))
        out.append((f"{p}.ns{i}", f"{f}/ns{i}", "bn"))
    out.append((f"{p}.seg_final", f"{f}/seg_final", "conv"))
    out.append((f"{p}.corr_conv_heatmap", f"{f}/corr_conv_heatmap", "conv"))
    return out


def _head_entries(prefix):
    out = []
    for head in ("classification", "regression"):
        for i in range(1, 5):
            out.append((f"{prefix}.{head}.conv{i}", f"{head}/conv{i}", "conv"))
        out.append((f"{prefix}.{head}.output", f"{head}/output", "conv"))
    return out


def _all_entries():
    entries = []
    entries += _dense_backbone_entries("image_feature_extractor")
    entries += _squeeze_backbone_entries(
        "template_feature_extractor_global", "template_feature_extractor_global", True
    )
    entries += _squeeze_backbone_entries(
        "template_feature_extractor", "template_feature_extractor", False
    )
    entries += [(t.lstrip("."), f, k) for t, f, k in _correlation_entries("")]
    entries += [(t.lstrip("."), f, k) for t, f, k in _head_entries("")]
    return entries


def _get(tree, path):
    node = tree
    for p in path.split("/"):
        node = node[p]
    return node


def export_dtoid_state_dict(params: dict, batch_stats: dict, with_model_prefix: bool = True) -> dict:
    """Flax pytree -> torch-style state_dict (numpy values, reference key
    names), the inverse of convert_dtoid_state_dict — keeps this framework's
    checkpoints loadable by the reference implementation."""
    out = {}
    pre = "model." if with_model_prefix else ""
    for tprefix, fpath, kind in _all_entries():
        if kind == "bn":
            node = _get(params, fpath)
            snode = _get(batch_stats, fpath)
            out[f"{pre}{tprefix}.weight"] = np.asarray(node["scale"])
            out[f"{pre}{tprefix}.bias"] = np.asarray(node["bias"])
            out[f"{pre}{tprefix}.running_mean"] = np.asarray(snode["mean"])
            out[f"{pre}{tprefix}.running_var"] = np.asarray(snode["var"])
        else:
            node = _get(params, fpath)
            out[f"{pre}{tprefix}.weight"] = np.transpose(np.asarray(node["kernel"]), (3, 2, 0, 1))
            if "bias" in node:
                out[f"{pre}{tprefix}.bias"] = np.asarray(node["bias"])
    return out


def convert_dtoid_state_dict(state_dict: dict) -> dict:
    """Torch DTOID state_dict (numpy values) -> {'params': ..., 'batch_stats': ...}."""
    # normalize prefix: Lightning ckpts carry 'model.' (ref DtoidNet.model)
    keys = list(state_dict.keys())
    prefix = "model" if any(k.startswith("model.") for k in keys) else None
    sd = (
        {k[len("model.") :]: v for k, v in state_dict.items() if k.startswith("model.")}
        if prefix
        else dict(state_dict)
    )

    entries = _all_entries()

    params: dict = {}
    bstats: dict = {}
    missing = []
    for tprefix, fpath, kind in entries:
        if kind == "bn":
            ok = _bn(sd, params, bstats, tprefix, fpath)
        elif kind == "convnb":
            ok = _conv(sd, params, bstats, tprefix, fpath, bias=False)
        elif kind in ("conv", "conv0"):
            ok = _conv(sd, params, bstats, tprefix, fpath, bias=(kind == "conv"))
        else:
            ok = False
        if not ok:
            missing.append(tprefix)
    if missing:
        raise KeyError(
            f"torch ckpt missing {len(missing)} expected entries, e.g. {missing[:5]}"
        )
    return {"params": params, "batch_stats": bstats}
