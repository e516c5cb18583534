"""Torch state_dict <-> flax pytree conversion for zephyr PointNet2SSG ckpts.

The reference loads pretrained PointNet2SSG scorer checkpoints — one per
dataset on LM-O, two on YCB-V selected by object-id parity (ref
scripts/online_learning.py:212-227). Those are Lightning `.ckpt` files whose
`state_dict` follows the erikwijmans/Pointnet2_PyTorch layout zephyr builds
on:

  SA_modules.{i}.mlps.0.layer{j}.conv.weight            Conv2d 1x1, no bias
  SA_modules.{i}.mlps.0.layer{j}.bn.bn.{weight,bias,running_mean,running_var}
  FC_layer.0.fc.weight / FC_layer.0.bn.bn.*             Linear(1024,512) no bias
  FC_layer.2.fc.weight / FC_layer.2.bn.bn.*             Linear(512,256) no bias
  FC_layer.4.fc.{weight,bias}                           Linear(256,num_class)

(the `.bn.bn.` double nesting comes from etw_pytorch_utils' _BNBase wrapper;
some forks flatten it to a single `.bn.` — both are accepted here, as are
`fc_layer.{0,1,3,4,7}` sequential indices from the plain-nn.Sequential variant
and an optional leading `model.` prefix).

Flax side: models/zephyr/pointnet2.py — sa{1,2} SetAbstraction (mlp{j}/bn{j}),
sa3 GlobalAbstraction, fc1/bn_fc1, fc2/bn_fc2, fc3.
"""

from __future__ import annotations

import re

import numpy as np

# (sa module index on the torch side, flax module name)
_SA_NAMES = {0: "sa1", 1: "sa2", 2: "sa3"}

# accepted torch FC prefixes -> (flax dense, flax bn) per layer position
_FC_LAYOUTS = [
    # etw pt_utils.Seq: FC(512,bn).Dropout.FC(256,bn).Dropout.FC(out)
    {"0": ("fc1", "bn_fc1"), "2": ("fc2", "bn_fc2"), "4": ("fc3", None)},
    # plain nn.Sequential: Linear,BN,ReLU,Linear,BN,ReLU,Dropout,Linear
    {"0": ("fc1", "bn_fc1"), "3": ("fc2", "bn_fc2"), "7": ("fc3", None)},
]


def _strip_prefix(sd: dict) -> dict:
    """Drop Lightning 'model.' prefix if every key carries it."""
    keys = list(sd)
    if keys and all(k.startswith("model.") for k in keys):
        return {k[len("model."):]: v for k, v in sd.items()}
    return dict(sd)


def _dig(tree: dict, *path):
    node = tree
    for p in path:
        node = node.setdefault(p, {})
    return node


def _put_bn(params, bstats, fmod, fbn, vals):
    w, b, mean, var = vals
    node = _dig(params, fmod, fbn)
    node["scale"] = np.asarray(w)
    node["bias"] = np.asarray(b)
    snode = _dig(bstats, fmod, fbn)
    snode["mean"] = np.asarray(mean)
    snode["var"] = np.asarray(var)


def convert_pointnet2_state_dict(state_dict: dict, align_feats: bool = False) -> dict:
    """Torch PointNet2SSG state_dict (numpy/torch values) ->
    {'params': ..., 'batch_stats': ...} for models/zephyr/pointnet2.PointNet2SSG.

    align_feats=True targets a net with the residual alignment head
    (pointnet2.alignment_fractions): reference checkpoints predate the
    feature, so a zero align_head kernel is injected — the imported scorer
    then reproduces the reference scores exactly and the head only
    contributes after finetuning."""
    sd = {k: np.asarray(v) for k, v in _strip_prefix(state_dict).items()}

    params: dict = {}
    bstats: dict = {}
    consumed = set()

    # ---- SA modules: SA_modules.{i}.mlps.0.layer{j}.(conv|bn[.bn])....
    sa_re = re.compile(
        r"^SA_modules\.(\d)\.mlps\.0\.layer(\d)\.(conv\.weight|(?:bn\.)?bn\.(\w+))$"
    )
    for k, v in sd.items():
        m = sa_re.match(k)
        if not m:
            continue
        i, j = int(m.group(1)), int(m.group(2))
        fmod = _SA_NAMES.get(i)
        if fmod is None:
            raise KeyError(f"unexpected SA module index in {k}")
        if m.group(3) == "conv.weight":
            # torch Conv2d (out, in, 1, 1) -> flax HWIO (1, 1, in, out)
            _dig(params, fmod, f"mlp{j}")["kernel"] = np.transpose(v, (2, 3, 1, 0))
            consumed.add(k)

    for i, fmod in _SA_NAMES.items():
        j = 0
        while True:
            base = f"SA_modules.{i}.mlps.0.layer{j}"
            keyset = None
            for bnp in (f"{base}.bn.bn", f"{base}.bn"):
                if f"{bnp}.weight" in sd:
                    keyset = bnp
                    break
            if keyset is None:
                break
            _put_bn(
                params, bstats, fmod, f"bn{j}",
                (sd[f"{keyset}.weight"], sd[f"{keyset}.bias"],
                 sd[f"{keyset}.running_mean"], sd[f"{keyset}.running_var"]),
            )
            consumed.update(
                f"{keyset}.{s}" for s in ("weight", "bias", "running_mean", "running_var")
            )
            j += 1

    # ---- FC head
    fc_prefix = None
    for cand in ("FC_layer", "fc_layer"):
        if any(k.startswith(cand + ".") for k in sd):
            fc_prefix = cand
            break
    if fc_prefix is None:
        raise KeyError("no FC_layer/fc_layer keys found in zephyr state_dict")

    layout = None
    for cand in _FC_LAYOUTS:
        probe = list(cand.keys())[1]  # the middle FC distinguishes the layouts
        if (f"{fc_prefix}.{probe}.fc.weight" in sd
                or f"{fc_prefix}.{probe}.weight" in sd):
            layout = cand
            break
    if layout is None:
        raise KeyError(
            f"unrecognized {fc_prefix} layout; keys: "
            f"{sorted(k for k in sd if k.startswith(fc_prefix))[:8]}"
        )

    for idx, (fdense, fbn) in layout.items():
        base = f"{fc_prefix}.{idx}"
        wkey = f"{base}.fc.weight" if f"{base}.fc.weight" in sd else f"{base}.weight"
        if wkey not in sd:
            raise KeyError(f"zephyr ckpt missing {wkey}")
        node = _dig(params, fdense)
        node["kernel"] = np.transpose(sd[wkey], (1, 0))  # (out,in) -> (in,out)
        consumed.add(wkey)
        bkey = wkey.replace(".weight", ".bias")
        if bkey in sd:
            node["bias"] = np.asarray(sd[bkey])
            consumed.add(bkey)
        if fbn is not None:
            bn_base = None
            for cand_bn in (f"{base}.bn.bn", f"{base}.bn",
                            f"{fc_prefix}.{int(idx) + 1}"):
                if f"{cand_bn}.weight" in sd and f"{cand_bn}.running_mean" in sd:
                    bn_base = cand_bn
                    break
            if bn_base is None:
                raise KeyError(f"zephyr ckpt missing BN for {base}")
            _put_bn_flat(
                params, bstats, fbn,
                (sd[f"{bn_base}.weight"], sd[f"{bn_base}.bias"],
                 sd[f"{bn_base}.running_mean"], sd[f"{bn_base}.running_var"]),
            )
            consumed.update(
                f"{bn_base}.{s}" for s in ("weight", "bias", "running_mean", "running_var")
            )

    # sanity: the three SA stages + head must all be present
    for need in ("sa1", "sa2", "sa3", "fc1", "fc2", "fc3", "bn_fc1", "bn_fc2"):
        if need not in params:
            raise KeyError(f"zephyr ckpt conversion incomplete: missing {need}")
    if align_feats:
        from ossid_code_tpu.models.zephyr.pointnet2 import ALIGN_TAU_D, ALIGN_TAU_H

        # reference ckpts predate the residual alignment head: inject a ZERO
        # kernel so the imported scorer reproduces reference scores exactly
        # (the head only contributes after finetuning)
        n_stats = len(ALIGN_TAU_D) * len(ALIGN_TAU_H)
        out_w = params["fc3"]["kernel"].shape[1]
        dt = params["fc3"]["kernel"].dtype
        params["align_head"] = {
            "kernel": np.zeros((n_stats, out_w), dt),
            "bias": np.zeros((out_w,), dt),
        }
    return {"params": params, "batch_stats": bstats}


def _put_bn_flat(params, bstats, fbn, vals):
    """Top-level flax BN module (bn_fc1/bn_fc2 live beside the Dense, not inside)."""
    w, b, mean, var = vals
    node = _dig(params, fbn)
    node["scale"] = np.asarray(w)
    node["bias"] = np.asarray(b)
    snode = _dig(bstats, fbn)
    snode["mean"] = np.asarray(mean)
    snode["var"] = np.asarray(var)


def export_pointnet2_state_dict(params: dict, batch_stats: dict) -> dict:
    """Flax pytree -> torch-style state_dict (numpy values, zephyr key names);
    inverse of convert_pointnet2_state_dict, keeping scorers finetuned in this
    framework loadable by the reference's PointNet2SSG."""
    out = {}
    for i, fmod in _SA_NAMES.items():
        mod = params[fmod]
        smod = batch_stats[fmod]
        j = 0
        while f"mlp{j}" in mod:
            base = f"SA_modules.{i}.mlps.0.layer{j}"
            out[f"{base}.conv.weight"] = np.transpose(
                np.asarray(mod[f"mlp{j}"]["kernel"]), (3, 2, 0, 1)
            )
            bn = mod[f"bn{j}"]
            sbn = smod[f"bn{j}"]
            out[f"{base}.bn.bn.weight"] = np.asarray(bn["scale"])
            out[f"{base}.bn.bn.bias"] = np.asarray(bn["bias"])
            out[f"{base}.bn.bn.running_mean"] = np.asarray(sbn["mean"])
            out[f"{base}.bn.bn.running_var"] = np.asarray(sbn["var"])
            j += 1

    for idx, (fdense, fbn) in _FC_LAYOUTS[0].items():
        base = f"FC_layer.{idx}"
        node = params[fdense]
        out[f"{base}.fc.weight"] = np.transpose(np.asarray(node["kernel"]), (1, 0))
        if "bias" in node:
            out[f"{base}.fc.bias"] = np.asarray(node["bias"])
        if fbn is not None:
            bn = params[fbn]
            sbn = batch_stats[fbn]
            out[f"{base}.bn.bn.weight"] = np.asarray(bn["scale"])
            out[f"{base}.bn.bn.bias"] = np.asarray(bn["bias"])
            out[f"{base}.bn.bn.running_mean"] = np.asarray(sbn["mean"])
            out[f"{base}.bn.bn.running_var"] = np.asarray(sbn["var"])
    return out
