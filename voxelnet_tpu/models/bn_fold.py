"""Eval-time BatchNorm folding for the inference graph.

BatchNorm at eval is a per-out-channel affine: y * s + t with
s = scale / sqrt(var + eps), t = bias - mean * s. Every conv stand-in in
this framework — nn.Conv, nn.ConvTranspose, middle._WPackConv /
_PPackConv / _FoldConv / _TapConv / _SparseConv / _SparseBwdConv,
rpn._BEVFoldConv — is linear in its 'kernel' with the OUT-channel as the
last kernel axis and an additive 'bias', so one generic transform folds
the whole stack: kernel' = kernel * s, bias' = bias * s + t. The paired /
depth-folded lowerings tile the bias themselves, and their expanded
kernels are linear relabelings of the raw (.., Cout) weight, so the same
per-channel scaling carries through them unchanged.

Why: at eval the separate BN op costs f32-convert + layout-copy
boundaries between convs (profiles/trace_r3b.md — the residual non-conv
time wpack2 didn't already harvest). Folding deletes the op entirely.
The fused VFE kernel already does this for the VFE BNs
(kernels/vfe_fused.py dense_affine); this extends it to the middle +
RPN stacks. Replaces the reference's separate Conv+BN modules at eval
(voxelnet/model.py:111-167).

Consumers must build their modules with fold_bn=True so the BN ops are
SKIPPED — applying an unfolded model to folded variables double-applies
the affine. The BN params/stats are left untouched in the returned tree
(they are simply unused), so the transform is cheap enough to live
inside the jitted inference graph: a few MB of per-channel elementwise
on the params, re-fused by XLA.
"""

from __future__ import annotations

from typing import Any, Mapping

import jax

_EPS = 1e-5  # every BN in this package uses epsilon=1e-5
_CONV_KEYS = ("Conv_0", "ConvTranspose_0")


def _fold_tree(params: Mapping[str, Any], stats: Mapping[str, Any]):
    out = {}
    for k, v in params.items():
        if isinstance(v, Mapping):
            sub_stats = stats.get(k, {}) if isinstance(stats, Mapping) else {}
            out[k] = _fold_tree(v, sub_stats)
        else:
            out[k] = v
    bn = out.get("BatchNorm_0")
    bs = stats.get("BatchNorm_0") if isinstance(stats, Mapping) else None
    if (isinstance(bn, Mapping) and isinstance(bs, Mapping)
            and "scale" in bn and "mean" in bs):
        conv_key = next(
            (ck for ck in _CONV_KEYS
             if isinstance(out.get(ck), Mapping) and "kernel" in out[ck]),
            None)
        if conv_key is not None:
            s = bn["scale"] * jax.lax.rsqrt(bs["var"] + _EPS)
            t = bn["bias"] - bs["mean"] * s
            conv = dict(out[conv_key])
            conv["kernel"] = conv["kernel"] * s      # out-channel is last
            conv["bias"] = conv["bias"] * s + t
            out[conv_key] = conv
    return out


def fold_bn_variables(variables: Mapping[str, Any]) -> dict:
    """variables -> variables with every (Conv_0|ConvTranspose_0,
    BatchNorm_0) sibling pair folded into the conv's kernel/bias.

    Only touches modules using the block naming convention above (the
    middle + RPN stacks); the VFE's 'fcn'/'bn' naming is untouched (its
    fold lives in the fused kernel). batch_stats and the BN params are
    returned unchanged — consumers MUST skip the BN ops (fold_bn=True
    modules)."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    folded = _fold_tree(params, stats)
    out = dict(variables)
    out["params"] = folded
    return out


def assert_foldable(variables) -> int:
    """Count foldable (conv, BN) pairs — test/debug helper."""
    count = 0

    def walk(p, s):
        nonlocal count
        if not isinstance(p, Mapping):
            return
        bn, bs = p.get("BatchNorm_0"), (
            s.get("BatchNorm_0") if isinstance(s, Mapping) else None)
        if (isinstance(bn, Mapping) and isinstance(bs, Mapping)
                and any(isinstance(p.get(ck), Mapping) and "kernel" in p[ck]
                        for ck in _CONV_KEYS)):
            count += 1
        for k, v in p.items():
            walk(v, s.get(k, {}) if isinstance(s, Mapping) else {})

    walk(variables["params"], variables.get("batch_stats", {}))
    return count
