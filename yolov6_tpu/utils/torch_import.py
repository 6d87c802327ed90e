"""Import reference PyTorch checkpoints into Flax parameter trees.

Replaces the reference's runtime ``switch_to_deploy`` + ``fuse_model`` flow
(reference: yolov6/layers/common.py:302-319, yolov6/utils/checkpoint.py:22-32)
with a pure, load-time transform:

  torch state_dict (OIHW)  ->  numpy  ->  fold rep branches / conv+BN (fp32)
                            ->  name-mapped NHWC/HWIO Flax pytree.

The flax module tree intentionally mirrors the torch attribute paths, so the
mapping is mechanical; the only logic is layout transposition and the fold
selection per block kind.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

from yolov6_tpu.layers import reparam
from yolov6_tpu.utils.events import LOGGER


def _oihw_to_hwio(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(np.asarray(w, np.float32), (2, 3, 1, 0)))


def _deconv_to_hwio(w: np.ndarray) -> np.ndarray:
    # torch ConvTranspose2d weight is (in, out, kh, kw) -> (kh, kw, in, out)
    return np.ascontiguousarray(np.transpose(np.asarray(w, np.float32), (2, 3, 0, 1)))


def _bn_dict(state: Dict[str, np.ndarray], prefix: str, eps: float = 1e-3) -> Optional[dict]:
    if f"{prefix}.weight" not in state:
        return None
    return dict(
        gamma=state[f"{prefix}.weight"],
        beta=state[f"{prefix}.bias"],
        mean=state[f"{prefix}.running_mean"],
        var=state[f"{prefix}.running_var"],
        eps=eps,
    )


def _k(prefix: str, suffix: str) -> str:
    """Join torch key parts, tolerating an empty prefix (bare-module import)."""
    return f"{prefix}.{suffix}" if prefix else suffix


def torch_state_to_numpy(obj) -> Dict[str, np.ndarray]:
    """Flatten a torch state_dict (or module) to {key: float32 numpy}."""
    import torch

    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    out = {}
    for k, v in obj.items():
        if isinstance(v, torch.Tensor):
            out[k] = v.detach().float().cpu().numpy()
    return out


def load_reference_checkpoint(path: str, prefer_ema: bool = True) -> Dict[str, np.ndarray]:
    """Read a reference ``.pt`` checkpoint into a flat numpy state dict.

    Mirrors reference utils/checkpoint.py:22-32 (prefers the EMA weights).
    Requires the reference package importable for unpickling full models.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict):
        model = ckpt.get("ema" if prefer_ema and ckpt.get("ema") else "model", None)
        if model is None:
            model = ckpt.get("model")
    else:
        model = ckpt
    model = model.float()
    return torch_state_to_numpy(model)


class _Folder:
    """Resolves one flax deploy-leaf from the torch state, folding as needed."""

    def __init__(self, state: Dict[str, np.ndarray], training_mode: str):
        self.state = state
        self.mode = training_mode
        self._cache: Dict[str, tuple] = {}

    def has(self, key: str) -> bool:
        return key in self.state

    # ---- fused conv providers (kernel, bias) keyed by torch module prefix ----

    def conv_bn(self, conv_prefix: str, bn_prefix: str):
        """conv (+optional bias) followed by BN -> fused (kernel_hwio, bias)."""
        key = f"fuse:{conv_prefix}|{bn_prefix}"
        if key not in self._cache:
            kernel = _oihw_to_hwio(self.state[_k(conv_prefix, "weight")])
            bias = self.state.get(_k(conv_prefix, "bias"))
            bn = _bn_dict(self.state, bn_prefix)
            if bn is None:
                self._cache[key] = (kernel, np.zeros(kernel.shape[-1], np.float32) if bias is None else bias)
            else:
                self._cache[key] = reparam.fuse_conv_bn(kernel, bias, **bn)
        return self._cache[key]

    def rep_block(self, prefix: str):
        """Fold a rep-style block at ``prefix`` to (kernel3x3_hwio, bias)."""
        if prefix in self._cache:
            return self._cache[prefix]
        s = self.state
        if _k(prefix, "rbr_reparam.weight") in s:
            # checkpoint already deployed
            result = (
                _oihw_to_hwio(s[_k(prefix, "rbr_reparam.weight")]),
                np.asarray(s[_k(prefix, "rbr_reparam.bias")], np.float32),
            )
            post_bn = _bn_dict(s, _k(prefix, "bn"))
            if post_bn is not None:
                result = reparam.fuse_extra_bn(result[0], result[1], **post_bn)
            self._cache[prefix] = result
            return result

        dense_kernel = _oihw_to_hwio(s[_k(prefix, "rbr_dense.conv.weight")])
        dense_bn = _bn_dict(s, _k(prefix, "rbr_dense.bn"))
        channels = dense_kernel.shape[-1]
        in_ch = dense_kernel.shape[-2]
        groups = 1  # reference never uses grouped rep blocks

        if _k(prefix, "rbr_1x1.conv.weight") in s:
            # RepVGGBlock: 1x1 branch has its own BN; identity branch is a BN.
            onexone_kernel = _oihw_to_hwio(s[_k(prefix, "rbr_1x1.conv.weight")])
            onexone_bn = _bn_dict(s, _k(prefix, "rbr_1x1.bn"))
            identity_bn = _bn_dict(s, _k(prefix, "rbr_identity"))
            result = reparam.repvgg_fold(
                dense_kernel, dense_bn, onexone_kernel, onexone_bn, identity_bn, channels, groups
            )
        elif _k(prefix, "rbr_1x1.weight") in s:
            # QARepVGG (V1/V2): raw 1x1 conv, pure identity skip, shared post-BN.
            onexone_kernel = _oihw_to_hwio(s[_k(prefix, "rbr_1x1.weight")])
            post_bn = _bn_dict(s, _k(prefix, "bn"))
            has_identity = channels == in_ch  # identity/avg exist iff in==out & stride 1
            has_avg = has_identity and self.mode == "qarepvggv2"
            result = reparam.qarepvgg_fold(
                dense_kernel, dense_bn, onexone_kernel, post_bn, has_identity, channels, groups,
                has_avg=has_avg,
            )
        else:
            raise KeyError(f"cannot identify rep-block structure at {prefix!r}")
        self._cache[prefix] = result
        return result


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def _unflatten(flat):
    tree: Dict[str, Any] = {}
    for path, v in flat.items():
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = v
    return tree


# torch key suffixes for our train-mode leaves
_TRAIN_LEAF_MAP = {
    ("params", "kernel"): "weight",
    ("params", "bias"): "bias",
    ("params", "scale"): "weight",  # BatchNorm gamma
    ("params", "weight"): "weight",  # ScaleLayer
    ("params", "alpha"): "alpha",
    ("batch_stats", "mean"): "running_mean",
    ("batch_stats", "var"): "running_var",
}

# DPBlock pairs its convs with separately-named BNs (reference: common.py:900-934)
_DP_BN_SIBLING = {"conv_dw_1": "bn_1", "conv_pw_1": "bn_2"}


def native_variables_to_torch_state(variables) -> Dict[str, np.ndarray]:
    """Flatten native train-layout flax variables into a torch-style flat
    state dict (OIHW), the exact inverse of import_checkpoint's name/layout
    mapping — so natively-trained checkpoints reuse the same fold-at-load
    path (rep-branch + conv+BN fusion) as reference ``.pt`` imports.
    """
    flat = _flatten(
        {k: dict(v) for k, v in variables.items() if k in ("params", "batch_stats")}
    )
    out: Dict[str, np.ndarray] = {}
    for path, value in flat.items():
        col, mods, leaf_name = path[0], path[1:-1], path[-1]
        suffix = _TRAIN_LEAF_MAP.get((col, leaf_name))
        if suffix is None:
            continue
        v = np.asarray(value, np.float32)
        if leaf_name == "kernel" and v.ndim == 4:
            if v.shape[:2] == (2, 2) and mods and mods[-1].startswith("upsample"):
                # Transpose block (kh,kw,in,out) -> the nested-ConvTranspose
                # key import_checkpoint probes for, in torch (in,out,kh,kw)
                out[".".join(mods) + ".upsample_transpose." + suffix] = (
                    np.ascontiguousarray(np.transpose(v, (2, 3, 0, 1)))
                )
                continue
            v = np.ascontiguousarray(np.transpose(v, (3, 2, 0, 1)))
        key = ".".join(mods)
        out[(key + "." if key else "") + suffix] = v
    return out


def import_checkpoint(
    state: Dict[str, np.ndarray],
    target_spec,
    training_mode: str = "repvgg",
    deploy: bool = True,
    strict: bool = True,
):
    """Map a flat torch state dict onto a flax variables spec.

    Args:
      state: flat {torch_key: numpy array}.
      target_spec: flax variables pytree (e.g. from ``jax.eval_shape(model.init, ...)``)
        — shapes are validated against it.
      training_mode: reference ``training_mode`` config (block family hint).
      deploy: if True, fold rep branches and conv+BN into deploy conv params.
    Returns: flax variables dict matching target_spec's structure.
    """
    folder = _Folder(state, training_mode)
    flat_spec = _flatten({k: dict(v) for k, v in target_spec.items()})
    out = {}
    missing = []
    for path, leaf in flat_spec.items():
        col = path[0]
        mods = path[1:-1]
        leaf_name = path[-1]
        tp = ".".join(mods)  # torch module prefix for this leaf's owner
        parent = ".".join(mods[:-1])
        value = None

        if deploy:
            owner = mods[-1] if mods else ""
            if owner == "rbr_reparam":
                kernel, bias = folder.rep_block(parent)
                value = kernel if leaf_name == "kernel" else bias
            elif owner == "conv" and leaf_name in ("kernel", "bias"):
                if folder.has(_k(parent, "bn.weight")):
                    kernel, bias = folder.conv_bn(_k(parent, "conv"), _k(parent, "bn"))
                    value = kernel if leaf_name == "kernel" else bias
            elif owner in _DP_BN_SIBLING and folder.has(_k(parent, _DP_BN_SIBLING[owner] + ".weight")):
                kernel, bias = folder.conv_bn(tp, _k(parent, _DP_BN_SIBLING[owner]))
                value = kernel if leaf_name == "kernel" else bias

        if value is None:
            suffix = _TRAIN_LEAF_MAP.get((col, leaf_name))
            if suffix is None:
                missing.append(path)
                continue
            tk = _k(tp, suffix)
            if tk in state:
                value = np.asarray(state[tk], np.float32)
                if leaf_name == "kernel" and value.ndim == 4:
                    value = _oihw_to_hwio(value)
            elif folder.has(_k(tp, "upsample_transpose." + suffix)):
                # our Transpose flattens the reference's nested ConvTranspose
                value = np.asarray(state[_k(tp, "upsample_transpose." + suffix)], np.float32)
                if suffix == "weight":
                    value = _deconv_to_hwio(value)
            else:
                missing.append(path)
                continue

        expected = tuple(leaf.shape)
        value = np.asarray(value, np.float32)
        if value.ndim == 1 and len(expected) == 1 and value.shape[0] == expected[0]:
            pass
        elif tuple(value.shape) != expected:
            raise ValueError(f"shape mismatch at {path}: got {value.shape}, want {expected}")
        out[path] = value

    if missing:
        msg = f"torch import: {len(missing)} leaves unmatched, e.g. {missing[:5]}"
        if strict:
            raise KeyError(msg)
        LOGGER.warning(msg)
        for path in missing:
            out[path] = np.zeros(tuple(flat_spec[path].shape), np.float32)
    return _unflatten(out)
