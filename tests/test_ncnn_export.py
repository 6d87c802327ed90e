"""NCNN .param/.bin emitter: numeric parity vs the Flax lite model (through
the independent numpy ncnn executor) and structural parity vs the
reference's shipped Android assets
(/root/reference/deploy/NCNN/Android/app/src/main/assets/)."""

import collections
import os.path as osp

import numpy as np
import pytest

import conftest  # noqa: F401 (forces CPU)

import jax
import jax.numpy as jnp

from yolov6_tpu.export.ncnn_export import build_ncnn_graph, export_ncnn
from yolov6_tpu.export.ncnn_numpy import NcnnRunner, parse_param
from yolov6_tpu.models.yolo import build_model
from yolov6_tpu.utils.config import Config

REF_ASSETS = "/root/reference/deploy/NCNN/Android/app/src/main/assets"


def _lite_model(width=0.25, nc=4, init_size=64, real_init=True):
    cfg = Config.fromfile("/root/repo/configs/yolov6_lite/yolov6_lite_s.py")
    cfg.model.width_multiple = width
    model = build_model(cfg, num_classes=nc, deploy=True)
    if real_init:
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, init_size, init_size, 3)),
            train=False)
        # zero-init heads make degenerate outputs; randomize all params
        leaves, treedef = jax.tree_util.tree_flatten(variables["params"])
        rngs = jax.random.split(jax.random.PRNGKey(1), len(leaves))
        leaves = [0.05 * jax.random.normal(r, l.shape, jnp.float32)
                  for r, l in zip(rngs, leaves)]
        variables = {"params": jax.tree_util.tree_unflatten(treedef, leaves)}
    else:
        shapes = jax.eval_shape(
            model.init, jax.random.PRNGKey(0),
            jnp.zeros((1, init_size, init_size, 3)))
        variables = jax.tree_util.tree_map(
            lambda s: np.zeros(s.shape, np.float32), shapes)
    return model, variables


@pytest.mark.parametrize("fp16", [False, True])
def test_ncnn_numeric_parity(tmp_path, fp16):
    """Emitted graph executes (numpy oracle) to the Flax model's outputs:
    out{i} = [sigmoid(cls); reg] CHW at stride 8<<i."""
    model, variables = _lite_model()
    prefix = str(tmp_path / "lite")
    export_ncnn(model, variables, prefix, fp16=fp16)

    runner = NcnnRunner(prefix + ".param", prefix + ".bin")
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    blobs = runner(img.transpose(2, 0, 1))

    head_out, _ = model.apply(variables, jnp.asarray(img[None]), train=False)
    tol = 2e-2 if fp16 else 2e-5
    for i in range(4):
        cls = jax.nn.sigmoid(head_out["cls"][i][0])
        reg = head_out["reg"][i][0]
        want = np.concatenate(
            [np.asarray(cls), np.asarray(reg)], -1).transpose(2, 0, 1)
        got = blobs[f"out{i}"]
        assert got.shape == want.shape, (i, got.shape, want.shape)
        np.testing.assert_allclose(got, want, rtol=tol, atol=tol,
                                   err_msg=f"level {i}")


@pytest.mark.parametrize("asset,width", [
    ("yolov6-lite-s", 0.7),   # lite-s config width
    ("yolov6-lite-m", 1.1),   # lite-m
    ("yolov6-lite-l0", 1.5),  # lite-l at its three shipped input sizes —
    ("yolov6-lite-l1", 1.5),  # same graph, the app picks by resolution
    ("yolov6-lite-l2", 1.5),
])
def test_ncnn_structure_matches_reference_asset(asset, width):
    """Each shipped Android asset: the emitted op inventory must EQUAL the
    PNNX-produced asset's, layer for layer by type (the graph the Android
    yolo.cpp consumes), conv shapes must match exactly, and the I/O blob
    names must match."""
    ref = parse_param(osp.join(REF_ASSETS, asset + ".param"))
    ref_counts = collections.Counter(l["op"] for l in ref)

    model, variables = _lite_model(width=width, nc=80, real_init=False)
    g = build_ncnn_graph(model, variables)
    got_counts = collections.Counter(l["op"] for l in g.layers)
    assert got_counts == ref_counts, (
        f"op inventory mismatch:\n ours {dict(got_counts)}\n "
        f"ref {dict(ref_counts)}")
    assert len(g.layers) == len(ref)

    # identical I/O contract
    assert g.layers[0]["op"] == "Input" and g.layers[0]["outputs"] == ["in0"]
    outs = {b for l in g.layers for b in l["outputs"]}
    assert {"out0", "out1", "out2", "out3"} <= outs

    # conv shape multiset matches the reference asset exactly (same widths)
    def conv_sig(layers):
        return collections.Counter(
            (l["op"], int(l["params"][0]), int(l["params"][1]),
             int(l["params"][6]))
            for l in layers if l["op"].startswith("Conv"))
    assert conv_sig(g.layers) == conv_sig(ref)


def test_ncnn_bin_reference_asset_parses():
    """Our .bin reader understands the REFERENCE's shipped binary (same
    tag/padding/bias layout we emit)."""
    runner = NcnnRunner(osp.join(REF_ASSETS, "yolov6-lite-s.param"),
                        osp.join(REF_ASSETS, "yolov6-lite-s.bin"))
    convs = [l for l in runner.layers if "w" in l]
    assert len(convs) == 154  # 112 Convolution + 42 ConvolutionDepthWise
    assert all(l["b"] is not None for l in convs)
