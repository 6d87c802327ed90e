"""End-to-end serving graph: preprocessing + forward + decode + in-graph NMS
(reference: yolov6/models/end2end.py, which wraps NMS as ONNX/TRT ops).

TPU-native: the whole pipeline is one jittable function over fixed shapes;
export serializes it to StableHLO via jax.export. Outputs mirror the
reference End2End contract: (num_dets [b,1], boxes [b,max_det,4],
scores [b,max_det], classes [b,max_det])."""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from yolov6_tpu.models.effidehead import decode_eval
from yolov6_tpu.ops.nms import non_max_suppression


def make_end2end_fn(
    model,
    variables,
    conf_thres: float = 0.25,
    iou_thres: float = 0.45,
    max_det: int = 100,
    with_preprocess: bool = False,
    half: bool = True,
    weights_as_args: bool = False,
):
    """Build the serving function over uint8/float NHWC images.

    with_preprocess=True folds BGR->RGB + /255 into the graph
    (reference end2end.py:273-275).

    weights_as_args=True builds ``serve(variables, images)`` instead of
    closing over the weights. Closed-over weights embed as HLO constants in
    the traced program — fine (and ~4% faster) for N/S/M/L, but M6/L6-sized
    programs (>500 MB of constants) are rejected by size-capped
    remote-compile paths (measured: HTTP 413 through the axon tunnel,
    docs/Test_speed.md). The argument form keeps the program small and pairs
    with a sidecar weights file at export time."""
    dtype = jnp.bfloat16 if half else jnp.float32

    def _serve(variables, images):
        x = images.astype(dtype)
        if with_preprocess:
            x = x[..., ::-1] / dtype(255.0)  # BGR -> RGB, normalize
        head_out, _ = model.apply(variables, x, train=False)
        preds = decode_eval(
            head_out, model.num_classes, model.strides, model.use_dfl, model.reg_max
        )
        dets, valid = non_max_suppression(
            preds, conf_thres, iou_thres, max_det=max_det, multi_label=False
        )
        num_dets = jnp.sum(valid, axis=1, keepdims=True).astype(jnp.int32)
        return num_dets, dets[..., :4], dets[..., 4], dets[..., 5].astype(jnp.int32)

    if weights_as_args:
        return _serve

    def serve(images):
        return _serve(variables, images)

    return serve


def export_stablehlo(
    serve_fn,
    batch: int,
    img_size: Tuple[int, int],
    path: str,
    platforms: Optional[Tuple[str, ...]] = None,
    input_dtype=jnp.uint8,
    shard_devices: int = 1,
    weights=None,
):
    """Serialize the serving function to a portable StableHLO artifact.

    ``shard_devices > 1`` exports a GSPMD artifact: the batch axis is
    sharded over a 1-D ``data`` mesh of that many devices, so one artifact
    serves a multi-chip batch (XLA partitions the whole graph, NMS
    included — the serving analog of the reference's multi-GPU DDP eval).
    The caller must later invoke it with the batch sharded the same way
    (Evaler.init_artifact does this automatically).

    ``weights`` (a variables pytree) exports the weights-as-arguments form:
    the module takes ``(variables, images)`` and the weights are written to
    a ``<path>.weights.msgpack`` sidecar instead of being embedded as HLO
    constants. Use for M6/L6-sized models where the constant-laden program
    exceeds remote-compile body limits (HTTP 413 through the axon tunnel;
    see docs/Test_speed.md). ``load_serving`` reassembles the pair."""
    from flax import serialization
    from jax import export as jexport

    spec = jax.ShapeDtypeStruct((batch, img_size[0], img_size[1], 3), input_dtype)
    kwargs = {}
    if platforms:
        kwargs["platforms"] = list(platforms)
    fn = jax.jit(serve_fn)
    batch_shd = None
    if shard_devices > 1:
        if batch % shard_devices:
            raise ValueError(f"batch {batch} not divisible by {shard_devices}")
        if len(jax.devices()) < shard_devices:
            raise ValueError(
                f"need {shard_devices} devices to trace the sharded export, "
                f"have {len(jax.devices())}"
            )
        mesh = jax.sharding.Mesh(
            np.asarray(jax.devices()[:shard_devices]), ("data",)
        )
        batch_shd = jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec("data")
        )
    if weights is not None:
        w_spec = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)),
            weights,
        )
        if batch_shd is not None:
            repl = jax.sharding.NamedSharding(
                batch_shd.mesh, jax.sharding.PartitionSpec()
            )
            w_repl = jax.tree_util.tree_map(lambda _: repl, w_spec)
            fn = jax.jit(
                serve_fn, in_shardings=(w_repl, batch_shd), out_shardings=batch_shd
            )
        exported = jexport.export(fn, **kwargs)(w_spec, spec)
        w_np = jax.tree_util.tree_map(np.asarray, weights)
        with open(path + ".weights.msgpack", "wb") as f:
            f.write(serialization.msgpack_serialize(w_np))
    else:
        if batch_shd is not None:
            fn = jax.jit(serve_fn, in_shardings=batch_shd, out_shardings=batch_shd)
        exported = jexport.export(fn, **kwargs)(spec)
    data = exported.serialize()
    with open(path, "wb") as f:
        f.write(data)
    return path


def load_exported(path: str):
    """Deserialize an exported artifact; returns an object with .call(...)."""
    from jax import export as jexport

    with open(path, "rb") as f:
        return jexport.deserialize(bytearray(f.read()))


class _ServingArtifact:
    """A loaded artifact normalized to ``call(images)``, regardless of
    whether the weights are embedded as constants or ride in the
    ``<path>.weights.msgpack`` sidecar (weights-as-arguments export)."""

    def __init__(self, exported, weights=None):
        self.exported = exported
        self.weights = weights
        self.nr_devices = exported.nr_devices
        # the image aval is the last input; with sidecar weights the
        # preceding avals belong to the flattened variables pytree
        self.in_avals = exported.in_avals
        self.out_avals = exported.out_avals

    def call(self, images):
        if self.weights is None:
            return self.exported.call(images)
        return self.exported.call(self.weights, images)


def load_serving(path: str) -> _ServingArtifact:
    """Load an exported serving artifact plus its weights sidecar (if one
    exists). Returns an object with ``.call(images)``."""
    import os

    from flax import serialization

    exported = load_exported(path)
    weights = None
    sidecar = path + ".weights.msgpack"
    if os.path.exists(sidecar):
        with open(sidecar, "rb") as f:
            weights = serialization.msgpack_restore(f.read())
    elif len(exported.in_avals) > 1:
        raise FileNotFoundError(
            f"{path} was exported with weights-as-arguments but the sidecar "
            f"{sidecar} is missing"
        )
    return _ServingArtifact(exported, weights)


def write_native_artifact(
    serve_fn,
    batch: int,
    img_size: Tuple[int, int],
    out_dir: str,
    input_dtype=jnp.uint8,
    meta: Optional[dict] = None,
):
    """Write the artifact directory consumed by the native C++ PJRT runner
    (yolov6_tpu/native/pjrt_runner.cc — the analog of the reference's
    deploy/TensorRT C++ engine file + yolov6.cpp pipeline):

      module.stablehlo.bc   raw versioned-StableHLO bytecode, compilable by
                            any PJRT plugin via PJRT_Client_Compile
      compile_options.pb    serialized xla CompileOptionsProto (1 replica)
      manifest.json         shapes/dtypes + serving parameters
    """
    import json
    import os

    from jax import export as jexport
    from jaxlib import xla_client

    os.makedirs(out_dir, exist_ok=True)
    spec = jax.ShapeDtypeStruct((batch, img_size[0], img_size[1], 3), input_dtype)
    exported = jexport.export(jax.jit(serve_fn))(spec)
    with open(os.path.join(out_dir, "module.stablehlo.bc"), "wb") as f:
        f.write(exported.mlir_module_serialized)
    with open(os.path.join(out_dir, "compile_options.pb"), "wb") as f:
        f.write(xla_client.CompileOptions().SerializeAsString())

    def aval_entry(a):
        return {"shape": list(a.shape), "dtype": str(a.dtype)}

    manifest = {
        "format": "stablehlo-bytecode",
        "module": "module.stablehlo.bc",
        "compile_options": "compile_options.pb",
        "input": aval_entry(exported.in_avals[0]),
        "outputs": [aval_entry(a) for a in exported.out_avals],
        "img_size": list(img_size),
        "batch": batch,
    }
    manifest.update(meta or {})
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    return out_dir
