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
):
    """Build the serving function over uint8/float NHWC images.

    with_preprocess=True folds BGR->RGB + /255 into the graph
    (reference end2end.py:273-275)."""
    dtype = jnp.bfloat16 if half else jnp.float32

    def serve(images):
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

    return serve


def export_stablehlo(
    serve_fn,
    batch: int,
    img_size: Tuple[int, int],
    path: str,
    platforms: Optional[Tuple[str, ...]] = None,
    input_dtype=jnp.uint8,
    shard_devices: int = 1,
):
    """Serialize the serving function to a portable StableHLO artifact.

    ``shard_devices > 1`` exports a GSPMD artifact: the batch axis is
    sharded over a 1-D ``data`` mesh of that many devices, so one artifact
    serves a multi-chip batch (XLA partitions the whole graph, NMS
    included — the serving analog of the reference's multi-GPU DDP eval).
    The caller must later invoke it with the batch sharded the same way
    (Evaler.init_artifact does this automatically)."""
    from jax import export as jexport

    spec = jax.ShapeDtypeStruct((batch, img_size[0], img_size[1], 3), input_dtype)
    kwargs = {}
    if platforms:
        kwargs["platforms"] = list(platforms)
    fn = jax.jit(serve_fn)
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
        fn = jax.jit(serve_fn, in_shardings=batch_shd, out_shardings=batch_shd)
    exported = jexport.export(fn, **kwargs)(spec)
    data = exported.serialize()
    with open(path, "wb") as f:
        f.write(data)
    return path


def load_exported(path: str):
    """Deserialize an exported artifact; returns an object with .call(images)."""
    from jax import export as jexport

    with open(path, "rb") as f:
        return jexport.deserialize(bytearray(f.read()))


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
