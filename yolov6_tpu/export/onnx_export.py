"""jaxpr -> ONNX graph converter.

Exports any jit-traceable deploy function (fwd+decode of every model family,
static shapes) to an ONNX file with zero vendor dependencies — the protobuf
serialization is hand-rolled in onnx_proto.py. This fills the reference's
primary deploy interchange (reference: deploy/ONNX/export_onnx.py, which
calls torch.onnx.export); instead of re-tracing a torch twin of the model we
convert the *same* JAX graph that serves on TPU, so ONNX output is
definitionally in sync with the TPU graph.

Design notes:
- The converter walks the closed jaxpr, inlining pjit/custom_jvp/remat call
  primitives, and maps each lax primitive to ONNX ops (opset 13).
- JAX convolutions are NHWC; ONNX Conv/MaxPool are NCHW. Each conv/pool is
  wrapped in boundary Transposes; a peephole cancels inverse-Transpose pairs
  and dead nodes are pruned, so chains of convs carry no redundant layout
  ops (consumers like TensorRT fold any that remain).
- Constants (folded weights) become initializers; weight tensors feeding a
  conv are pre-transposed host-side to OIHW.
- Execution parity vs the JAX function is tested with the in-repo numpy
  ONNX interpreter (export/onnx_numpy.py, tests/test_onnx_export.py).

Supported primitive set covers the deploy graphs of all families (rep/CSP/
MBLA/P6/lite + DFL decode); unknown primitives raise with the primitive
name so gaps are loud.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from yolov6_tpu.export import onnx_proto as op


class _Builder:
    def __init__(self):
        self.nodes: List[op.Node] = []
        self.initializers: Dict[str, op.Tensor] = {}
        self._n = 0
        self._const_cache: Dict[tuple, str] = {}
        self.produced_by: Dict[str, op.Node] = {}
        self.n_consumers: Dict[str, int] = {}

    def name(self, hint: str = "t") -> str:
        self._n += 1
        return f"{hint}_{self._n}"

    def emit(self, op_type: str, inputs: Sequence[str], n_out: int = 1,
             hint: Optional[str] = None, domain: str = "", **attrs) -> List[str]:
        outs = [self.name(hint or op_type.lower()) for _ in range(n_out)]
        node = op.Node(op_type, list(inputs), outs, name=outs[0], attrs=attrs,
                       domain=domain)
        self.nodes.append(node)
        for i in inputs:
            self.n_consumers[i] = self.n_consumers.get(i, 0) + 1
        for o in outs:
            self.produced_by[o] = node
        return outs

    def const(self, arr: np.ndarray, hint: str = "c") -> str:
        arr = np.asarray(arr)
        if arr.dtype == np.float64:
            arr = arr.astype(np.float32)
        key = (str(arr.dtype), arr.shape, arr.tobytes())
        if key in self._const_cache:
            return self._const_cache[key]
        name = self.name(hint)
        self.initializers[name] = op.Tensor(name, arr)
        self._const_cache[key] = name
        return name

    def transpose(self, x: str, perm: Sequence[int]) -> str:
        """Emit Transpose, cancelling an immediately-preceding inverse."""
        perm = list(int(p) for p in perm)
        if perm == sorted(perm):
            return x
        prev = self.produced_by.get(x)
        if prev is not None and prev.op_type == "Transpose":
            prev_perm = list(prev.attrs["perm"])
            composed = [prev_perm[p] for p in perm]
            if composed == sorted(composed):
                return prev.inputs[0]
            return self.emit("Transpose", [prev.inputs[0]], perm=composed)[0]
        return self.emit("Transpose", [x], perm=perm)[0]

    def reshape(self, x: str, shape: Sequence[int]) -> str:
        s = self.const(np.asarray(shape, np.int64), "shape")
        return self.emit("Reshape", [x, s])[0]


def _np_dtype(aval) -> np.dtype:
    name = np.dtype(aval.dtype).name
    if name in ("bfloat16", "float64"):  # ONNX deploy graphs ship fp32
        return np.dtype(np.float32)
    return np.dtype(aval.dtype)


def _to_np(x) -> np.ndarray:
    a = np.asarray(x)
    if a.dtype.name == "bfloat16":
        a = a.astype(np.float32)
    if a.dtype == np.float64:
        a = a.astype(np.float32)
    return a


class _Converter:
    def __init__(self, builder: _Builder):
        self.b = builder

    # --- environment handling -------------------------------------------
    def run(self, jaxpr, consts, in_names: List[str]) -> List[str]:
        env: Dict[object, str] = {}

        def read(var) -> str:
            if hasattr(var, "val"):  # Literal
                return self.b.const(_to_np(var.val), "lit")
            return env[var]

        def write(var, name: str):
            if type(var).__name__ == "DropVar":
                return
            env[var] = name

        for var, const in zip(jaxpr.constvars, consts):
            env[var] = self.b.const(_to_np(const), "w")
        for var, name in zip(jaxpr.invars, in_names):
            env[var] = name

        # var use-counts, strictly PER SCOPE: jax shares sub-jaxpr objects
        # across repeated inlinings (identical blocks), so a global count
        # would inflate shared vars and defeat the single-consumer
        # peepholes (conv-bias fusion, clip composition)
        prev_uses = getattr(self, "_uses", None)
        uses = self._uses = {}
        for eqn_ in jaxpr.eqns:
            for v in eqn_.invars:
                if not hasattr(v, "val"):
                    uses[v] = uses.get(v, 0) + 1
        for v in jaxpr.outvars:
            if not hasattr(v, "val"):
                uses[v] = uses.get(v, 0) + 1
        try:
            return self._run_eqns(jaxpr, read, write)
        finally:
            self._uses = prev_uses

    def _run_eqns(self, jaxpr, read, write):
        for eqn in jaxpr.eqns:
            prim = eqn.primitive.name
            # call-like primitives: inline
            sub = None
            if prim in ("pjit", "jit", "closed_call", "core_call",
                        "remat", "remat2", "checkpoint", "custom_jvp_call",
                        "custom_vjp_call", "custom_jvp_call_jaxpr",
                        "custom_vjp_call_jaxpr"):
                sub = eqn.params.get("jaxpr") or eqn.params.get("call_jaxpr")
            if sub is not None:
                if hasattr(sub, "jaxpr"):  # ClosedJaxpr
                    sub_jaxpr, sub_consts = sub.jaxpr, sub.consts
                else:
                    sub_jaxpr, sub_consts = sub, []
                # custom_* pass extra leading args (num_consts) — the inner
                # jaxpr's invars count is authoritative; take the LAST n args
                args = [read(v) for v in eqn.invars]
                n_in = len(sub_jaxpr.invars)
                outs = self.run(sub_jaxpr, sub_consts, args[len(args) - n_in:])
                for var, name in zip(eqn.outvars, outs):
                    write(var, name)
                continue
            handler = getattr(self, f"_op_{prim}", None)
            if handler is None:
                raise NotImplementedError(
                    f"ONNX export: unsupported primitive '{prim}' "
                    f"(shapes {[getattr(v.aval, 'shape', None) for v in eqn.invars]})"
                )
            outs = handler(eqn, [read(v) for v in eqn.invars])
            if isinstance(outs, str):
                outs = [outs]
            for var, name in zip(eqn.outvars, outs):
                write(var, name)
        return [read(v) for v in jaxpr.outvars]

    # --- elementwise ------------------------------------------------------
    def _binop(self, onnx_op, args, eqn=None):
        if eqn is not None:
            args = [self._squeeze_const_ones(a, eqn, i) for i, a in enumerate(args)]
        return self.b.emit(onnx_op, args)[0]

    def _squeeze_const_ones(self, name, eqn, idx):
        """Drop leading 1-dims from a constant binop operand: ``(1,..,1,C)``
        and ``(C,)`` broadcast identically in ONNX, but NCHW-centric eltwise
        importers (OpenCV <= 4.6) only accept the trailing 1-D form. Safe
        only when it cannot reduce the output rank (the OTHER operand
        carries the full rank)."""
        out_rank = len(eqn.outvars[0].aval.shape)
        other_full = any(
            len(getattr(v.aval, "shape", ())) == out_rank
            for j, v in enumerate(eqn.invars)
            if j != idx and not hasattr(v, "val")
        )
        if not other_full:
            return name
        arr = self._const_chain(name)
        if arr is None or arr.ndim <= 1:
            return name
        sq = arr
        while sq.ndim > 1 and sq.shape[0] == 1:
            sq = sq[0]
        if sq.shape == arr.shape:
            return name
        return self.b.const(np.ascontiguousarray(sq), "c")

    def _op_add(self, eqn, args):
        fused = self._fuse_conv_bias(eqn, args)
        if fused is not None:
            return fused
        return self._binop("Add", args, eqn)

    def _fuse_conv_bias(self, eqn, args):
        """Fold ``Transpose(Conv(x, w)) + bias_const`` into the Conv node's
        optional B input. A per-channel bias broadcast over an NHWC tensor
        trips NCHW-centric eltwise importers (OpenCV <= 4.6), and the fused
        form is simply a smaller graph for every consumer. Only applied
        when the conv activation has no other consumer."""
        for i in (0, 1):
            bias = self._const_chain(args[i])
            if bias is None:
                continue
            other_var = eqn.invars[1 - i]
            if hasattr(other_var, "val") or self._uses.get(other_var, 0) != 1:
                continue
            node = self.b.produced_by.get(args[1 - i])
            if node is None or node.op_type != "Transpose":
                continue
            # _uses is per-jaxpr-scope; a value produced inside an inlined
            # sub-jaxpr may already have emitted consumers this scope never
            # counted. Require graph-level fan-out: no node consumes the
            # Transpose output yet (this Add is its only pending use), and
            # the Conv output feeds only the Transpose.
            if self.b.n_consumers.get(args[1 - i], 0) != 0:
                continue
            if list(node.attrs["perm"])[-1] != 1:  # channels must land last
                continue
            conv = self.b.produced_by.get(node.inputs[0])
            if conv is None or conv.op_type != "Conv" or len(conv.inputs) != 2:
                continue
            if self.b.n_consumers.get(node.inputs[0], 0) != 1:
                continue
            out_shape = eqn.outvars[0].aval.shape
            c = int(out_shape[-1])
            b_ = np.asarray(bias)
            if b_.size != c or b_.squeeze().ndim > 1:
                continue
            conv.inputs = list(conv.inputs) + [
                self.b.const(b_.reshape(-1).astype(b_.dtype), "bias")
            ]
            return args[1 - i]
        return None

    def _op_sub(self, eqn, args):
        return self._binop("Sub", args, eqn)

    def _op_mul(self, eqn, args):
        return self._binop("Mul", args, eqn)

    def _op_div(self, eqn, args):
        return self._binop("Div", args, eqn)

    def _scalar_const(self, name):
        arr = self._const_chain(name)
        if arr is not None and arr.ndim == 0:
            return arr
        return None

    def _op_max(self, eqn, args):
        # max(x, 0) is Relu, max(x, c) is Clip(min=c) — friendlier to
        # consumers than const-operand eltwise Max (OpenCV <= 4.6 rejects it)
        for i in (0, 1):
            c = self._scalar_const(args[i])
            if c is None:
                continue
            if c == 0:
                return self.b.emit("Relu", [args[1 - i]])[0]
            return self._clip(eqn, args[1 - i], eqn.invars[1 - i], lo=c)
        return self._binop("Max", args)

    def _op_min(self, eqn, args):
        # min(x, c) is Clip(max=c) (e.g. the relu6 in lite hard-swish)
        for i in (0, 1):
            c = self._scalar_const(args[i])
            if c is None:
                continue
            return self._clip(eqn, args[1 - i], eqn.invars[1 - i], hi=c)
        return self._binop("Min", args)

    def _clip(self, eqn, x, x_var, lo=None, hi=None):
        """Clip with BOTH bounds present (OpenCV 4.6's parseClip rejects a
        missing bound); the absent side becomes the dtype's finite extreme.
        Consecutive clamps (min(max(x, lo), hi) — relu6, fake-quant) compose
        into ONE Clip by tightening bounds."""
        dt = _np_dtype(eqn.outvars[0].aval)
        info = np.finfo(dt) if dt.kind == "f" else np.iinfo(dt)
        lo_v = float(lo) if lo is not None else float(info.min)
        hi_v = float(hi) if hi is not None else float(info.max)
        prev = self.b.produced_by.get(x)
        if (
            prev is not None and prev.op_type == "Clip"
            and len(prev.inputs) == 3
            and not hasattr(x_var, "val")
            and self._uses.get(x_var, 0) == 1
        ):
            plo = self._scalar_const(prev.inputs[1])
            phi = self._scalar_const(prev.inputs[2])
            if plo is not None and phi is not None:
                clo = max(lo_v, float(plo))
                chi = min(hi_v, float(phi))
                # Disjoint ranges don't compose: Clip(Clip(x,0,6),10,inf)=10
                # but Clip(x,10,6)=6 under min(max(..)) semantics.
                if clo <= chi:
                    lo_v, hi_v = clo, chi
                    x = prev.inputs[0]
        return self.b.emit(
            "Clip",
            [x, self.b.const(np.asarray(lo_v, dt), "clip"),
             self.b.const(np.asarray(hi_v, dt), "clip")],
        )[0]

    def _op_pow(self, eqn, args):
        return self._binop("Pow", args)

    def _op_rem(self, eqn, args):
        return self._binop("Mod", args)

    def _op_logistic(self, eqn, args):
        return self.b.emit("Sigmoid", args)[0]

    def _op_exp(self, eqn, args):
        return self.b.emit("Exp", args)[0]

    def _op_log(self, eqn, args):
        return self.b.emit("Log", args)[0]

    def _op_tanh(self, eqn, args):
        return self.b.emit("Tanh", args)[0]

    def _op_sqrt(self, eqn, args):
        return self.b.emit("Sqrt", args)[0]

    def _op_rsqrt(self, eqn, args):
        s = self.b.emit("Sqrt", args)[0]
        return self.b.emit("Reciprocal", [s])[0]

    def _op_neg(self, eqn, args):
        return self.b.emit("Neg", args)[0]

    def _op_abs(self, eqn, args):
        return self.b.emit("Abs", args)[0]

    def _op_sign(self, eqn, args):
        return self.b.emit("Sign", args)[0]

    def _op_floor(self, eqn, args):
        return self.b.emit("Floor", args)[0]

    def _op_ceil(self, eqn, args):
        return self.b.emit("Ceil", args)[0]

    def _op_round(self, eqn, args):
        return self.b.emit("Round", args)[0]

    def _op_erf(self, eqn, args):
        return self.b.emit("Erf", args)[0]

    def _op_integer_pow(self, eqn, args):
        y = eqn.params["y"]
        if y == 2:
            return self.b.emit("Mul", [args[0], args[0]])[0]
        e = self.b.const(np.asarray(float(y), np.float32))
        return self.b.emit("Pow", [args[0], e])[0]

    def _op_square(self, eqn, args):
        return self.b.emit("Mul", [args[0], args[0]])[0]

    def _op_clamp(self, eqn, args):
        lo, x, hi = args  # lax.clamp(min, operand, max)
        return self.b.emit("Clip", [x, lo, hi])[0]

    def _op_stop_gradient(self, eqn, args):
        return args[0]

    def _op_copy(self, eqn, args):
        return args[0]

    def _op_device_put(self, eqn, args):
        return args[0]

    def _op_convert_element_type(self, eqn, args):
        dst = _np_dtype(eqn.outvars[0].aval)
        src = _np_dtype(eqn.invars[0].aval)
        if dst == src:
            return args[0]
        return self.b.emit("Cast", args, to=int(op.NP_TO_ONNX[dst]))[0]

    # --- comparisons / logic ---------------------------------------------
    def _op_eq(self, eqn, args):
        return self.b.emit("Equal", args)[0]

    def _op_ne(self, eqn, args):
        e = self.b.emit("Equal", args)[0]
        return self.b.emit("Not", [e])[0]

    def _op_lt(self, eqn, args):
        return self.b.emit("Less", args)[0]

    def _op_le(self, eqn, args):
        return self.b.emit("LessOrEqual", args)[0]

    def _op_gt(self, eqn, args):
        return self.b.emit("Greater", args)[0]

    def _op_ge(self, eqn, args):
        return self.b.emit("GreaterOrEqual", args)[0]

    def _op_and(self, eqn, args):
        return self.b.emit("And", args)[0]

    def _op_or(self, eqn, args):
        return self.b.emit("Or", args)[0]

    def _op_not(self, eqn, args):
        return self.b.emit("Not", args)[0]

    def _op_select_n(self, eqn, args):
        if len(args) != 3:
            raise NotImplementedError("select_n with >2 cases")
        pred, case0, case1 = args  # case1 taken where pred is True
        return self.b.emit("Where", [pred, case1, case0])[0]

    # --- shape ops ---------------------------------------------------------
    def _op_reshape(self, eqn, args):
        if eqn.params.get("dimensions") is not None:
            x = self.b.transpose(args[0], eqn.params["dimensions"])
        else:
            x = args[0]
        return self.b.reshape(x, eqn.params["new_sizes"])

    def _op_squeeze(self, eqn, args):
        return self.b.reshape(args[0], eqn.outvars[0].aval.shape)

    def _op_expand_dims(self, eqn, args):
        return self.b.reshape(args[0], eqn.outvars[0].aval.shape)

    def _op_transpose(self, eqn, args):
        return self.b.transpose(args[0], eqn.params["permutation"])

    def _op_broadcast_in_dim(self, eqn, args):
        shape = [int(s) for s in eqn.params["shape"]]
        bdims = eqn.params["broadcast_dimensions"]
        in_shape = eqn.invars[0].aval.shape
        mid = [1] * len(shape)
        for src_axis, dst_axis in enumerate(bdims):
            mid[dst_axis] = int(in_shape[src_axis])
        x = args[0]
        if list(in_shape) != mid:
            x = self.b.reshape(x, mid)
        if mid != shape:
            s = self.b.const(np.asarray(shape, np.int64), "shape")
            x = self.b.emit("Expand", [x, s])[0]
        return x

    def _op_concatenate(self, eqn, args):
        return self.b.emit("Concat", args, axis=int(eqn.params["dimension"]))[0]

    def _op_split(self, eqn, args):
        sizes = [int(s) for s in eqn.params["sizes"]]
        axis = int(eqn.params["axis"])
        s = self.b.const(np.asarray(sizes, np.int64), "split")
        return self.b.emit("Split", [args[0], s], n_out=len(sizes), axis=axis)

    def _op_slice(self, eqn, args):
        starts = [int(s) for s in eqn.params["start_indices"]]
        ends = [int(s) for s in eqn.params["limit_indices"]]
        strides = eqn.params.get("strides")
        steps = [1] * len(starts) if strides is None else [int(s) for s in strides]
        axes = list(range(len(starts)))
        return self.b.emit(
            "Slice",
            [
                args[0],
                self.b.const(np.asarray(starts, np.int64)),
                self.b.const(np.asarray(ends, np.int64)),
                self.b.const(np.asarray(axes, np.int64)),
                self.b.const(np.asarray(steps, np.int64)),
            ],
        )[0]

    def _op_rev(self, eqn, args):
        # reverse along dims = Slice with negative steps
        nd = len(eqn.invars[0].aval.shape)
        dims = [int(d) for d in eqn.params["dimensions"]]
        starts = [-1] * len(dims)
        ends = [np.iinfo(np.int64).min] * len(dims)
        steps = [-1] * len(dims)
        return self.b.emit(
            "Slice",
            [
                args[0],
                self.b.const(np.asarray(starts, np.int64)),
                self.b.const(np.asarray(ends, np.int64)),
                self.b.const(np.asarray(dims, np.int64)),
                self.b.const(np.asarray(steps, np.int64)),
            ],
        )[0]

    def _op_pad(self, eqn, args):
        cfg = eqn.params["padding_config"]
        if any(i != 0 for _, _, i in cfg):
            raise NotImplementedError("interior padding")
        x = args[0]
        if any(lo < 0 or hi < 0 for lo, hi, _ in cfg):
            # negative padding = crop: express as a Slice first
            shape = eqn.invars[0].aval.shape
            starts = [max(0, -lo) for lo, _, _ in cfg]
            ends = [int(d) - max(0, -hi) for d, (_, hi, _) in zip(shape, cfg)]
            x = self.b.emit(
                "Slice",
                [
                    x,
                    self.b.const(np.asarray(starts, np.int64)),
                    self.b.const(np.asarray(ends, np.int64)),
                ],
            )[0]
            cfg = [(max(0, lo), max(0, hi), 0) for lo, hi, _ in cfg]
        if all(lo == 0 and hi == 0 for lo, hi, _ in cfg):
            return x
        pads = [lo for lo, _, _ in cfg] + [hi for _, hi, _ in cfg]
        return self.b.emit(
            "Pad", [x, self.b.const(np.asarray(pads, np.int64)), args[1]]
        )[0]

    def _op_iota(self, eqn, args):
        shape = tuple(int(s) for s in eqn.params["shape"])
        dim = int(eqn.params["dimension"])
        dt = _np_dtype(eqn.outvars[0].aval)
        vec = np.arange(shape[dim], dtype=dt)
        arr = np.broadcast_to(
            vec.reshape([-1 if i == dim else 1 for i in range(len(shape))]), shape
        ).copy()
        return self.b.const(arr, "iota")

    # --- reductions ---------------------------------------------------------
    def _reduce(self, onnx_op, eqn, args):
        axes = [int(a) for a in eqn.params["axes"]]
        if onnx_op == "ReduceSum":  # axes moved to an input at opset 13
            a = self.b.const(np.asarray(axes, np.int64), "axes")
            return self.b.emit(onnx_op, [args[0], a], keepdims=0)[0]
        return self.b.emit(onnx_op, args, axes=axes, keepdims=0)[0]

    def _op_reduce_max(self, eqn, args):
        return self._reduce("ReduceMax", eqn, args)

    def _op_reduce_min(self, eqn, args):
        return self._reduce("ReduceMin", eqn, args)

    def _op_reduce_sum(self, eqn, args):
        return self._reduce("ReduceSum", eqn, args)

    def _op_argmax(self, eqn, args):
        axes = eqn.params["axes"]
        if len(axes) != 1:
            raise NotImplementedError("argmax over multiple axes")
        out = self.b.emit("ArgMax", args, axis=int(axes[0]), keepdims=0)[0]
        dst = _np_dtype(eqn.outvars[0].aval)
        if dst != np.dtype(np.int64):
            out = self.b.emit("Cast", [out], to=int(op.NP_TO_ONNX[dst]))[0]
        return out

    # --- matmul / conv / pool ------------------------------------------------
    def _const_chain(self, name, depth: int = 6):
        """Resolve `name` to a numpy array if it is an initializer or a
        Transpose/Reshape/Identity chain over one (else None)."""
        if name in self.b.initializers:
            return _to_np(self.b.initializers[name].array)
        if depth == 0:
            return None
        node = self.b.produced_by.get(name)
        if node is None:
            return None
        if node.op_type == "Identity":
            return self._const_chain(node.inputs[0], depth - 1)
        if node.op_type == "Transpose":
            arr = self._const_chain(node.inputs[0], depth - 1)
            return None if arr is None else np.transpose(arr, node.attrs["perm"])
        if node.op_type == "Reshape":
            arr = self._const_chain(node.inputs[0], depth - 1)
            shape = self._const_chain(node.inputs[1], depth - 1)
            if arr is None or shape is None:
                return None
            return arr.reshape([int(s) for s in shape])
        return None

    def _op_dot_general(self, eqn, args):
        (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
        if lb or rb:
            raise NotImplementedError("batched dot_general")
        if len(lc) != 1 or len(rc) != 1:
            raise NotImplementedError("multi-dim contraction")
        lhs_aval, rhs_aval = eqn.invars[0].aval, eqn.invars[1].aval
        lnd, rnd = len(lhs_aval.shape), len(rhs_aval.shape)
        lperm = [i for i in range(lnd) if i != lc[0]] + [lc[0]]
        rperm = [rc[0]] + [i for i in range(rnd) if i != rc[0]]
        lhs = self.b.transpose(args[0], lperm)
        rhs = self.b.transpose(args[1], rperm)
        if rnd > 2 or rnd == 1:
            # 2-D-ify the RHS: >2-D flattens free dims; 1-D (e.g. the DFL
            # projection vector) becomes a [k, 1] column — MatMul layers in
            # some runtimes (OpenCV dnn) require rank >= 2 weights
            k = int(rhs_aval.shape[rc[0]])
            rhs = self.b.reshape(rhs, (k, -1))
        out_shape = tuple(int(s) for s in eqn.outvars[0].aval.shape)
        lhs_const = self._const_chain(args[0])
        if lhs_const is not None and self._const_chain(args[1]) is None:
            # constant-LHS MatMul trips older importers (OpenCV <= 4.6 dnn
            # supports only a constant RHS, parseMatMul): fold the lhs
            # permutation in numpy and emit the transposed product
            # L·R = (Rᵀ·Lᵀ)ᵀ with Lᵀ a plain [k, M] weight initializer.
            L = np.transpose(lhs_const, lperm)
            k = L.shape[-1]
            lt = self.b.const(np.ascontiguousarray(L.reshape(-1, k).T), "wT")
            r2 = self.b.transpose(rhs, [1, 0])          # [n, k]
            out = self.b.emit("MatMul", [r2, lt])[0]    # [n, M]
            out = self.b.transpose(out, [1, 0])         # [M, n]
            return self.b.reshape(out, out_shape)
        out = self.b.emit("MatMul", [lhs, rhs])[0]
        if rnd > 2 or rnd == 1 or len(out_shape) < 2:
            out = self.b.reshape(out, out_shape)
        return out

    def _op_conv_general_dilated(self, eqn, args):
        p = eqn.params
        dn = p["dimension_numbers"]
        lhs_spec, rhs_spec, out_spec = dn.lhs_spec, dn.rhs_spec, dn.out_spec
        if any(d != 1 for d in p["lhs_dilation"]):
            raise NotImplementedError("lhs-dilated (transposed) convolution")
        # transpose input to NCHW order given by lhs_spec
        x = self.b.transpose(args[0], lhs_spec)
        # weights to OIHW: rhs_spec = (out_dim, in_dim, *spatial)
        w_name = args[1]
        if w_name in self.b.initializers and list(rhs_spec) != list(
            range(len(rhs_spec))
        ):
            w = self.b.initializers[w_name].array
            w_name = self.b.const(np.ascontiguousarray(np.transpose(w, rhs_spec)), "w")
        elif list(rhs_spec) != list(range(len(rhs_spec))):
            w_name = self.b.transpose(w_name, rhs_spec)
        pads = [int(lo) for lo, _ in p["padding"]] + [int(hi) for _, hi in p["padding"]]
        # kernel_shape is redundant with the weight tensor but old importers
        # (e.g. OpenCV 4.6's dnn) refuse Conv nodes without it
        w_shape = eqn.invars[1].aval.shape
        kernel_shape = [int(w_shape[rhs_spec[i]]) for i in range(2, len(w_shape))]
        out = self.b.emit(
            "Conv",
            [x, w_name],
            kernel_shape=kernel_shape,
            strides=[int(s) for s in p["window_strides"]],
            pads=pads,
            dilations=[int(d) for d in p["rhs_dilation"]],
            group=int(p["feature_group_count"]),
        )[0]
        # out_spec maps NC<spatial> -> actual layout: invert it
        inv = list(np.argsort(out_spec))
        return self.b.transpose(out, inv)

    def _op_reduce_window_max(self, eqn, args):
        p = eqn.params
        wd = [int(d) for d in p["window_dimensions"]]
        ws = [int(s) for s in p["window_strides"]]
        pad = [(int(lo), int(hi)) for lo, hi in p["padding"]]
        if any(d != 1 for d in p.get("base_dilation", [1])) or any(
            d != 1 for d in p.get("window_dilation", [1])
        ):
            raise NotImplementedError("dilated pooling")
        # identify spatial dims (window > 1 or stride > 1); require N/C windows 1
        spatial = [i for i in range(len(wd)) if wd[i] != 1 or ws[i] != 1 or pad[i] != (0, 0)]
        if not spatial:
            spatial = [1, 2]  # degenerate 1x1 pool
        passive = [i for i in range(len(wd)) if i not in spatial]
        if len(passive) != 2:
            raise NotImplementedError(f"unsupported pooling layout {wd}")
        perm = passive + spatial  # [N, C, *spatial]
        x = self.b.transpose(args[0], perm)
        out = self.b.emit(
            "MaxPool",
            [x],
            kernel_shape=[wd[i] for i in spatial],
            strides=[ws[i] for i in spatial],
            pads=[pad[i][0] for i in spatial] + [pad[i][1] for i in spatial],
        )[0]
        return self.b.transpose(out, list(np.argsort(perm)))


def _append_ort_nms(
    builder: _Builder,
    pred: str,
    batch: int,
    nc: int,
    max_obj: int,
    iou_thres: float,
    score_thres: float,
) -> List[str]:
    """Append the reference's ORT end2end tail to the graph: standard
    NonMaxSuppression + gather/sort ops turning ``pred`` [b, A, 5+nc]
    (xywh, obj, cls) into (num_det [b,1], det_boxes [b,S,4], det_scores
    [b,S], det_classes [b,S]) with S dynamic, score-sorted, zero/-1 padded
    — byte-for-byte the reference ONNX_ORT contract
    (reference: yolov6/models/end2end.py:140-189)."""
    b = builder
    i64 = lambda v: b.const(np.asarray(v, np.int64))  # noqa: E731
    nms_box, score = _split_pred(b, pred, nc, to_xyxy=True)  # [b,A,4] xyxy
    nms_score = b.transpose(score, (0, 2, 1))          # [b,nc,A]
    selected = b.emit(
        "NonMaxSuppression",
        [
            nms_box,
            nms_score,
            i64([max_obj]),
            b.const(np.asarray([iou_thres], np.float32)),
            b.const(np.asarray([score_thres], np.float32)),
        ],
        hint="nms",
    )[0]  # [S,3] int64 (batch, class, box)

    def sel_col(lo, hi):
        c = b.emit("Slice", [selected, i64([lo]), i64([hi]), i64([1])])[0]
        return c  # [S,1]

    batch_inds, cls_inds, box_inds = sel_col(0, 1), sel_col(1, 2), sel_col(2, 3)
    sel_score = b.emit("GatherND", [nms_score, selected])[0]        # [S]
    bb_idx = b.emit("Concat", [batch_inds, box_inds], axis=1)[0]    # [S,2]
    sel_box = b.emit("GatherND", [nms_box, bb_idx])[0]              # [S,4]
    sel_score2 = b.emit("Unsqueeze", [sel_score, i64([1])])[0]      # [S,1]
    dets = b.emit("Concat", [sel_box, sel_score2], axis=1)[0]       # [S,5]

    # batched_dets[bi] = dets where batch_inds == bi else 0
    dets_u = b.emit("Unsqueeze", [dets, i64([0])])[0]               # [1,S,5]
    s5 = b.emit("Shape", [dets])[0]                                  # [S,5]
    bshape = b.emit("Concat", [i64([batch]), s5], axis=0)[0]        # [b,S,5]
    batched = b.emit("Expand", [dets_u, bshape])[0]                 # [b,S,5]
    binds_t = b.transpose(batch_inds, (1, 0))                       # [1,S]
    btmpl = b.const(np.arange(batch, dtype=np.int64)[:, None], "batch_ids")
    in_batch = b.emit("Equal", [binds_t, btmpl])[0]                 # [b,S]
    in_batch3 = b.emit("Unsqueeze", [in_batch, i64([2])])[0]        # [b,S,1]
    zero = b.const(np.asarray(0.0, np.float32))
    batched = b.emit("Where", [in_batch3, batched, zero])[0]
    labels_t = b.transpose(cls_inds, (1, 0))                        # [1,S]
    sl = b.emit("Shape", [labels_t])[0]
    lshape = b.emit(
        "Concat", [i64([batch]), b.emit("Slice", [sl, i64([1]), i64([2])])[0]],
        axis=0,
    )[0]
    blabels = b.emit("Expand", [labels_t, lshape])[0]               # [b,S]
    neg1 = b.const(np.asarray(-1, np.int64))
    blabels = b.emit("Where", [in_batch, blabels, neg1])[0]

    # append one all-zero det / -1 label per image (keeps TopK non-empty
    # and terminates the valid prefix), then sort by score descending
    pad_d = b.const(np.zeros((batch, 1, 5), np.float32), "pad_det")
    pad_l = b.const(np.full((batch, 1), -1, np.int64), "pad_label")
    batched = b.emit("Concat", [batched, pad_d], axis=1)[0]         # [b,S+1,5]
    blabels = b.emit("Concat", [blabels, pad_l], axis=1)[0]         # [b,S+1]
    scores_col = b.emit(
        "Slice", [batched, i64([4]), i64([5]), i64([2])]
    )[0]                                                            # [b,S+1,1]
    scores2d = b.emit("Squeeze", [scores_col, i64([2])])[0]         # [b,S+1]
    k = b.emit(
        "Gather", [b.emit("Shape", [scores2d])[0], i64(1)], axis=0, hint="k"
    )[0]
    k1 = b.emit("Unsqueeze", [k, i64([0])])[0]
    _, topk_inds = b.emit("TopK", [scores2d, k1], n_out=2, axis=1,
                          largest=1, sorted=1)
    det_scores = b.emit("GatherElements", [scores2d, topk_inds], axis=1)[0]
    det_classes = b.emit("GatherElements", [blabels, topk_inds], axis=1)[0]
    ti3 = b.emit("Unsqueeze", [topk_inds, i64([2])])[0]             # [b,S+1,1]
    s3 = b.emit("Shape", [batched])[0]
    ti3e = b.emit(
        "Expand",
        [ti3, b.emit("Concat",
                     [b.emit("Slice", [s3, i64([0]), i64([2])])[0], i64([5])],
                     axis=0)[0]],
    )[0]
    sorted_dets = b.emit("GatherElements", [batched, ti3e], axis=1)[0]
    det_boxes = b.emit("Slice", [sorted_dets, i64([0]), i64([4]), i64([2])])[0]
    pos = b.emit("Greater", [det_scores, zero])[0]
    pos_i = b.emit("Cast", [pos], to=int(op.NP_TO_ONNX[np.dtype(np.int64)]))[0]
    num_det = b.emit("ReduceSum", [pos_i, i64([1])], keepdims=1)[0]  # [b,1]
    return [num_det, det_boxes, det_scores, det_classes]


def _split_pred(builder: _Builder, pred: str, nc: int, to_xyxy: bool):
    """Common head of every end2end tail: split [b,A,5+nc] into boxes and
    per-class scores (cls*obj); optionally xywh->xyxy via the reference's
    4x4 convert matrix (reference: yolov6/models/end2end.py:149-160)."""
    b = builder
    i64 = lambda v: b.const(np.asarray(v, np.int64))  # noqa: E731

    def col_slice(x, lo, hi, axis=2):
        return b.emit("Slice", [x, i64([lo]), i64([hi]), i64([axis])])[0]

    box = col_slice(pred, 0, 4)          # [b,A,4] xywh
    conf = col_slice(pred, 4, 5)         # [b,A,1]
    cls = col_slice(pred, 5, 5 + nc)     # [b,A,nc]
    score = b.emit("Mul", [cls, conf])[0]
    if to_xyxy:
        cm = b.const(
            np.array(
                [[1, 0, 1, 0], [0, 1, 0, 1], [-0.5, 0, 0.5, 0], [0, -0.5, 0, 0.5]],
                np.float32,
            ),
            "convert_matrix",
        )
        box = b.emit("MatMul", [box, cm])[0]           # [b,A,4] xyxy
    return box, score


def _append_trt8_nms(
    builder: _Builder,
    pred: str,
    nc: int,
    max_obj: int,
    iou_thres: float,
    score_thres: float,
) -> List[str]:
    """Append the TensorRT>=8 ``EfficientNMS_TRT`` plugin node (domain TRT).

    Matches the reference's exported op + attribute layout byte-for-byte:
    boxes stay xywh (box_coding=1), scores are [b,A,nc], outputs are
    (num_dets [b,1] i32, det_boxes [b,max_obj,4] f32, det_scores
    [b,max_obj] f32, det_classes [b,max_obj] i32)
    (reference: yolov6/models/end2end.py:30-76,237-257)."""
    b = builder
    box, score = _split_pred(b, pred, nc, to_xyxy=False)
    return b.emit(
        "EfficientNMS_TRT",
        [box, score],
        n_out=4,
        hint="trt8_nms",
        domain="TRT",
        background_class=-1,
        box_coding=1,
        iou_threshold=float(iou_thres),
        max_output_boxes=int(max_obj),
        plugin_version="1",
        score_activation=0,
        score_threshold=float(score_thres),
    )


def _append_trt7_nms(
    builder: _Builder,
    pred: str,
    nc: int,
    max_obj: int,
    iou_thres: float,
    score_thres: float,
) -> List[str]:
    """Append the TensorRT 7 ``BatchedNMSDynamic_TRT`` plugin node.

    Boxes go through xywh->xyxy then gain a shared-location class axis
    ([b,A,1,4]); outputs are (num_dets i32, det_boxes f32, det_scores f32,
    det_classes f32 -> Cast i32), keepTopK = max_obj
    (reference: yolov6/models/end2end.py:78-137,192-233)."""
    b = builder
    i64 = lambda v: b.const(np.asarray(v, np.int64))  # noqa: E731
    box, score = _split_pred(b, pred, nc, to_xyxy=True)
    box4 = b.emit("Unsqueeze", [box, i64([2])])[0]     # [b,A,1,4] shareLocation
    num_det, det_boxes, det_scores, det_classes_f = b.emit(
        "BatchedNMSDynamic_TRT",
        [box4, score],
        n_out=4,
        hint="trt7_nms",
        domain="TRT",
        shareLocation=1,
        plugin_version="1",
        backgroundLabelId=-1,
        numClasses=int(nc),
        topK=1000,
        keepTopK=int(max_obj),
        scoreThreshold=float(score_thres),
        iouThreshold=float(iou_thres),
        isNormalized=0,
        clipBoxes=0,
        scoreBits=16,
        caffeSemantics=1,
    )
    det_classes = b.emit(
        "Cast", [det_classes_f], to=int(op.NP_TO_ONNX[np.dtype(np.int32)])
    )[0]
    return [num_det, det_boxes, det_scores, det_classes]


def make_dynamic_batch(m, sentinel: int, dim_param: str = "batch") -> None:
    """Rewrite a model traced at a sentinel batch size into a dynamic-batch
    model (reference: deploy/ONNX/export_onnx.py --dynamic-batch).

    The converter bakes shapes into Reshape/Expand initializers; tracing at
    a large prime sentinel makes the batch dimension uniquely identifiable
    in them. Each Reshape shape gets its sentinel element replaced by -1
    (inferred); each Expand target is rebuilt at runtime from
    ``Shape(input)[0:1]``. Graph IO batch dims become ``dim_param``.
    Mutates the ParsedModel in place.
    """
    from yolov6_tpu.export.onnx_proto import ParsedNode

    inits = m.initializers
    consumers: Dict[str, list] = {}
    for node in m.nodes:
        for i in node.inputs:
            consumers.setdefault(i, []).append(node)

    helpers: List[ParsedNode] = []
    bdim = None

    def get_bdim() -> str:
        nonlocal bdim
        if bdim is None:
            inp = m.inputs[0][0]
            inits["dynb_zero"] = np.asarray([0], np.int64)
            inits["dynb_one"] = np.asarray([1], np.int64)
            helpers.append(ParsedNode("Shape", [inp], ["dynb_shape"], "dynb_shape", {}))
            helpers.append(
                ParsedNode("Slice", ["dynb_shape", "dynb_zero", "dynb_one"],
                           ["dynb_batch"], "dynb_batch", {})
            )
            bdim = "dynb_batch"
        return bdim

    for name, arr in list(inits.items()):
        if arr.dtype != np.int64 or arr.ndim != 1 or not (arr == sentinel).any():
            continue
        if int((arr == sentinel).sum()) != 1:
            raise ValueError(
                f"dynamic batch: sentinel appears {int((arr == sentinel).sum())} "
                f"times in shape initializer {name} ({arr.tolist()})"
            )
        for node in consumers.get(name, []):
            if node.op_type == "Reshape":
                rname = name + "_dynr"
                if rname not in inits:
                    new = arr.copy()
                    new[arr == sentinel] = -1
                    inits[rname] = new
                node.inputs = [rname if i == name else i for i in node.inputs]
            elif node.op_type == "Expand":
                idx = int(np.argmax(arr == sentinel))
                if idx != 0:
                    raise ValueError(
                        f"dynamic batch: Expand target {arr.tolist()} has the "
                        f"batch at position {idx}"
                    )
                dname = name + "_dyne"
                if dname not in inits and not any(
                    h.outputs[0] == dname for h in helpers
                ):
                    inits[name + "_rest"] = arr[1:].copy()
                    helpers.append(
                        ParsedNode("Concat", [get_bdim(), name + "_rest"],
                                   [dname], dname, {"axis": 0})
                    )
                node.inputs = [dname if i == name else i for i in node.inputs]
            else:
                raise ValueError(
                    f"dynamic batch: sentinel initializer {name} consumed by "
                    f"unsupported op {node.op_type}"
                )
        inits.pop(name, None)
    m.nodes = helpers + m.nodes
    m.inputs = [(n, et, (dim_param,) + tuple(sh[1:])) for n, et, sh in m.inputs]
    m.outputs = [(n, et, (dim_param,) + tuple(sh[1:])) for n, et, sh in m.outputs]


def _prune_dead(builder: _Builder, out_names: List[str]):
    """Drop nodes/initializers not reachable from the graph outputs."""
    live = set(out_names)
    for node in reversed(builder.nodes):
        if any(o in live for o in node.outputs):
            live.update(node.inputs)
    builder.nodes = [n for n in builder.nodes if any(o in live for o in n.outputs)]
    builder.initializers = {
        k: v for k, v in builder.initializers.items() if k in live
    }
    return live


def export_onnx(
    fn,
    example_args: Sequence,
    path: Optional[str] = None,
    *,
    opset: int = 13,
    graph_name: str = "yolov6",
    input_names: Optional[List[str]] = None,
    output_names: Optional[List[str]] = None,
    nms: Optional[dict] = None,
    doc: str = "",
) -> bytes:
    """Trace ``fn(*example_args)`` and serialize it as an ONNX model.

    Shapes are static (taken from the example args). Returns the serialized
    ModelProto bytes; also written to ``path`` if given.

    ``nms`` (keys: max_obj, iou_thres, score_thres, trt_version) appends an
    end2end tail: ``fn`` must then return a single [b, A, 5+nc] prediction
    tensor, and the model outputs become (num_det, det_boxes, det_scores,
    det_classes). trt_version None/0 emits the standard NonMaxSuppression
    op (ORT contract, dynamic det dim — reference:
    yolov6/models/end2end.py:140-189); 8 emits the EfficientNMS_TRT plugin
    node, 7 BatchedNMSDynamic_TRT (fixed max_obj det dim — reference:
    yolov6/models/end2end.py:30-137).
    """
    import jax

    closed = jax.make_jaxpr(fn)(*example_args)
    jaxpr = closed.jaxpr

    builder = _Builder()
    in_names = input_names or [f"input_{i}" for i in range(len(jaxpr.invars))]
    if len(in_names) != len(jaxpr.invars):
        raise ValueError("input_names length mismatch")
    conv = _Converter(builder)
    raw_outs = conv.run(jaxpr, closed.consts, list(in_names))

    out_specs: List[tuple] = [
        (int(op.NP_TO_ONNX[_np_dtype(v.aval)]), tuple(int(s) for s in v.aval.shape))
        for v in jaxpr.outvars
    ]
    extra_opsets: Dict[str, int] = {}
    if nms is not None:
        if len(raw_outs) != 1:
            raise ValueError("nms tail needs a single [b, A, 5+nc] output")
        pred_aval = jaxpr.outvars[0].aval
        batch, nc = int(pred_aval.shape[0]), int(pred_aval.shape[-1]) - 5
        max_obj = int(nms.get("max_obj", 100))
        iou_thres = float(nms.get("iou_thres", 0.45))
        score_thres = float(nms.get("score_thres", 0.25))
        trt_version = nms.get("trt_version")
        i64 = int(op.NP_TO_ONNX[np.dtype(np.int64)])
        i32 = int(op.NP_TO_ONNX[np.dtype(np.int32)])
        f32 = int(op.NP_TO_ONNX[np.dtype(np.float32)])
        if trt_version:  # TensorRT plugin contracts: fixed max_obj det dim
            append = _append_trt8_nms if int(trt_version) >= 8 else _append_trt7_nms
            raw_outs = append(
                builder, raw_outs[0], nc, max_obj, iou_thres, score_thres
            )
            extra_opsets["TRT"] = 1
            out_specs = [
                (i32, (batch, 1)),
                (f32, (batch, max_obj, 4)),
                (f32, (batch, max_obj)),
                (i32, (batch, max_obj)),
            ]
        else:  # ORT NonMaxSuppression contract: dynamic det dim
            raw_outs = _append_ort_nms(
                builder, raw_outs[0], batch, nc, max_obj, iou_thres, score_thres
            )
            out_specs = [
                (i64, (batch, 1)),
                (f32, (batch, "dets", 4)),
                (f32, (batch, "dets")),
                (i64, (batch, "dets")),
            ]
        output_names = output_names or [
            "num_dets", "det_boxes", "det_scores", "det_classes"
        ]

    out_names = output_names or [f"output_{i}" for i in range(len(raw_outs))]
    if len(out_names) != len(raw_outs):
        raise ValueError("output_names length mismatch")
    final = []
    for raw, name in zip(raw_outs, out_names):
        # bind each graph output through an Identity so renaming can never
        # break other consumers of the producing node's tensor
        node = op.Node("Identity", [raw], [name], name=f"out_{name}")
        builder.nodes.append(node)
        builder.produced_by[name] = node
        final.append(name)

    _prune_dead(builder, final)

    def vinfo_in(name, aval):
        return op.ValueInfo(
            name, int(op.NP_TO_ONNX[_np_dtype(aval)]), tuple(int(s) for s in aval.shape)
        )

    graph = op.Graph(
        name=graph_name,
        nodes=builder.nodes,
        inputs=[vinfo_in(n, v.aval) for n, v in zip(in_names, jaxpr.invars)],
        outputs=[
            op.ValueInfo(n, et, shape)
            for n, (et, shape) in zip(final, out_specs)
        ],
        initializers=list(builder.initializers.values()),
    )
    data = op.encode_model(graph, opset=opset, doc=doc, extra_opsets=extra_opsets)
    if path is not None:
        with open(path, "wb") as f:
            f.write(data)
    return data
