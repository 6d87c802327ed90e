"""TPU probe: decompose the train-forward overhead (VERDICT r3 weak #4).

fwd(train incl. BN stats) measured 28.5 ms vs ~15.5 ms fused-eval forward
on S b32@640 — but those are different networks (eval = reparam-folded
single-3x3 deploy graph; train = 3-branch RepVGG topology) with different
BN behavior (running stats, fusable into the conv epilogue, vs batch-stat
reductions that force materializing activations). This probe separates:

  A. deploy-graph eval forward            (the 15.5 ms baseline)
  B. train-topology fwd, running stats    (multi-branch cost = B - A)
  C. train-topology fwd, batch stats      (BN-stat cost = C - B)
  D. C with BN stat reductions reading bf16 (fp32 accumulator)
  E. C with BN returning x.dtype (bf16) instead of fp32
  F. D + E combined

Run ON TPU:  python tools/probe_train_fwd.py [batch] [img]
"""

from __future__ import annotations

import os.path as osp
import sys
import time

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)

import numpy as np


def timed(jax, jnp, fn, args, iters=30):
    # axon tunnel: block_until_ready does not await execution — time an
    # on-device fori chain returning one scalar (bench.py pattern), with an
    # iteration-dependent input to defeat CSE. Weights stay jit ARGUMENTS
    # (no HLO-constant embedding — the large-model axon caveat, ROADMAP).
    v, x = args

    def chain(vv, xx, x0):
        def body(i, acc):
            o = fn(vv, xx + acc * 1e-12)
            leaves = jax.tree_util.tree_leaves(o)
            return acc + leaves[0].astype(jnp.float32).ravel()[0] * 1e-12

        from jax import lax

        return lax.fori_loop(0, iters, body, x0)

    chain_j = jax.jit(chain)
    float(chain_j(v, x, jnp.float32(0)))  # compile + settle
    t0 = time.perf_counter()
    float(chain_j(v, x, jnp.float32(0)))
    dt = time.perf_counter() - t0
    return dt / iters * 1e3


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    img = int(sys.argv[2]) if len(sys.argv) > 2 else 640

    import jax
    import jax.numpy as jnp

    from yolov6_tpu.layers import common
    from yolov6_tpu.models.yolo import build_model
    from yolov6_tpu.utils.config import Config

    cfg = Config.fromfile(osp.join(ROOT, "configs", "yolov6s.py"))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (batch, img, img, 3)).astype(np.float32))

    results = {}

    # A: deploy graph, eval
    model_d = build_model(cfg, num_classes=80, deploy=True, dtype=jnp.bfloat16)
    v_d = model_d.init(jax.random.PRNGKey(0), x[:1], train=False)

    def fwd_eval(v, xx):
        out, _ = model_d.apply(v, xx, train=False)
        return out[0] if isinstance(out, (tuple, list)) else out

    results["A_deploy_eval"] = timed(jax, jnp, fwd_eval, (v_d, x))
    print(f"A deploy eval fwd:            {results['A_deploy_eval']:7.2f} ms/b{batch}", flush=True)
    del model_d, v_d

    # B/C on the train topology
    model_t = build_model(cfg, num_classes=80, deploy=False, dtype=jnp.bfloat16)
    v_t = model_t.init(jax.random.PRNGKey(0), x[:1], train=False)

    def fwd_running(v, xx):
        (head_out, _) = model_t.apply(v, xx, train=False)
        return head_out["cls"][0]

    def fwd_train(v, xx):
        (head_out, _), upd = model_t.apply(
            v, xx, train=True, mutable=["batch_stats"])
        return head_out["cls"][0]

    results["B_train_topo_running"] = timed(jax, jnp, fwd_running, (v_t, x))
    print(f"B train-topo fwd (running):   {results['B_train_topo_running']:7.2f}", flush=True)
    results["C_train_topo_batchstats"] = timed(jax, jnp, fwd_train, (v_t, x))
    print(f"C train-topo fwd (batch):     {results['C_train_topo_batchstats']:7.2f}", flush=True)

    # variants: swap the TorchBatchNorm class in common's namespace (the
    # BatchNorm wrapper resolves it at call time and names it "bn", so
    # param/collection paths are unchanged)
    orig_cls = common.TorchBatchNorm

    def make_variant(bf16_stats: bool, out_xdtype: bool):
        import flax.linen as nn
        from typing import Any as _Any

        class TorchBatchNorm(nn.Module):
            use_running_average: bool = True
            momentum: float = 0.97
            epsilon: float = 1e-3
            dtype: _Any = jnp.float32

            @nn.compact
            def __call__(self, xx):
                feat = xx.shape[-1]
                scale = self.param("scale", nn.initializers.ones, (feat,), jnp.float32)
                bias = self.param("bias", nn.initializers.zeros, (feat,), jnp.float32)
                ra_mean = self.variable("batch_stats", "mean",
                                        lambda: jnp.zeros((feat,), jnp.float32))
                ra_var = self.variable("batch_stats", "var",
                                       lambda: jnp.ones((feat,), jnp.float32))
                xf = xx.astype(jnp.float32)
                if self.use_running_average:
                    mean, var = ra_mean.value, ra_var.value
                else:
                    axes = tuple(range(xx.ndim - 1))
                    src = xx if bf16_stats else xf
                    mean = jnp.mean(src, axes, dtype=jnp.float32)
                    var = (jnp.mean(jnp.square(src), axes, dtype=jnp.float32)
                           - jnp.square(mean))
                    if not self.is_initializing():
                        n = 1
                        for i in axes:
                            n *= xx.shape[i]
                        unbiased = var * (n / max(n - 1, 1))
                        m = self.momentum
                        ra_mean.value = m * ra_mean.value + (1 - m) * mean
                        ra_var.value = m * ra_var.value + (1 - m) * unbiased
                y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
                y = y * scale + bias
                return y.astype(xx.dtype if out_xdtype else jnp.float32)

        return TorchBatchNorm

    for key, (bs, od) in {
        "D_bf16_stat_reads": (True, False),
        "E_bf16_bn_output": (False, True),
        "F_both": (True, True),
    }.items():
        common.TorchBatchNorm = make_variant(bs, od)
        try:
            results[key] = timed(jax, jnp, fwd_train, (v_t, x))
            print(f"{key:28s}: {results[key]:7.2f}", flush=True)
        finally:
            common.TorchBatchNorm = orig_cls

    print("\nSplit:")
    print(f"  multi-branch topology cost: "
          f"{results['B_train_topo_running'] - results['A_deploy_eval']:+.2f} ms")
    print(f"  BN batch-stat cost:         "
          f"{results['C_train_topo_batchstats'] - results['B_train_topo_running']:+.2f} ms")
    import json

    print(json.dumps({k: round(v, 3) for k, v in results.items()}))


if __name__ == "__main__":
    main()
