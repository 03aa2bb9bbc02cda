"""Stage-2 MFU decomposition microbenchmarks (run on the real chip, idle).

Answers, with paired timings at the production shapes:
1. what train-mode BatchNorm costs vs eval-mode (batch-stats reductions);
2. how the nn.vmap stacked-expert conv lowering compares to a plain conv
   and to a dense merged-output conv (the 64-lane MXU padding question);
3. where the resnet18 forward's time sits (stem vs layers vs ECA).

Usage: python tools/mfu_probe.py [--batch 64]
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

import sys
sys.path.insert(0, ".")


def timeit(fn, *args, n=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
    return (time.perf_counter() - t0) / n * 1000.0


def flops_of(fn, *args):
    try:
        a = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(a, list):
            a = a[0]
        return float(a.get("flops", -1))
    except Exception:
        return -1.0


def report(name, ms, flops):
    mfu = flops / (ms / 1e3) / 197e12 if flops > 0 else float("nan")
    print(f"{name:44s} {ms:8.2f} ms  {flops / 1e9:9.1f} GF  MFU={mfu:.3f}",
          flush=True)


def bench_conv_lowerings(B):
    """Plain vs vmapped(K) vs dense-merged conv at the stem/layer1 shape."""
    K, C, O, H = 3, 64, 64, 112
    x = jnp.ones((B, H, H, C), jnp.bfloat16)
    w1 = jnp.ones((3, 3, C, O), jnp.bfloat16)
    wk = jnp.ones((K, 3, 3, C, O), jnp.bfloat16)
    wm = jnp.ones((3, 3, C, K * O), jnp.bfloat16)

    conv = lambda x, w: jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    f_plain = jax.jit(lambda x, w: conv(x, w))
    f_vmap = jax.jit(lambda x, w: jax.vmap(lambda wi: conv(x, wi))(w))
    f_merged = jax.jit(lambda x, w: conv(x, w))

    ms = timeit(f_plain, x, w1)
    report(f"conv {C}->{O} plain", ms, flops_of(lambda x, w: conv(x, w), x, w1))
    ms = timeit(f_vmap, x, wk)
    report(f"conv {C}->{O} vmapped K={K}", ms,
           flops_of(lambda x, w: jax.vmap(lambda wi: conv(x, wi))(w), x, wk))
    ms = timeit(f_merged, x, wm)
    report(f"conv {C}->{K * O} dense merged", ms,
           flops_of(lambda x, w: conv(x, w), x, wm))


def bench_bn_modes(B):
    """Train-mode (batch stats) vs eval-mode BN+ReLU cost at stem scale."""
    C, H = 64, 224
    x = jnp.ones((B, H, H, C), jnp.bfloat16)
    bn = nn.BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5,
                      dtype=jnp.bfloat16)
    v = bn.init(jax.random.PRNGKey(0), x)

    f_train = jax.jit(lambda v, x: nn.relu(
        bn.apply(v, x, mutable=["batch_stats"])[0]))
    bne = nn.BatchNorm(use_running_average=True, momentum=0.9, epsilon=1e-5,
                       dtype=jnp.bfloat16)
    f_eval = jax.jit(lambda v, x: nn.relu(bne.apply(v, x)))

    report(f"BN+ReLU train ({B},{H},{H},{C})", timeit(f_train, v, x), -1)
    report(f"BN+ReLU eval  ({B},{H},{H},{C})", timeit(f_eval, v, x), -1)

    # fwd+bwd through train BN (the full-step cost of one BN)
    def loss_train(v, x):
        y, _ = bn.apply(v, x, mutable=["batch_stats"])
        return jnp.sum(nn.relu(y).astype(jnp.float32))

    g = jax.jit(jax.grad(loss_train, argnums=1))
    report(f"BN+ReLU train fwd+bwd d/dx", timeit(g, v, x), -1)


def bench_model_parts(B):
    from pmoe_tpu.nn.resnet import ResNetBackbone
    import bench as bench_mod

    x = jnp.ones((B, 224, 224, 12), jnp.bfloat16)
    model = ResNetBackbone(arch="resnet18", in_channels=12,
                           dtype=jnp.bfloat16)
    v = model.init({"params": jax.random.PRNGKey(0)}, x[:2], False)

    f_eval = jax.jit(lambda v, x: model.apply(v, x, False))
    report("resnet18 fwd eval-BN", timeit(f_eval, v, x),
           flops_of(lambda v, x: model.apply(v, x, False), v, x))

    f_train = jax.jit(lambda v, x: model.apply(v, x, True,
                                               mutable=["batch_stats"])[0])
    report("resnet18 fwd train-BN", timeit(f_train, v, x), -1)

    def loss(p, bs, x):
        y, _ = model.apply({"params": p, "batch_stats": bs}, x, True,
                           mutable=["batch_stats"])
        return jnp.sum(y.astype(jnp.float32))

    g = jax.jit(jax.grad(loss))
    report("resnet18 train fwd+bwd",
           timeit(g, v["params"], v["batch_stats"], x), -1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    args = ap.parse_args()
    print(f"devices: {jax.devices()}", flush=True)
    bench_conv_lowerings(args.batch)
    bench_bn_modes(args.batch)
    bench_model_parts(args.batch)


if __name__ == "__main__":
    main()
