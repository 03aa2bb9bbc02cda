"""Pallas kernel tests (interpreter mode on CPU; the same kernels are
hardware-validated on v5e — see ops/pool_pallas.py notes).

The experimental fused-ECA kernel was DELETED in round 3: its serial-DMA form
measured 79 vs XLA's 41 ms / 50 iters at (8,56,56,512) on v5e, the
double-buffered DMA variant deadlocked Mosaic, and a STANDALONE ECA cannot
beat XLA's own pool+conv1d+sigmoid+scale fusion — two passes over x is the
bandwidth floor both implementations already achieve. See the PERF.md
round-3 entry for the A/B log and decision.
"""

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Fused packed max-pool (ops/pool_pallas.py; hardware-validated on v5e:
# fwd 21.45 -> 7.43 ms at (3,64,224,112,128) bf16)
# ---------------------------------------------------------------------------

def _ref_pool(xp, C=64):
    from pmoe_tpu.nn.resnet import _packed_maxpool_3x3s2
    out = _packed_maxpool_3x3s2(xp, C)
    B, H2, W2, C_ = out.shape
    return out.reshape(B, H2, W2 // 2, 2 * C_)


def test_fused_pool_forward_exact():
    from pmoe_tpu.ops.pool_pallas import fused_packed_pool
    xp = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 16, 128))
    np.testing.assert_array_equal(np.asarray(_ref_pool(xp)),
                                  np.asarray(fused_packed_pool(xp)))


def test_fused_pool_backward_exact_on_continuous_input():
    # no ties on continuous input -> the argmax subgradient matches XLA's
    from pmoe_tpu.ops.pool_pallas import fused_packed_pool
    key = jax.random.PRNGKey(1)
    xp = jax.random.normal(key, (2, 32, 16, 128))
    g = jax.random.normal(jax.random.fold_in(key, 1), (2, 16, 8, 128))
    g0 = jax.grad(lambda x: jnp.sum(_ref_pool(x) * g))(xp)
    g1 = jax.grad(lambda x: jnp.sum(fused_packed_pool(x) * g))(xp)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1), atol=1e-6)


def test_fused_pool_tie_gradient_mass_conserved():
    # relu-like input (many tied zeros): each output element must route its
    # gradient to exactly one window element (first-match subgradient)
    from pmoe_tpu.ops.pool_pallas import fused_packed_pool
    key = jax.random.PRNGKey(2)
    xp = jnp.maximum(jax.random.normal(key, (2, 32, 16, 128)), 0.0)
    g = jax.random.normal(jax.random.fold_in(key, 3), (2, 16, 8, 128))
    gt = jax.grad(lambda x: jnp.sum(fused_packed_pool(x) * g))(xp)
    np.testing.assert_allclose(float(jnp.sum(gt)), float(jnp.sum(g)),
                               rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(_ref_pool(xp)),
                                  np.asarray(fused_packed_pool(xp)))


def test_fused_pool_vmap_bf16():
    # the MoE stacks experts with nn.vmap; pallas batching adds a grid axis
    from pmoe_tpu.ops.pool_pallas import fused_packed_pool
    xb = jax.random.normal(jax.random.PRNGKey(4),
                           (2, 32, 16, 128)).astype(jnp.bfloat16)
    xs = jnp.stack([xb, xb * 0.5, xb + 1])
    yv = jax.vmap(fused_packed_pool)(xs)
    yr = jax.vmap(lambda a: _ref_pool(a))(xs)
    np.testing.assert_array_equal(np.asarray(yv), np.asarray(yr))


# ---------------------------------------------------------------------------
# Fused BN+ReLU epilogue + pool (fused_packed_pool_bn): the stem's two
# trailing BatchNorm-affine + ReLU passes applied in-register before pooling
# ---------------------------------------------------------------------------

def _bn_pool_inputs(dtype=jnp.float32):
    key = jax.random.PRNGKey(0)
    B, H, W2, C2 = 2, 32, 16, 128
    c = C2 // 2
    y = jax.random.normal(key, (B, H, W2, C2), jnp.float32).astype(dtype)
    ks = jax.random.split(key, 7)
    d2 = lambda v: jnp.concatenate([v, v])
    aff = jnp.stack([
        jnp.stack([d2(jax.random.normal(ks[0], (c,))),
                   d2(jax.random.normal(ks[1], (c,)) * 0.5 + 1.0),
                   d2(jax.random.normal(ks[2], (c,)) * 0.1)]),
        jnp.stack([d2(jax.random.normal(ks[3], (c,)) * 0.2),
                   d2(jax.random.normal(ks[4], (c,)) * 0.5 + 1.0),
                   d2(jax.random.normal(ks[5], (c,)) * 0.1)]),
    ])
    g = jax.random.normal(ks[6], (B, H // 2, W2 // 2, C2))
    return y, aff, g, c


def _bn_pool_ref(y, aff, c):
    """Canonical chain: affine+relu (with the production dtype rounding) x2,
    then the XLA packed pool."""
    yf = y.astype(jnp.float32)
    t1 = jax.nn.relu(((yf - aff[0, 0]) * aff[0, 1] + aff[0, 2])
                     .astype(y.dtype)).astype(jnp.float32)
    t2 = jax.nn.relu(((t1 - aff[1, 0]) * aff[1, 1] + aff[1, 2])
                     .astype(y.dtype))
    return _ref_pool(t2.astype(y.dtype), c)


def test_fused_pool_bn_forward_exact():
    from pmoe_tpu.ops.pool_pallas import fused_packed_pool_bn
    y, aff, _, c = _bn_pool_inputs()
    np.testing.assert_allclose(np.asarray(_bn_pool_ref(y, aff, c)),
                               np.asarray(fused_packed_pool_bn(y, aff)),
                               atol=1e-6)
    # bf16: the kernel rounds through bf16 between the two affines exactly
    # as the canonical PackedBN -> relu chain does
    yb, affb, _, _ = _bn_pool_inputs(jnp.bfloat16)
    rb = _bn_pool_ref(yb, affb, c).astype(jnp.float32)
    fb = fused_packed_pool_bn(yb, affb).astype(jnp.float32)
    np.testing.assert_array_equal(np.asarray(rb), np.asarray(fb))


def test_fused_pool_bn_backward():
    """dy matches the XLA chain; the affine gradient matches after folding
    the duplicated parity halves (pool ties route gradient to different
    halves, but the canonical gradient through PackedBN's concat backward
    is identical — verified against both the XLA chain and first-match)."""
    from pmoe_tpu.ops.pool_pallas import fused_packed_pool_bn
    y, aff, g, c = _bn_pool_inputs()
    gy_r, ga_r = jax.grad(lambda y, a: jnp.sum(_bn_pool_ref(y, a, c) * g),
                          argnums=(0, 1))(y, aff)
    gy_f, ga_f = jax.grad(
        lambda y, a: jnp.sum(fused_packed_pool_bn(y, a) * g),
        argnums=(0, 1))(y, aff)
    np.testing.assert_allclose(np.asarray(gy_r), np.asarray(gy_f),
                               atol=1e-4, rtol=1e-5)
    fold = lambda a: a[..., :c] + a[..., c:]
    np.testing.assert_allclose(np.asarray(fold(ga_r)),
                               np.asarray(fold(ga_f)),
                               atol=1e-3, rtol=1e-5)


def test_fused_pool_bn_vmap():
    # expert axis via nn.vmap: both y and the per-expert affines batch
    from pmoe_tpu.ops.pool_pallas import fused_packed_pool_bn
    y, aff, _, c = _bn_pool_inputs()
    ys = jnp.stack([y, y * 0.5, y + 0.1])
    affs = jnp.stack([aff, aff * 1.1, aff])
    rv = jax.vmap(lambda a, b: _bn_pool_ref(a, b, c))(ys, affs)
    fv = jax.vmap(fused_packed_pool_bn)(ys, affs)
    np.testing.assert_allclose(np.asarray(rv), np.asarray(fv), atol=1e-6)


def test_resnet_fused_bn_pool_wiring(monkeypatch):
    """End-to-end ResNet wiring of the deferred-BN stem: identical param
    tree, train forward + batch_stats, and eval-mode grads vs the canonical
    (unpacked) path — with the fused kernel forced on (interpret mode)."""
    import jax.tree_util as tu
    from pmoe_tpu.nn.resnet import ResNetBackbone

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 6), jnp.float32)
    monkeypatch.setenv("PMOE_PACKED_STEM", "0")
    v = ResNetBackbone(arch="resnet18", in_channels=6).init(
        {"params": jax.random.PRNGKey(1)}, x, True)
    monkeypatch.setenv("PMOE_PACKED_STEM", "1")
    monkeypatch.setenv("PMOE_FUSED_POOL_BN", "force")
    v1 = ResNetBackbone(arch="resnet18", in_channels=6).init(
        {"params": jax.random.PRNGKey(1)}, x, True)
    f0 = tu.tree_leaves_with_path(v)
    f1 = tu.tree_leaves_with_path(v1)
    assert [p for p, _ in f0] == [p for p, _ in f1]

    def run(env, train):
        monkeypatch.setenv("PMOE_PACKED_STEM", env)
        m = ResNetBackbone(arch="resnet18", in_channels=6)
        if train:
            return m.apply(v, x, True, mutable=["batch_stats"])
        return m.apply(v, x, False)

    y0, u0 = run("0", True)
    y1, u1 = run("1", True)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=2e-3, atol=2e-3)
    s0 = tu.tree_leaves_with_path(u0["batch_stats"])
    s1 = dict(tu.tree_leaves_with_path(u1["batch_stats"]))
    for p, a in s0:
        np.testing.assert_allclose(np.asarray(a), np.asarray(s1[p]),
                                   rtol=1e-3, atol=1e-4, err_msg=str(p))

    def loss(params, env):
        monkeypatch.setenv("PMOE_PACKED_STEM", env)
        m = ResNetBackbone(arch="resnet18", in_channels=6)
        y = m.apply({"params": params, "batch_stats": v["batch_stats"]},
                    x, False)
        return jnp.mean(y ** 2)

    g0 = jax.grad(lambda p: loss(p, "0"))(v["params"])
    g1 = jax.grad(lambda p: loss(p, "1"))(v["params"])
    for (p, a), (_, b) in zip(tu.tree_leaves_with_path(g0),
                              tu.tree_leaves_with_path(g1)):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.maximum(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(a / scale, b / scale, rtol=0, atol=1e-3,
                                   err_msg=str(p))


# ---------------------------------------------------------------------------
# v2 (conv-native layout) path: engaged when the op is vmapped and the
# per-expert batch divides the EB tile (see pool_pallas.py "v2 kernels")
# ---------------------------------------------------------------------------

def _bn_pool_inputs_v2(dtype=jnp.float32, E=2, B=8, H=8, W2=16):
    key = jax.random.PRNGKey(7)
    C2 = 128
    c = C2 // 2
    ys = jax.random.normal(key, (E, B, H, W2, C2), jnp.float32).astype(dtype)
    ks = jax.random.split(key, 7)
    d2 = lambda v: jnp.concatenate([v, v], axis=-1)
    affs = jnp.stack([jnp.stack([
        jnp.stack([d2(jax.random.normal(ks[0], (E, c)))[i],
                   d2(jax.random.normal(ks[1], (E, c)) * 0.5 + 1.0)[i],
                   d2(jax.random.normal(ks[2], (E, c)) * 0.1)[i]]),
        jnp.stack([d2(jax.random.normal(ks[3], (E, c)) * 0.2)[i],
                   d2(jax.random.normal(ks[4], (E, c)) * 0.5 + 1.0)[i],
                   d2(jax.random.normal(ks[5], (E, c)) * 0.1)[i]]),
    ]) for i in range(E)])
    g = jax.random.normal(ks[6], (E, B, H // 2, W2 // 2, C2))
    return ys, affs, g, c


def test_fused_pool_bn_v2_forward_exact(monkeypatch):
    """vmapped call with B % 8 == 0 routes to the v2 kernels; output matches
    the v1 route bitwise (both interpret mode)."""
    from pmoe_tpu.ops.pool_pallas import _v2_ok, fused_packed_pool_bn
    for dtype in (jnp.float32, jnp.bfloat16):
        ys, affs, _, c = _bn_pool_inputs_v2(dtype)
        assert _v2_ok(ys.shape[1], ys.shape[1:])
        monkeypatch.setenv("PMOE_POOL_V2", "1")
        f2 = jax.jit(jax.vmap(fused_packed_pool_bn))(ys, affs)
        monkeypatch.setenv("PMOE_POOL_V2", "0")
        f1 = jax.jit(jax.vmap(fused_packed_pool_bn))(ys, affs)
        rv = jax.vmap(lambda a, b: _bn_pool_ref(a, b, c))(ys, affs)
        np.testing.assert_array_equal(np.asarray(f1.astype(jnp.float32)),
                                      np.asarray(f2.astype(jnp.float32)))
        np.testing.assert_allclose(np.asarray(rv.astype(jnp.float32)),
                                   np.asarray(f2.astype(jnp.float32)),
                                   atol=5e-6)


def test_fused_pool_bn_v2_backward(monkeypatch):
    """v2 gradients (dy and the folded affine grad) match the v1 route and
    the XLA reference chain."""
    from pmoe_tpu.ops.pool_pallas import fused_packed_pool_bn
    ys, affs, g, c = _bn_pool_inputs_v2()

    def loss(fn):
        return lambda y, a: jnp.sum(jax.vmap(fn)(y, a) * g)

    monkeypatch.setenv("PMOE_POOL_V2", "1")
    gy2, ga2 = jax.grad(loss(fused_packed_pool_bn), argnums=(0, 1))(ys, affs)
    monkeypatch.setenv("PMOE_POOL_V2", "0")
    gy1, ga1 = jax.grad(loss(fused_packed_pool_bn), argnums=(0, 1))(ys, affs)
    gyr, gar = jax.grad(loss(lambda a, b: _bn_pool_ref(a, b, c)),
                        argnums=(0, 1))(ys, affs)
    np.testing.assert_array_equal(np.asarray(gy1), np.asarray(gy2))
    # affine grads: v1/v2 partial-sum groupings differ -> accumulation order
    np.testing.assert_allclose(np.asarray(ga1), np.asarray(ga2),
                               atol=1e-4, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gyr), np.asarray(gy2),
                               atol=1e-4, rtol=1e-5)
    fold = lambda a: a[..., :c] + a[..., c:]
    np.testing.assert_allclose(np.asarray(fold(gar)), np.asarray(fold(ga2)),
                               atol=1e-3, rtol=1e-5)


def test_fused_pool_bn_v2_odd_width(monkeypatch):
    """W2 is an untiled leading dim in v2 — widths the v1 gate rejects
    (W2 % 16 != 0) still work through the v2 route."""
    from pmoe_tpu.ops.pool_pallas import fused_packed_pool_bn
    ys, affs, _, c = _bn_pool_inputs_v2(W2=6)
    monkeypatch.setenv("PMOE_POOL_V2", "1")
    f2 = jax.vmap(fused_packed_pool_bn)(ys, affs)
    rv = jax.vmap(lambda a, b: _bn_pool_ref(a, b, c))(ys, affs)
    np.testing.assert_allclose(np.asarray(rv), np.asarray(f2), atol=1e-6)
