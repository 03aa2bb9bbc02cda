"""Pallas kernel tests (interpreter mode on CPU; the same kernels are
hardware-validated on v5e — see ops/eca_pallas.py notes)."""

import jax
import jax.numpy as jnp
import numpy as np

from pmoe_tpu.ops.eca_pallas import eca_apply, eca_reference, fused_eca


def test_fused_eca_matches_reference():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 16, 128))
    w = jax.random.normal(jax.random.PRNGKey(1), (5,)) * 0.3
    out = fused_eca(x, w)
    ref = eca_reference(x, w)
    # streaming-sum accumulation order differs from XLA's tree reduction
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-3, rtol=1e-3)


def test_fused_eca_multi_chunk():
    # force several chunks (n_rows large relative to the 1 MB chunk target)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 64, 64, 256))
    w = jnp.array([0.2, -0.1, 0.4, 0.1, -0.3])
    out = fused_eca(x, w)
    ref = eca_reference(x, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-3, rtol=1e-3)


def test_fused_eca_gradients():
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 16, 128))
    w = jax.random.normal(jax.random.PRNGKey(4), (3,)) * 0.3
    g1 = jax.grad(lambda x, w: jnp.sum(fused_eca(x, w) ** 2),
                  argnums=(0, 1))(x, w)
    g2 = jax.grad(lambda x, w: jnp.sum(eca_reference(x, w) ** 2),
                  argnums=(0, 1))(x, w)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-2, rtol=1e-3)


def test_eca_apply_dispatch():
    # unaligned channels -> XLA path; aligned + use_pallas -> kernel path
    x96 = jnp.ones((1, 8, 8, 96))
    w = jnp.array([0.1, 0.2, 0.3])
    np.testing.assert_allclose(
        np.asarray(eca_apply(x96, w, use_pallas=True)),
        np.asarray(eca_reference(x96, w)), rtol=1e-6)
    x128 = jnp.ones((1, 16, 16, 128))
    np.testing.assert_allclose(
        np.asarray(eca_apply(x128, w, use_pallas=True)),
        np.asarray(eca_reference(x128, w)), atol=1e-3)


def test_eca_flag_routes_module_through_kernel(monkeypatch):
    """PMOE_FUSED_ECA=1 makes nn.ECA dispatch into the fused kernel (interpret
    mode off-TPU) with identical numerics to the XLA path."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pmoe_tpu.nn.blocks import ECA

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 128))
    m = ECA(channels=128)
    v = m.init({"params": jax.random.PRNGKey(1)}, x)
    y_ref = m.apply(v, x)
    monkeypatch.setenv("PMOE_FUSED_ECA", "1")
    y_fused = m.apply(v, x)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-6)


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
