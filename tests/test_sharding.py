"""Multi-device tests on the virtual 8-CPU mesh: data-parallel train step and
expert-parallel MoE sharding (the capabilities the single-GPU reference lacks,
SURVEY §2.9)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from pmoe_tpu.parallel import (make_mesh, data_sharding, shard_batch,
                               shard_params)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def test_mesh_shapes():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("expert", "data")
    mesh2 = make_mesh(expert=2)
    assert mesh2.shape["expert"] == 2 and mesh2.shape["data"] == 4


def test_data_parallel_train_step_matches_single_device(tiny_moe_cfg):
    """Gradients with batch sharded over 8 devices == single-device gradients
    (XLA all-reduce over the mesh is numerically the same mean)."""
    from pmoe_tpu.nn import MLP

    model = MLP(dims=(16, 32, 4), act="relu", bn=False)
    x = jax.random.normal(jax.random.PRNGKey(0), (16, 16))
    y = jax.random.normal(jax.random.PRNGKey(1), (16, 4))
    params = model.init(jax.random.PRNGKey(2), x, False)["params"]

    def loss_fn(p, xb, yb):
        return jnp.mean((model.apply({"params": p}, xb, False) - yb) ** 2)

    g_single = jax.grad(loss_fn)(params, x, y)

    mesh = make_mesh()
    xs = jax.device_put(x, data_sharding(mesh, 2))
    ys = jax.device_put(y, data_sharding(mesh, 2))
    ps = jax.device_put(params, NamedSharding(mesh, P()))
    g_sharded = jax.jit(jax.grad(loss_fn))(ps, xs, ys)

    for a, b in zip(jax.tree_util.tree_leaves(g_single),
                    jax.tree_util.tree_leaves(g_sharded)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_expert_sharding_placement(tiny_moe_cfg):
    """Stacked-expert params (leading K axis) shard over the 'expert' mesh axis
    and the forward still runs under jit."""
    from pmoe_tpu.models import get_model

    cfg = dict(tiny_moe_cfg, n_experts=2)
    model = get_model(cfg)
    img = jnp.ones((4, 4, 16, 16, 3))
    spd, cmd = jnp.ones((4, 1)), jnp.ones((4, 4))
    v = model.init({"params": jax.random.PRNGKey(0)}, img, spd, cmd, False)

    mesh = make_mesh(expert=2)     # 2 experts x 4 data
    params = shard_params(mesh, v["params"])
    kernel = params["experts"]["alpha"]["kernel"]
    assert kernel.sharding.spec == P("expert", None, None)

    batch_stats = jax.device_put(v.get("batch_stats", {}),
                                 NamedSharding(mesh, P()))
    img_s = jax.device_put(img, data_sharding(mesh, img.ndim))

    @jax.jit
    def fwd(p, bs, i):
        dist, speeds = model.apply({"params": p, "batch_stats": bs},
                                   i, spd, cmd, False)
        return dist.probs, speeds

    probs, speeds = fwd(params, batch_stats, img_s)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, rtol=1e-5)

    # same numerics as unsharded
    dist_ref, _ = model.apply(v, img, spd, cmd, False)
    np.testing.assert_allclose(np.asarray(probs), np.asarray(dist_ref.probs),
                               rtol=1e-4, atol=1e-5)


def test_shard_batch_places_leading_dim():
    mesh = make_mesh()
    batch = {"x": np.ones((16, 3)), "y": np.ones((16,))}
    out = shard_batch(mesh, batch)
    assert out["x"].sharding.spec == P("data", None)
    assert out["y"].sharding.spec == P("data")
