"""Backbone rematerialization option: numerically identical params,
outputs, and gradients (it only changes what the backward saves)."""

import jax
import jax.numpy as jnp

from mtlx.backbones.resnet import ResNetStage


def test_remat_stage_identical():
    x = jnp.linspace(0, 1, 1 * 16 * 16 * 64).reshape(1, 16, 16, 64)
    m0 = ResNetStage(2, 128, 2, dtype=jnp.float32)
    m1 = ResNetStage(2, 128, 2, dtype=jnp.float32, remat=True)
    v = m0.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(
        m1.init(jax.random.PRNGKey(0), x)
    ) == jax.tree_util.tree_structure(v)

    y0 = m0.apply(v, x, True)
    y1 = m1.apply(v, x, True)
    assert jnp.array_equal(y0, y1)

    def loss(mod):
        return lambda p: jnp.sum(
            mod.apply({"params": p, "batch_stats": v["batch_stats"]}, x, True) ** 2
        )

    g0 = jax.grad(loss(m0))(v["params"])
    g1 = jax.grad(loss(m1))(v["params"])
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        assert jnp.array_equal(a, b)
