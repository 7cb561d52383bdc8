"""3D volumetric model tests (BASELINE 128^3 config)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smokephysai_tpu.models.net3d import SmokePhysNet3D


@pytest.fixture(scope="module")
def model_and_vars():
    model = SmokePhysNet3D(
        hidden_dim=64, num_layers=1, num_heads=4, output_channels=8
    )
    x = jnp.zeros((1, 32, 32, 32, 1))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "chaos": jax.random.PRNGKey(1)},
        x, train=False,
    )
    return model, variables


def test_forward_contract(model_and_vars):
    model, variables = model_and_vars
    x = jax.random.uniform(jax.random.PRNGKey(2), (2, 32, 32, 32, 1))
    out = model.apply(variables, x, train=False, rngs={"chaos": jax.random.PRNGKey(3)})
    assert out["reconstructed"].shape == (2, 32, 32, 32, 1)
    assert out["physics_features"].shape == (2, 3)
    assert 0.0 <= float(out["reconstructed"].min())
    assert float(out["reconstructed"].max()) <= 1.0


def test_gradients_flow(model_and_vars):
    model, variables = model_and_vars
    x = jax.random.uniform(jax.random.PRNGKey(4), (1, 32, 32, 32, 1))

    def loss(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True,
            rngs={"chaos": jax.random.PRNGKey(5),
                  "dropout": jax.random.PRNGKey(6)},
            mutable=["batch_stats"],
        )
        return jnp.mean(out["reconstructed"] ** 2) + jnp.mean(
            out["physics_features"] ** 2
        )

    grads = jax.grad(loss)(variables["params"])
    total = sum(
        float(jnp.sum(jnp.abs(g))) for g in jax.tree_util.tree_leaves(grads)
    )
    assert total > 0


def test_sim3d_to_model_pipeline():
    """End-to-end: 3D solver volume -> volumetric model forward."""
    from smokephysai_tpu.physics.solver3d import (
        add_smoke_source3d, init_state3d, step3d,
    )

    s = init_state3d((32, 32, 32))
    s = s.replace(density=add_smoke_source3d(s.density, 16.0, 16.0, 16.0, 6.0))
    s = step3d(s)
    model = SmokePhysNet3D(hidden_dim=64, num_layers=1, num_heads=4,
                           output_channels=8)
    x = s.density[None, :, :, :, None]
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "chaos": jax.random.PRNGKey(1)},
        x, train=False,
    )
    out = model.apply(variables, x, train=False,
                      rngs={"chaos": jax.random.PRNGKey(2)})
    assert np.isfinite(np.asarray(out["physics_features"])).all()
