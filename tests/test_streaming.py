"""Streaming fused sim+encode tests (north-star fusion requirement)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smokephysai_tpu.physics import add_smoke_source, init_state
from smokephysai_tpu.train.serving import build_model
from smokephysai_tpu.train.streaming import make_streaming_step, streaming_rollout

CONFIG = {
    "model": {
        "input_dim": 32,
        "hidden_dim": 64,
        "num_layers": 1,
        "num_heads": 4,
        "output_channels": 16,
        "chaos_strength": 0.1,
    }
}


@pytest.fixture(scope="module")
def model_and_vars():
    model = build_model(CONFIG)
    x = jnp.zeros((1, 64, 64, 1))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "chaos": jax.random.PRNGKey(1)},
        x, train=False,
    )
    return model, variables


def _seeded_state():
    s = init_state((64, 64))
    return s.replace(
        density=add_smoke_source(s.density, 32.0, 32.0, radius=8.0, intensity=1.5)
    )


def test_streaming_step(model_and_vars):
    model, variables = model_and_vars
    stream = make_streaming_step(model, variables, use_pallas=False)
    state = _seeded_state()
    state, out = stream(state)
    assert out["physics_features"].shape == (3,)
    assert out["reconstructed"].shape == (64, 64)
    assert out["frame"].shape == (64, 64)
    # stepping again works with the donated buffer
    state, out2 = stream(state)
    assert np.isfinite(np.asarray(out2["physics_features"])).all()


def test_streaming_rollout_matches_stepwise(model_and_vars):
    model, variables = model_and_vars
    state = _seeded_state()
    final, outs = streaming_rollout(
        model, variables, state, num_frames=3, use_pallas=False
    )
    assert outs["physics_features"].shape == (3, 3)
    assert outs["frame"].shape == (3, 64, 64)

    stream = make_streaming_step(model, variables, use_pallas=False)
    s = _seeded_state()
    for t in range(3):
        s, o = stream(s)
        np.testing.assert_allclose(
            np.asarray(o["frame"]), np.asarray(outs["frame"][t]), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(o["physics_features"]),
            np.asarray(outs["physics_features"][t]),
            atol=1e-5,
        )


def test_streaming_rollout_sharded_matches_single_device(model_and_vars):
    """Domain-decomposed streaming (>4k^2 scale-out path) must match the
    single-device rollout on the 8-virtual-device CPU mesh."""
    from smokephysai_tpu.parallel.mesh import make_mesh
    from smokephysai_tpu.train.streaming import streaming_rollout_sharded

    model, variables = model_and_vars
    mesh = make_mesh(space=8)

    final_ref, outs_ref = streaming_rollout(
        model, variables, _seeded_state(), num_frames=3, use_pallas=False
    )
    final_sh, outs_sh = streaming_rollout_sharded(
        model, variables, _seeded_state(), num_frames=3, mesh=mesh
    )
    np.testing.assert_allclose(
        np.asarray(outs_sh["frame"]), np.asarray(outs_ref["frame"]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(outs_sh["physics_features"]),
        np.asarray(outs_ref["physics_features"]),
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(final_sh.density), np.asarray(final_ref.density), atol=1e-5
    )
