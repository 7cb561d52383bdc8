"""Model tests: forward-dict shape contract (reference
smokephys_net.py:124-132), chaos-field determinism under fixed keys
(SURVEY.md §4), fused-attention algebraic equivalence, regularizer golden
parity, and gradient flow."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smokephysai_tpu.models import SmokePhysNet, physics_losses
from smokephysai_tpu.models.chaos_attention import (
    ChaosAttention,
    chaos_field,
    lorenz_trajectory,
)

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens")


@pytest.fixture(scope="module")
def tiny_model_and_vars():
    model = SmokePhysNet(
        input_dim=32, hidden_dim=64, num_layers=2, num_heads=4,
        output_channels=16, chaos_strength=0.1,
    )
    x = jnp.zeros((2, 128, 128, 1))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "chaos": jax.random.PRNGKey(1)},
        x,
        train=False,
    )
    return model, variables


class TestChaosField:
    def test_lorenz_shape_and_determinism(self):
        key = jax.random.PRNGKey(42)
        t1 = lorenz_trajectory(key, 3)
        t2 = lorenz_trajectory(key, 3)
        assert t1.shape == (3, 5, 3)
        np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))

    def test_lorenz_euler_step_semantics(self):
        """One Euler step must match the closed-form Lorenz update
        (reference chaos_attention.py:39-45)."""
        key = jax.random.PRNGKey(0)
        init = 0.1 * jax.random.normal(key, (1, 3))
        x, y, z = (float(init[0, i]) for i in range(3))
        t = lorenz_trajectory(key, 1)
        dt = 0.01
        x1 = x + dt * 10.0 * (y - x)
        y1 = y + dt * (x * (28.0 - z) - y)
        z1 = z + dt * (x * y - (8.0 / 3.0) * z)
        np.testing.assert_allclose(
            np.asarray(t[0, 0]), [x1, y1, z1], rtol=1e-5
        )

    def test_field_tiling(self):
        """Tile-repeat to seq_len (reference chaos_attention.py:61-66)."""
        f = chaos_field(jax.random.PRNGKey(1), 2, 12)
        assert f.shape == (2, 12, 3)
        np.testing.assert_array_equal(np.asarray(f[:, :5]), np.asarray(f[:, 5:10]))
        np.testing.assert_array_equal(np.asarray(f[:, 10:12]), np.asarray(f[:, :2]))

    def test_different_keys_differ(self):
        f1 = chaos_field(jax.random.PRNGKey(1), 2, 10)
        f2 = chaos_field(jax.random.PRNGKey(2), 2, 10)
        assert not np.allclose(np.asarray(f1), np.asarray(f2))


class TestChaosAttention:
    def test_fused_equals_reference_two_matmul_form(self):
        """The fused (q + s*g*c) @ k^T must equal the reference's
        q@k^T + s*g*(c@k^T) combination (chaos_attention.py:82-100)."""
        dim, heads, B, L = 32, 4, 2, 9
        attn = ChaosAttention(dim, heads, chaos_strength=0.3)
        x = jax.random.normal(jax.random.PRNGKey(0), (B, L, dim))
        variables = attn.init(
            {"params": jax.random.PRNGKey(1), "chaos": jax.random.PRNGKey(2)}, x
        )
        out_fused = attn.apply(variables, x, chaos_key=jax.random.PRNGKey(3))

        # hand-computed reference combination with the same params/field
        p = variables["params"]
        dense = lambda name, t: t @ p[name]["kernel"] + p[name]["bias"]
        q, k, v = dense("q_proj", x), dense("k_proj", x), dense("v_proj", x)
        field = chaos_field(jax.random.PRNGKey(3), B, L)
        cf = dense("chaos_proj", field)
        gate = jax.nn.sigmoid(dense("chaos_gate", cf))  # [B, L, 1]
        hd = dim // heads
        split = lambda t: t.reshape(B, L, heads, hd).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhid,bhjd->bhij", split(q), split(k)) / np.sqrt(hd)
        cscores = jnp.einsum("bhid,bhjd->bhij", split(cf), split(k)) / np.sqrt(hd)
        final = scores + 0.3 * cscores * gate[:, None, :, :]
        w = jax.nn.softmax(final, axis=-1)
        out = jnp.einsum("bhij,bhjd->bhid", w, split(v))
        out = out.transpose(0, 2, 1, 3).reshape(B, L, dim)
        out_ref = dense("out_proj", out)

        np.testing.assert_allclose(
            np.asarray(out_fused), np.asarray(out_ref), atol=1e-5
        )


class TestSmokePhysNet:
    def test_forward_dict_contract(self, tiny_model_and_vars):
        model, variables = tiny_model_and_vars
        x = jax.random.uniform(jax.random.PRNGKey(3), (2, 128, 128, 1))
        out = model.apply(
            variables, x, train=False, rngs={"chaos": jax.random.PRNGKey(4)}
        )
        assert set(out) == {"reconstructed", "physics_features", "latent_features"}
        assert out["reconstructed"].shape == (2, 128, 128, 1)
        assert out["physics_features"].shape == (2, 3)
        assert out["latent_features"].shape == (2, 64)
        assert float(out["reconstructed"].min()) >= 0.0
        assert float(out["reconstructed"].max()) <= 1.0

    def test_return_features(self, tiny_model_and_vars):
        model, variables = tiny_model_and_vars
        x = jnp.zeros((1, 128, 128, 1))
        out = model.apply(
            variables, x, train=False, return_features=True,
            rngs={"chaos": jax.random.PRNGKey(4)},
        )
        assert out["intermediate_features"].shape == (1, 1024, 64)

    def test_eval_deterministic_with_fixed_key(self, tiny_model_and_vars):
        model, variables = tiny_model_and_vars
        x = jax.random.uniform(jax.random.PRNGKey(5), (1, 128, 128, 1))
        o1 = model.apply(variables, x, rngs={"chaos": jax.random.PRNGKey(7)})
        o2 = model.apply(variables, x, rngs={"chaos": jax.random.PRNGKey(7)})
        np.testing.assert_array_equal(
            np.asarray(o1["reconstructed"]), np.asarray(o2["reconstructed"])
        )

    def test_train_mode_updates_batch_stats(self, tiny_model_and_vars):
        model, variables = tiny_model_and_vars
        x = jax.random.uniform(jax.random.PRNGKey(6), (2, 128, 128, 1))
        out, mutated = model.apply(
            variables,
            x,
            train=True,
            rngs={"chaos": jax.random.PRNGKey(8), "dropout": jax.random.PRNGKey(9)},
            mutable=["batch_stats"],
        )
        before = variables["batch_stats"]["enc_bn1"]["BatchNorm_0"]["mean"]
        after = mutated["batch_stats"]["enc_bn1"]["BatchNorm_0"]["mean"]
        assert not np.allclose(np.asarray(before), np.asarray(after))

    def test_gradients_flow_to_all_params(self, tiny_model_and_vars):
        model, variables = tiny_model_and_vars
        x = jax.random.uniform(jax.random.PRNGKey(10), (2, 128, 128, 1))
        y = jax.random.uniform(jax.random.PRNGKey(11), (2, 128, 128, 1))

        def loss_fn(params):
            out = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x,
                train=True,
                rngs={
                    "chaos": jax.random.PRNGKey(12),
                    "dropout": jax.random.PRNGKey(13),
                },
                mutable=["batch_stats"],
            )[0]
            return jnp.mean((out["reconstructed"] - y) ** 2) + jnp.mean(
                out["physics_features"] ** 2
            )

        grads = jax.grad(loss_fn)(variables["params"])
        leaves = jax.tree_util.tree_leaves_with_path(grads)
        zero = [
            jax.tree_util.keystr(pth)
            for pth, g in leaves
            if float(jnp.max(jnp.abs(g))) == 0.0
        ]
        assert zero == [], f"dead gradients: {zero}"


class TestRegularizer:
    def test_golden_parity(self):
        g = np.load(os.path.join(GOLDENS, "regularizer.npz"))
        out = physics_losses(
            {
                "density": jnp.asarray(g["dens_p"]),
                "density_sequence": jnp.asarray(g["seq"]),
                "velocity": jnp.asarray(g["vel"]),
            },
            {"density": jnp.asarray(g["dens_t"])},
            conservation_weight=1.0,
            continuity_weight=1.0,
            energy_weight=0.5,
        )
        for key in (
            "mass_conservation",
            "continuity",
            "energy_conservation",
            "divergence",
            "total_physics_loss",
        ):
            np.testing.assert_allclose(
                float(out[key]), float(g[key]), rtol=1e-5, err_msg=key
            )

    def test_missing_keys_skip_terms(self):
        out = physics_losses({"density_sequence": jnp.ones((1, 3, 4, 4))})
        assert set(out) == {"continuity", "total_physics_loss"}


class TestFlashAttentionPath:
    def test_flash_equals_einsum_path(self):
        dim, heads, B, L = 64, 4, 2, 128
        x = jax.random.normal(jax.random.PRNGKey(0), (B, L, dim))
        a_ref = ChaosAttention(dim, heads, chaos_strength=0.2)
        a_flash = ChaosAttention(dim, heads, chaos_strength=0.2, use_flash=True)
        variables = a_ref.init(
            {"params": jax.random.PRNGKey(1), "chaos": jax.random.PRNGKey(2)}, x
        )
        key = jax.random.PRNGKey(3)
        out_ref = a_ref.apply(variables, x, chaos_key=key)
        out_flash = a_flash.apply(variables, x, chaos_key=key)
        np.testing.assert_allclose(
            np.asarray(out_flash), np.asarray(out_ref), atol=2e-5
        )


class TestModelLevelAttentionPaths:
    """VERDICT r1 item 3: flash/ring attention must be reachable from
    SmokePhysNet itself (not just the bare kernels)."""

    @pytest.fixture(scope="class")
    def small_net_vars(self):
        kwargs = dict(
            input_dim=32, hidden_dim=64, num_layers=2, num_heads=4,
            output_channels=16,
        )
        model = SmokePhysNet(**kwargs)
        x = jax.random.uniform(jax.random.PRNGKey(0), (2, 128, 128, 1))
        variables = model.init(
            {"params": jax.random.PRNGKey(1), "chaos": jax.random.PRNGKey(2)},
            x, train=False,
        )
        return kwargs, variables, x

    def test_model_flash_equals_einsum(self, small_net_vars):
        kwargs, variables, x = small_net_vars
        rngs = {"chaos": jax.random.PRNGKey(3)}
        out_ref = SmokePhysNet(**kwargs).apply(
            variables, x, train=False, rngs=rngs
        )
        out_flash = SmokePhysNet(**kwargs, use_flash=True).apply(
            variables, x, train=False, rngs=rngs
        )
        np.testing.assert_allclose(
            np.asarray(out_flash["reconstructed"]),
            np.asarray(out_ref["reconstructed"]),
            atol=2e-5,
        )
        np.testing.assert_allclose(
            np.asarray(out_flash["physics_features"]),
            np.asarray(out_ref["physics_features"]),
            atol=2e-4,
        )

    def test_model_ring_equals_einsum(self, small_net_vars):
        from smokephysai_tpu.parallel.mesh import make_mesh

        kwargs, variables, x = small_net_vars
        mesh = make_mesh(space=8)
        rngs = {"chaos": jax.random.PRNGKey(3)}
        out_ref = SmokePhysNet(**kwargs).apply(
            variables, x, train=False, rngs=rngs
        )
        out_ring = SmokePhysNet(
            **kwargs, ring_axis="space", ring_mesh=mesh
        ).apply(variables, x, train=False, rngs=rngs)
        np.testing.assert_allclose(
            np.asarray(out_ring["reconstructed"]),
            np.asarray(out_ref["reconstructed"]),
            atol=2e-5,
        )

    def test_model_ulysses_equals_einsum(self, small_net_vars):
        from smokephysai_tpu.parallel.mesh import make_mesh

        kwargs, variables, x = small_net_vars
        mesh = make_mesh(space=4)  # num_heads=4 -> 1 head per device
        rngs = {"chaos": jax.random.PRNGKey(3)}
        out_ref = SmokePhysNet(**kwargs).apply(
            variables, x, train=False, rngs=rngs
        )
        out_uly = SmokePhysNet(
            **kwargs, ring_axis="space", ring_mesh=mesh, sp_impl="ulysses"
        ).apply(variables, x, train=False, rngs=rngs)
        np.testing.assert_allclose(
            np.asarray(out_uly["reconstructed"]),
            np.asarray(out_ref["reconstructed"]),
            atol=2e-5,
        )

    def test_build_model_reads_config_keys(self):
        from smokephysai_tpu.parallel.mesh import make_mesh
        from smokephysai_tpu.train.serving import build_model
        from smokephysai_tpu.utils.config import load_config

        cfg = load_config(None)
        cfg["tpu"]["use_flash"] = True
        cfg["tpu"]["ring_axis"] = "space"
        assert build_model(cfg).use_flash
        # size-1 ring axis degrades to full attention
        assert build_model(cfg, mesh=make_mesh(space=1)).ring_axis is None
        m8 = make_mesh(space=8)
        model = build_model(cfg, mesh=m8)
        assert model.ring_axis == "space" and model.ring_mesh is m8


def test_large_grid_forward():
    """Model must accept larger grids than 128 (256^2/512^2 configs):
    encoder adaptive-pools any input down to the token grid, recon head
    resizes back to the input resolution."""
    model = SmokePhysNet(
        input_dim=32, hidden_dim=64, num_layers=1, num_heads=4,
        output_channels=16,
    )
    x = jnp.zeros((1, 256, 256, 1))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "chaos": jax.random.PRNGKey(1)},
        x, train=False,
    )
    out = model.apply(variables, x, train=False,
                      rngs={"chaos": jax.random.PRNGKey(2)})
    assert out["reconstructed"].shape == (1, 256, 256, 1)


class TestTokenMajorFlashKernel:
    """flash_attention_tokens: the no-transpose [B, L, D] multi-head kernel
    used by the serving path (ops/pallas/attention.py)."""

    def test_equals_naive_multihead_softmax(self):
        from smokephysai_tpu.ops.pallas.attention import flash_attention_tokens

        B, L, H, hd = 2, 256, 4, 32
        D = H * hd
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(ks[0], (B, L, D))
        k = jax.random.normal(ks[1], (B, L, D))
        v = jax.random.normal(ks[2], (B, L, D))

        out = flash_attention_tokens(q, k, v, num_heads=H, block_q=64,
                                     block_k=128)

        # naive reference per head-slice (torch head convention)
        qh = q.reshape(B, L, H, hd).transpose(0, 2, 1, 3)
        kh = k.reshape(B, L, H, hd).transpose(0, 2, 1, 3)
        vh = v.reshape(B, L, H, hd).transpose(0, 2, 1, 3)
        s = jnp.einsum("bhid,bhjd->bhij", qh, kh) / jnp.sqrt(jnp.float32(hd))
        ref = jnp.einsum("bhij,bhjd->bhid", jax.nn.softmax(s, axis=-1), vh)
        ref = ref.transpose(0, 2, 1, 3).reshape(B, L, D)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fast_math_close_to_reference_path():
    """fast_math (bf16 residual + tanh GELU) is a serving-only approximation:
    outputs must stay within bf16-resolution distance of the parity path."""
    kwargs = dict(input_dim=32, hidden_dim=64, num_layers=2, num_heads=4,
                  output_channels=16)
    model = SmokePhysNet(**kwargs, dtype=jnp.bfloat16)
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 1))
    variables = model.init(
        {"params": jax.random.PRNGKey(1), "chaos": jax.random.PRNGKey(2)},
        x, train=False,
    )
    rngs = {"chaos": jax.random.PRNGKey(3)}
    out_ref = model.apply(variables, x, train=False, rngs=rngs)
    out_fast = SmokePhysNet(**kwargs, dtype=jnp.bfloat16, fast_math=True).apply(
        variables, x, train=False, rngs=rngs
    )
    np.testing.assert_allclose(
        np.asarray(out_fast["reconstructed"]),
        np.asarray(out_ref["reconstructed"]),
        atol=2e-2,
    )
    assert out_ref["latent_features"].dtype == jnp.float32
    assert out_fast["latent_features"].dtype == jnp.float32


class TestFastEncoder:
    """tpu.fast_encoder: pool-first streaming fast path (documented
    divergence — the parity path runs enc_conv2 at full resolution)."""

    def test_noop_at_native_resolution(self, tiny_model_and_vars):
        """When the input is already input_dim^2 the flag is bit-exact."""
        model, variables = tiny_model_and_vars
        x = jax.random.uniform(jax.random.PRNGKey(11), (1, 32, 32, 1))
        rngs = {"chaos": jax.random.PRNGKey(12)}
        ref = model.apply(variables, x, train=False, rngs=rngs)
        fast = model.clone(fast_encoder=True).apply(
            variables, x, train=False, rngs=rngs
        )
        np.testing.assert_array_equal(
            np.asarray(fast["reconstructed"]), np.asarray(ref["reconstructed"])
        )
        np.testing.assert_array_equal(
            np.asarray(fast["physics_features"]),
            np.asarray(ref["physics_features"]),
        )

    def test_undersize_input_is_noop(self, tiny_model_and_vars):
        """Frames BELOW input_dim must not trigger the pool-first path (the
        old `!=` trigger avg-pool UPSAMPLED them, quadrupling the conv cost
        and changing numerics): the flag is bit-exact vs the parity path."""
        model, variables = tiny_model_and_vars
        x = jax.random.uniform(jax.random.PRNGKey(15), (1, 16, 16, 1))
        rngs = {"chaos": jax.random.PRNGKey(16)}
        ref = model.apply(variables, x, train=False, rngs=rngs)
        fast = model.clone(fast_encoder=True).apply(
            variables, x, train=False, rngs=rngs
        )
        np.testing.assert_array_equal(
            np.asarray(fast["reconstructed"]), np.asarray(ref["reconstructed"])
        )

    def test_oversize_input_contract(self, tiny_model_and_vars):
        """Oversize frames keep the full output contract (recon back at the
        input resolution) and stay close to the parity path on smooth
        fields."""
        model, variables = tiny_model_and_vars
        x = jax.random.uniform(jax.random.PRNGKey(13), (1, 128, 128, 1))
        rngs = {"chaos": jax.random.PRNGKey(14)}
        out = model.clone(fast_encoder=True).apply(
            variables, x, train=False, rngs=rngs
        )
        assert out["reconstructed"].shape == (1, 128, 128, 1)
        assert out["physics_features"].shape == (1, 3)
        assert np.isfinite(np.asarray(out["reconstructed"])).all()
        assert np.isfinite(np.asarray(out["physics_features"])).all()
