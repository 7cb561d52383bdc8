"""Generate golden parity fixtures by running the *reference* implementation
(/root/reference, PyTorch, CPU) on fixed inputs and recording its outputs.

The goldens are committed as tests/goldens/*.npz so the test suite never
needs the reference repo at runtime. Run from repo root:

    python scripts/make_goldens.py
"""
import os
import sys

import numpy as np
import torch

REFERENCE = "/root/reference"
OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")

sys.path.insert(0, REFERENCE)

from src.physics.navier_stokes import NavierStokesSimulator  # noqa: E402
from src.physics.fractal_generator import FractalGenerator  # noqa: E402
from src.physics.smoke_simulator import SmokeSimulator  # noqa: E402


def solver_goldens():
    torch.manual_seed(0)
    sim = NavierStokesSimulator(grid_size=(64, 64), dt=0.01, viscosity=0.001,
                                device="cpu")
    sim.add_smoke_source(32, 20, radius=8, intensity=1.5)
    sim.add_smoke_source(45, 40, radius=10, intensity=0.8)
    density_init = sim.density.numpy().copy()

    frames, us, vs, ps = [], [], [], []
    for _ in range(5):
        sim.step()
        frames.append(sim.density.numpy().copy())
        us.append(sim.u.numpy().copy())
        vs.append(sim.v.numpy().copy())
        ps.append(sim.p.numpy().copy())

    np.savez(
        os.path.join(OUT_DIR, "solver_64.npz"),
        density_init=density_init,
        density=np.stack(frames),
        u=np.stack(us),
        v=np.stack(vs),
        p=np.stack(ps),
    )
    print("solver_64.npz written, final density sum", frames[-1].sum())


def fractal_goldens():
    gen = FractalGenerator(device="cpu")
    perlin = gen.generate_perlin_noise((64, 64)).numpy()
    mandelbrot = gen.generate_mandelbrot_field((64, 64)).numpy()
    field = torch.rand(64, 64, generator=torch.Generator().manual_seed(1))
    perturbed = gen.apply_fractal_perturbation(field, intensity=0.05).numpy()
    np.savez(
        os.path.join(OUT_DIR, "fractal_64.npz"),
        perlin=perlin,
        mandelbrot=mandelbrot,
        field=field.numpy(),
        perturbed=perturbed,
    )
    print("fractal_64.npz written")


def chaos_goldens():
    sim = SmokeSimulator(grid_size=(64, 64), dt=0.01, viscosity=0.001,
                         device="cpu")
    sim.add_incense_source([(32, 20), (45, 40)], [1.5, 0.8])
    seq = []
    feats = []
    for t in range(20):
        density = sim.simulate_step()
        seq.append(density.numpy().copy())
        if t >= 10:
            f = sim.get_chaos_features()
            if f:
                feats.append(
                    [f["lyapunov_exponent"], f["fractal_dimension"], f["entropy"]]
                )
    avg = np.mean(np.array(feats), axis=0)
    np.savez(
        os.path.join(OUT_DIR, "chaos_64.npz"),
        sequence=np.stack(seq),
        per_step_features=np.array(feats),
        avg_features=avg,
    )
    print("chaos_64.npz written, avg features", avg)


def torch_ops_goldens():
    """Goldens for torch building blocks the model must reproduce:
    bilinear interpolate (pos-emb resize path, smokephys_net.py:98-107) and
    adaptive average pooling (smokephys_net.py:31, :91)."""
    g = torch.Generator().manual_seed(2)
    x = torch.rand(1, 4, 16, 16, generator=g)
    interp = torch.nn.functional.interpolate(
        x, size=(5, 5), mode="bilinear", align_corners=False
    ).numpy()
    pool_even = torch.nn.functional.adaptive_avg_pool2d(x, (4, 4)).numpy()
    pool_odd = torch.nn.functional.adaptive_avg_pool2d(x, (5, 5)).numpy()
    np.savez(
        os.path.join(OUT_DIR, "torch_ops.npz"),
        x=x.numpy(),
        interp_5=interp,
        pool_4=pool_even,
        pool_5=pool_odd,
    )
    print("torch_ops.npz written")


def numpy_lorenz_fields(seed: int, num_layers: int, batch: int, seq_len: int):
    """[num_layers, B, L, 3] chaos fields: 5-step Euler Lorenz from 0.1*N(0,1)
    inits (reference chaos_attention.py:47-66), computed in numpy so the same
    arrays can be injected into BOTH the torch reference and the Flax model."""
    rng = np.random.default_rng(seed)
    fields = []
    for _ in range(num_layers):
        s = (0.1 * rng.standard_normal((batch, 3))).astype(np.float32)
        traj = []
        for _ in range(5):
            x, y, z = s[:, 0], s[:, 1], s[:, 2]
            s = np.stack(
                [
                    x + 0.01 * (10.0 * (y - x)),
                    y + 0.01 * (x * (28.0 - z) - y),
                    z + 0.01 * (x * y - (8.0 / 3.0) * z),
                ],
                axis=-1,
            ).astype(np.float32)
            traj.append(s)
        traj = np.stack(traj, axis=1)  # [B, 5, 3]
        n_rep = -(-seq_len // 5)
        fields.append(np.tile(traj, (1, n_rep, 1))[:, :seq_len])
    return np.stack(fields)


def model_goldens():
    """Full-model forward parity golden (VERDICT r1 item 1): synthesize a
    deterministic full-size torch state dict, run the reference SmokePhysNet
    eval forward with injected chaos fields, and record the outputs. The
    state dict itself is NOT committed — tests/test_torch_port.py regenerates
    it from the same (key, shape, seed) metadata via synth_torch_state."""
    import json

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from smokephysai_tpu.models.torch_port import synth_torch_state  # noqa: E402
    from src.models.smokephys_net import SmokePhysNet as TorchNet  # noqa: E402
    from src.models.chaos_attention import (  # noqa: E402
        ChaosAttention as TorchChaosAttention,
    )

    SEED, B, L = 7, 2, 1024
    model = TorchNet()
    keys_shapes = {
        k: tuple(v.shape)
        for k, v in model.state_dict().items()
        if "num_batches_tracked" not in k and "lorenz_" not in k
    }
    state = synth_torch_state(keys_shapes, seed=SEED)
    model.load_state_dict(
        {k: torch.from_numpy(v) for k, v in state.items()}, strict=False
    )
    model.eval()

    fields = numpy_lorenz_fields(seed=11, num_layers=6, batch=B, seq_len=L)
    calls = {"i": 0}

    def patched(self, seq_len, batch_size, device):
        f = torch.from_numpy(fields[calls["i"] % 6])
        calls["i"] += 1
        return f[:, :seq_len]

    TorchChaosAttention.generate_chaos_field = patched

    rng = np.random.default_rng(13)
    x = rng.uniform(0.0, 1.0, (B, 1, 128, 128)).astype(np.float32)
    with torch.no_grad():
        out = model(torch.from_numpy(x), return_features=True)
    assert calls["i"] == 6, calls["i"]

    np.savez_compressed(
        os.path.join(OUT_DIR, "model_forward_128.npz"),
        seed=np.int64(SEED),
        keys_shapes=np.frombuffer(
            json.dumps({k: list(v) for k, v in keys_shapes.items()}).encode(),
            dtype=np.uint8,
        ),
        input=x,
        chaos_fields=fields,
        reconstructed=out["reconstructed"].numpy(),
        physics_features=out["physics_features"].numpy(),
        latent_features=out["latent_features"].numpy(),
        intermediate_features=out["intermediate_features"].numpy(),
    )
    print(
        "model_forward_128.npz written; recon mean",
        out["reconstructed"].mean().item(),
        "phys", out["physics_features"].numpy().ravel()[:3],
    )


if __name__ == "__main__":
    os.makedirs(OUT_DIR, exist_ok=True)
    solver_goldens()
    fractal_goldens()
    chaos_goldens()
    torch_ops_goldens()
    model_goldens()
