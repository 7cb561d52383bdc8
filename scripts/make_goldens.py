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


if __name__ == "__main__":
    os.makedirs(OUT_DIR, exist_ok=True)
    solver_goldens()
    fractal_goldens()
    chaos_goldens()
    torch_ops_goldens()
