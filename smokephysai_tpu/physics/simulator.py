"""Smoke simulation facade + fused episode generator.

`SmokeSimulator` mirrors the reference facade's API
(reference src/physics/smoke_simulator.py:8-45) for interactive use: it owns
a `SimState`, steps it, keeps a bounded history, and reports chaos features.

`simulate_episode` is the TPU-native path: a single jitted program that runs
the whole T-step episode under `lax.scan`, applies the (cached) fractal
perturbation to the recorded frames, and computes the episode-averaged chaos
label on-device. The reference generates episodes serially in Python with a
fresh 100-iteration Mandelbrot per step (SURVEY.md §3.1 hot loop #1).

Reference quirk reproduced: the fractal perturbation is applied only to the
*returned/recorded* frame, never written back into the solver state
(reference smoke_simulator.py:31-45 — `self.ns_solver.density` is not
updated with the perturbed frame).
"""
from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp


from . import chaos as chaos_mod
from . import solver
from .fractal import apply_fractal_perturbation, fractal_field
from .state import SimState

Array = jnp.ndarray

FRACTAL_INTENSITY = 0.05  # reference smoke_simulator.py:38
INCENSE_RADIUS = 8.0  # reference smoke_simulator.py:29
MAX_HISTORY = 100  # reference smoke_simulator.py:24


class SmokeSimulator:
    """Stateful convenience wrapper (API parity with the reference facade).

    All computation is jitted; this class only threads the state pytree and
    the host-side history list between calls.
    """

    def __init__(
        self,
        grid_size: Tuple[int, int] = (128, 128),
        dt: float = 0.01,
        viscosity: float = 0.001,
        num_jacobi_iters: int = 20,
        vorticity_eps: float = 0.0,
        use_pallas: bool = False,
        mesh=None,
    ):
        """`mesh` (with a 'space' axis > 1) switches stepping to the
        domain-decomposed solver (parallel/sharded_solver.py) — same
        numerics, grid row-sharded across devices for very large grids."""
        self.grid_size = tuple(grid_size)
        self.dt = dt
        self.viscosity = viscosity
        self.num_jacobi_iters = num_jacobi_iters
        self.vorticity_eps = vorticity_eps
        self.use_pallas = use_pallas
        self.mesh = mesh
        self.state = solver.init_state(self.grid_size)
        self.history: List[Array] = []
        self.max_history = MAX_HISTORY
        self._fractal = jnp.asarray(fractal_field(self.grid_size))

    def reset(self):
        """Reference `ns_solver.setup_grid()` (navier_stokes.py:24-35)."""
        self.state = solver.init_state(self.grid_size)
        self.history = []

    def add_incense_source(self, positions, intensities):
        """Radius-8 sources (reference smoke_simulator.py:26-29)."""
        density = self.state.density
        for (x, y), intensity in zip(positions, intensities):
            density = solver.add_smoke_source(
                density, float(x), float(y), radius=INCENSE_RADIUS,
                intensity=float(intensity),
            )
        self.state = self.state.replace(density=density)

    def simulate_step(self, add_fractal: bool = True) -> Array:
        """One solver step; perturbed frame is recorded but NOT fed back
        (reference smoke_simulator.py:31-45)."""
        if self.mesh is not None and self.mesh.shape.get("space", 1) > 1:
            from smokephysai_tpu.parallel.sharded_solver import sharded_step

            self.state = sharded_step(
                self.state,
                self.mesh,
                dt=self.dt,
                viscosity=self.viscosity,
                num_jacobi_iters=self.num_jacobi_iters,
            )
        else:
            self.state = solver.step(
                self.state,
                dt=self.dt,
                viscosity=self.viscosity,
                num_jacobi_iters=self.num_jacobi_iters,
                vorticity_eps=self.vorticity_eps,
                use_pallas=self.use_pallas,
            )
        density = self.state.density
        if add_fractal:
            density = apply_fractal_perturbation(
                density, FRACTAL_INTENSITY, self._fractal
            )
        self.history.append(density)
        if len(self.history) > self.max_history:
            self.history.pop(0)
        return density

    def get_chaos_features(self) -> dict:
        """Feature dict once >=10 frames exist
        (reference smoke_simulator.py:47-65)."""
        if len(self.history) < 10:
            return {}
        n = min(len(self.history), chaos_mod.LYAPUNOV_WINDOW)
        tail = jnp.stack(self.history[-chaos_mod.LYAPUNOV_WINDOW :])
        feats = chaos_mod.chaos_features(tail, n)
        lyap, fd, ent = jax.device_get(feats)
        return {
            "lyapunov_exponent": float(lyap),
            "fractal_dimension": float(fd),
            "entropy": float(ent),
        }


@functools.partial(
    jax.jit,
    static_argnames=(
        "grid_size",
        "num_steps",
        "num_jacobi_iters",
        "vorticity_eps",
        "use_pallas",
        "max_sources",
    ),
)
def simulate_episode(
    source_xy: Array,
    source_intensity: Array,
    source_active: Array,
    grid_size: Tuple[int, int] = (128, 128),
    num_steps: int = 20,
    dt: float = 0.01,
    viscosity: float = 0.001,
    num_jacobi_iters: int = 20,
    vorticity_eps: float = 0.0,
    use_pallas: bool = False,
    max_sources: int = 3,
) -> Tuple[Array, Array]:
    """One fused episode: sources -> scan(step) -> fractal-perturbed frames
    -> episode chaos label. vmap over the leading axis of the source params
    to generate a whole batch of episodes in one XLA program.

    Args:
      source_xy:        [max_sources, 2] float (x, y) positions
      source_intensity: [max_sources] float intensities
      source_active:    [max_sources] {0,1} mask (reference draws 1-3
                        sources, data_loader.py:49-60; inactive slots are
                        masked instead of shape-changing)
    Returns:
      (sequence [num_steps, H, W] perturbed densities, chaos_label [3])
    """
    state = solver.init_state(grid_size)
    density = state.density
    for i in range(max_sources):
        blob = solver.add_smoke_source(
            jnp.zeros_like(density),
            source_xy[i, 0],
            source_xy[i, 1],
            radius=INCENSE_RADIUS,
            intensity=source_intensity[i],
        )
        density = density + source_active[i] * blob
    state = state.replace(density=density)

    fractal = jnp.asarray(fractal_field(tuple(grid_size)))

    # the time loop lives in solver.multi_step (fused whole-episode Pallas
    # kernel when the grid + trajectory fit VMEM); the fractal perturbation
    # is elementwise, so applying it to the stacked [T, H, W] trajectory is
    # identical to the reference's per-frame application
    _, sequence = solver.multi_step(
        state,
        num_steps,
        dt=dt,
        viscosity=viscosity,
        num_jacobi_iters=num_jacobi_iters,
        vorticity_eps=vorticity_eps,
        use_pallas=use_pallas,
    )
    sequence = apply_fractal_perturbation(sequence, FRACTAL_INTENSITY, fractal)
    label = chaos_mod.chaos_features_from_sequence(sequence)
    return sequence, label
