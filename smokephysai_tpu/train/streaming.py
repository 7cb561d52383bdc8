"""Streaming fused sim+encode pipeline.

The BASELINE.json north star requires 'simulation-driven frame generation
running on-device so density/velocity fields never leave HBM between sim
step and model forward' and a streaming 1024^2 @30fps config. The reference
cannot express this: it hops simulator -> host numpy -> model per frame
(reference inference.py:46-71).

`make_streaming_step` fuses one solver step, the fractal perturbation, and
the full SmokePhysNet forward into a single donated XLA program: per frame
the host only receives the (tiny) physics features and, optionally, the
reconstruction. `streaming_rollout` scans N frames entirely on device.
"""
from __future__ import annotations

import functools
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from smokephysai_tpu.physics import solver
from smokephysai_tpu.physics.fractal import fractal_field
from smokephysai_tpu.physics.simulator import FRACTAL_INTENSITY
from smokephysai_tpu.physics.state import SimState

Array = jnp.ndarray


def make_streaming_step(
    model,
    variables: Dict,
    dt: float = 0.01,
    viscosity: float = 0.001,
    num_jacobi_iters: int = 20,
    use_pallas: bool = True,
    vorticity_eps: float = 0.0,
    chaos_seed: int = 0,
    return_reconstruction: bool = True,
) -> Callable[[SimState], Tuple[SimState, Dict[str, Array]]]:
    """One fused frame: solver step -> perturbed frame -> model forward.
    The SimState buffer is donated, so the step runs fully in-place in HBM.
    """
    chaos_key = jax.random.PRNGKey(chaos_seed)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def stream_step(
        state: SimState, variables: Dict
    ) -> Tuple[SimState, Dict[str, Array]]:
        # variables ride as a jit argument, not a closure constant — see
        # serving.make_predictor (closure params embed ~111 MB of literals
        # in the module, which a remote compile service must ingest)
        state = solver.step(
            state,
            dt=dt,
            viscosity=viscosity,
            num_jacobi_iters=num_jacobi_iters,
            vorticity_eps=vorticity_eps,
            use_pallas=use_pallas,
        )
        grid = state.density.shape
        frame = state.density * (
            1.0 + FRACTAL_INTENSITY * jnp.asarray(fractal_field(grid))
        )
        out = model.apply(
            variables,
            frame[None, :, :, None],
            train=False,
            rngs={"chaos": chaos_key},
        )
        result = {"physics_features": out["physics_features"][0], "frame": frame}
        if return_reconstruction:
            result["reconstructed"] = out["reconstructed"][0, :, :, 0]
        return state, result

    return lambda state: stream_step(state, variables)


def streaming_rollout(
    model,
    variables: Dict,
    state: SimState,
    num_frames: int,
    dt: float = 0.01,
    viscosity: float = 0.001,
    num_jacobi_iters: int = 20,
    use_pallas: bool = True,
    chaos_seed: int = 0,
) -> Tuple[SimState, Dict[str, Array]]:
    """Scan `num_frames` fused sim+predict steps in ONE compiled program;
    host sees only the stacked per-frame physics features (and frames).

    Jitted here at module level with `variables` as an argument — callers
    must NOT wrap it in their own jit-over-a-closure (that re-embeds the
    ~111 MB of params as module literals; see serving.make_predictor)."""
    return _rollout_impl(
        variables, state, model=model, num_frames=num_frames, dt=dt,
        viscosity=viscosity, num_jacobi_iters=num_jacobi_iters,
        use_pallas=use_pallas, chaos_seed=chaos_seed,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "model", "num_frames", "dt", "viscosity", "num_jacobi_iters",
        "use_pallas", "chaos_seed",
    ),
)
def _rollout_impl(
    variables, state, *, model, num_frames, dt, viscosity,
    num_jacobi_iters, use_pallas, chaos_seed,
):
    chaos_key = jax.random.PRNGKey(chaos_seed)
    grid = state.density.shape
    fractal = jnp.asarray(fractal_field(grid))

    def body(s, _):
        s = solver.step(
            s,
            dt=dt,
            viscosity=viscosity,
            num_jacobi_iters=num_jacobi_iters,
            use_pallas=use_pallas,
        )
        frame = s.density * (1.0 + FRACTAL_INTENSITY * fractal)
        out = model.apply(
            variables, frame[None, :, :, None], train=False,
            rngs={"chaos": chaos_key},
        )
        return s, {
            "physics_features": out["physics_features"][0],
            "frame": frame,
        }

    return lax.scan(body, state, None, length=num_frames)


def streaming_rollout_sharded(
    model,
    variables: Dict,
    state: SimState,
    num_frames: int,
    mesh,
    axis_name: str = "space",
    dt: float = 0.01,
    viscosity: float = 0.001,
    num_jacobi_iters: int = 20,
    max_disp: int = 2,
    chaos_seed: int = 0,
):
    """`streaming_rollout` with the simulation grid row-sharded over a mesh
    axis — the scale-out path for grids past one chip's HBM/VMEM comfort
    zone (>4k^2). The solver step runs fully domain-decomposed
    (parallel/sharded_solver.py: explicit ppermute halos, numerics equal to
    solver.step); the model forward stays a plain `model.apply` on the
    row-sharded frame and lets GSPMD partition it — the encoder convs are
    spatially local, so XLA inserts the windowed halo exchanges itself,
    and the tiny token trunk/heads replicate.

    Equality vs the single-device rollout is tested on the 8-virtual-device
    CPU mesh (tests/test_streaming.py)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from smokephysai_tpu.parallel.sharded_solver import sharded_step

    chaos_key = jax.random.PRNGKey(chaos_seed)
    grid = state.density.shape
    fractal = jnp.asarray(fractal_field(grid))

    row = NamedSharding(mesh, P(axis_name, None))
    rep = NamedSharding(mesh, P(None, None))
    # u has h+1 rows (staggered) — it can't row-shard evenly; sharded_step
    # moves it into the overlapped row layout itself, so hand it over
    # replicated and let the first to_overlapped reshard it.
    state = state.replace(
        u=jax.device_put(state.u, rep),
        v=jax.device_put(state.v, row),
        p=jax.device_put(state.p, row),
        density=jax.device_put(state.density, row),
    )
    fractal = jax.device_put(fractal, row)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def roll(s, variables):
        # variables as a jit argument, not a closure constant (see
        # serving.make_predictor)
        def body(s, _):
            s = sharded_step(
                s, mesh, dt=dt, viscosity=viscosity,
                num_jacobi_iters=num_jacobi_iters, max_disp=max_disp,
                axis_name=axis_name,
            )
            frame = s.density * (1.0 + FRACTAL_INTENSITY * fractal)
            out = model.apply(
                variables, frame[None, :, :, None], train=False,
                rngs={"chaos": chaos_key},
            )
            return s, {
                "physics_features": out["physics_features"][0],
                "frame": frame,
            }

        return lax.scan(body, s, None, length=num_frames)

    return roll(state, variables)
