from .state import SimState
from .solver import (
    init_state,
    add_smoke_source,
    diffuse,
    advect,
    pressure_projection,
    step,
)
from .fractal import (
    perlin_noise,
    mandelbrot_field,
    fractal_field,
    apply_fractal_perturbation,
)
from .chaos import (
    lyapunov_exponent,
    fractal_dimension,
    shannon_entropy,
    chaos_features_from_sequence,
)
from .simulator import SmokeSimulator, simulate_episode

__all__ = [
    "SimState",
    "init_state",
    "add_smoke_source",
    "diffuse",
    "advect",
    "pressure_projection",
    "step",
    "perlin_noise",
    "mandelbrot_field",
    "fractal_field",
    "apply_fractal_perturbation",
    "lyapunov_exponent",
    "fractal_dimension",
    "shannon_entropy",
    "chaos_features_from_sequence",
    "SmokeSimulator",
    "simulate_episode",
]
