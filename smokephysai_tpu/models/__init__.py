from .chaos_attention import ChaosAttention
from .net import ChaosTransformerLayer, SmokePhysNet
from .regularizer import (
    continuity_loss,
    divergence_loss,
    energy_conservation_loss,
    mass_conservation_loss,
    physics_losses,
)

__all__ = [
    "ChaosAttention",
    "ChaosTransformerLayer",
    "SmokePhysNet",
    "mass_conservation_loss",
    "continuity_loss",
    "energy_conservation_loss",
    "divergence_loss",
    "physics_losses",
]
