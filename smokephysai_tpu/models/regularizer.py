"""Physics-regularisation losses as pure functions.

Re-design of reference src/models/physics_regularizer.py:5-109 (an nn.Module
with no parameters there; plain functions are the JAX idiom). Same terms,
same dict-keyed dispatch, same weights — including the fixed 0.5 divergence
weight (physics_regularizer.py:106).
"""
from __future__ import annotations

import jax.numpy as jnp

Array = jnp.ndarray


def mass_conservation_loss(
    density_pred: Array, density_target: Array, reduce: str = "sum"
) -> Array:
    """MSE of per-image total mass (reference physics_regularizer.py:18-24).
    Works for NHWC [B,H,W,1] or [B,H,W]: sums over trailing spatial dims.

    reduce="mean" compares per-voxel mean density instead — used by the 3D
    path (no reference analog), where total-mass differences scale with the
    2M-voxel volume and would drown every other loss term."""
    axes = tuple(range(1, density_pred.ndim))
    op = jnp.sum if reduce == "sum" else jnp.mean
    mass_pred = op(density_pred, axis=axes)
    mass_target = op(density_target, axis=axes)
    return jnp.mean((mass_pred - mass_target) ** 2)


def continuity_loss(density_sequence: Array) -> Array:
    """Mean |d(density)/dt| over a [B, T, ...] sequence
    (reference physics_regularizer.py:26-35)."""
    if density_sequence.shape[1] < 2:
        return jnp.float32(0.0)
    time_grad = density_sequence[:, 1:] - density_sequence[:, :-1]
    return jnp.mean(jnp.abs(time_grad))


def energy_conservation_loss(velocity_pred: Array) -> Array:
    """Penalise kinetic-energy increase over the leading (time) axis
    (reference physics_regularizer.py:37-49)."""
    kinetic = 0.5 * jnp.sum(velocity_pred**2, axis=1)
    if kinetic.shape[0] <= 1:
        return jnp.float32(0.0)
    increase = jnp.maximum(kinetic[1:] - kinetic[:-1], 0.0)
    return jnp.mean(increase)


def divergence_loss(velocity: Array) -> Array:
    """Mean squared forward-difference divergence of a [B, 2, H, W] field,
    with the reference's shape-cropping (physics_regularizer.py:51-71)."""
    if velocity.shape[1] != 2:
        return jnp.float32(0.0)
    u, v = velocity[:, 0], velocity[:, 1]
    du_dx = u[:, :, 1:] - u[:, :, :-1]
    dv_dy = v[:, 1:, :] - v[:, :-1, :]
    min_h = min(du_dx.shape[1], dv_dy.shape[1])
    min_w = min(du_dx.shape[2], dv_dy.shape[2])
    div = du_dx[:, :min_h, :min_w] + dv_dy[:, :min_h, :min_w]
    return jnp.mean(div**2)


def physics_losses(
    predictions: dict,
    targets: dict | None = None,
    conservation_weight: float = 1.0,
    continuity_weight: float = 1.0,
    energy_weight: float = 0.5,
    mass_reduce: str = "sum",
) -> dict:
    """Dict-keyed dispatch matching the reference forward
    (physics_regularizer.py:73-109). Returns per-term losses plus
    'total_physics_loss'."""
    losses = {}
    total = jnp.float32(0.0)

    if "density" in predictions and targets and "density" in targets:
        mass = mass_conservation_loss(
            predictions["density"], targets["density"], reduce=mass_reduce
        )
        losses["mass_conservation"] = mass
        total = total + conservation_weight * mass

    if "density_sequence" in predictions:
        cont = continuity_loss(predictions["density_sequence"])
        losses["continuity"] = cont
        total = total + continuity_weight * cont

    if "velocity" in predictions:
        energy = energy_conservation_loss(predictions["velocity"])
        losses["energy_conservation"] = energy
        total = total + energy_weight * energy

        div = divergence_loss(predictions["velocity"])
        losses["divergence"] = div
        total = total + 0.5 * div  # fixed weight, physics_regularizer.py:106

    losses["total_physics_loss"] = total
    return losses
