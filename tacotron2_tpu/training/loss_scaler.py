"""Dynamic loss scaling (optional fp16-parity path).

On TPU, bf16 needs no loss scaling — this exists for parity with the
reference's documented overflow-skip semantics (/root/reference/
loss_scaler.py:31-80, executed in practice by Apex AMP, train.py:222-231):
scale starts at 2**32, halves on overflow (non-finite grads -> step
skipped), doubles after ``scale_window`` consecutive good steps.

Pure pytree state + functions, usable inside a jitted train step via
``lax.cond``-free arithmetic (the skip is expressed as a 0/1 multiplier).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp


class LossScalerState(NamedTuple):
    scale: jnp.ndarray          # f32 scalar
    good_steps: jnp.ndarray     # i32 consecutive non-overflow steps


def init_loss_scaler(init_scale: float = 2.0 ** 32) -> LossScalerState:
    return LossScalerState(jnp.asarray(init_scale, jnp.float32),
                           jnp.zeros((), jnp.int32))


def scale_loss(state: LossScalerState, loss: jnp.ndarray) -> jnp.ndarray:
    return loss * state.scale


def unscale_and_check(state: LossScalerState, grads: Any,
                      scale_factor: float = 2.0,
                      scale_window: int = 1000,
                      ) -> Tuple[Any, jnp.ndarray, LossScalerState]:
    """Unscale grads; detect overflow; update the scale.

    Returns (unscaled_grads, ok, new_state) where ``ok`` is a bool scalar —
    False means skip the optimizer step this iteration (the reference's
    ``is_overflow`` path, train.py:228-236).
    """
    inv = 1.0 / state.scale
    grads = jax.tree.map(lambda g: g * inv, grads)
    finite = jnp.all(jnp.asarray(
        [jnp.all(jnp.isfinite(g)) for g in jax.tree.leaves(grads)]))

    new_scale = jnp.where(
        finite,
        jnp.where(state.good_steps + 1 >= scale_window,
                  state.scale * scale_factor, state.scale),
        state.scale / scale_factor)
    new_good = jnp.where(
        finite,
        jnp.where(state.good_steps + 1 >= scale_window,
                  0, state.good_steps + 1),
        0)
    return grads, finite, LossScalerState(new_scale, new_good)


def apply_or_skip(updates: Any, ok: jnp.ndarray) -> Any:
    """Zero the updates when ``ok`` is False (skip the step without
    branching — keeps the train step a single fused computation)."""
    keep = ok.astype(jnp.float32)
    return jax.tree.map(lambda u: u * keep, updates)
