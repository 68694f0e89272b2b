"""Pure-functional train state.

Replaces the reference's mutable `tf.Variable`s + in-class train loop + RAM
deepcopy best-model tracking (reference src/recommender/models/BPRMF.py:48-53,
127-192) with an immutable pytree threaded through a jitted step function.
The "best model" is just another (device-resident) copy of the params pytree.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

Params = Any
OptState = Any


class TrainState(NamedTuple):
    step: jnp.ndarray  # scalar int32
    params: Params
    opt_state: OptState


def tf_parity_adam(lr: float) -> optax.GradientTransformation:
    """Adam with TF-Keras defaults.

    The reference uses `tf.keras.optimizers.Adam(lr)` (BPRMF.py:52) whose
    epsilon is 1e-7 (optax's default is 1e-8); bias correction is equivalent.
    TF's sparse path decays the full moment buffers every step and applies the
    dense update to all rows, so a dense optax Adam reproduces it exactly.
    """
    return optax.adam(learning_rate=lr, b1=0.9, b2=0.999, eps=1e-7)


def create_train_state(
    params: Params, tx: optax.GradientTransformation
) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
    )


def apply_gradients(
    state: TrainState, grads: Params, tx: optax.GradientTransformation
) -> TrainState:
    updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    return TrainState(state.step + 1, new_params, new_opt_state)
