"""Train state + jit-compiled update step.

Equivalent of the reference's Lightning plumbing (`trainer_complete.py:63-71,
127-129`): Adam(lr) over the full parameter pytree, gradient all-reduce over
the data axis handled by XLA's SPMD partitioner (no DDP machinery).
"""
from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from plankassembly_tpu.models.model import ModelDims, train_step_loss


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(lr: float) -> optax.GradientTransformation:
    return optax.adam(lr)


def init_state(params, optimizer) -> TrainState:
    return TrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32))


def make_train_step(optimizer, dims: ModelDims, compute_dtype=jnp.bfloat16,
                    donate: bool = True, flash: bool = False,
                    loss_impl=None):
    """Build the jitted training step.

    The returned fn takes (state, batch, rng) and returns (state, metrics).
    With params replicated and batch sharded over the 'data' mesh axis, XLA
    inserts the gradient all-reduce automatically.

    loss_impl: alternative loss fn with the `train_step_loss` signature
    (e.g. the raster/ViT variant's).
    """
    loss_impl = loss_impl or train_step_loss

    def step(state: TrainState, batch, rng):
        def loss_fn(params):
            return loss_impl(params, batch, dims, rng=rng,
                             deterministic=False,
                             compute_dtype=compute_dtype, flash=flash)

        (loss, mets), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), mets

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_device_train_step(optimizer, dims: ModelDims,
                           compute_dtype=jnp.bfloat16, donate: bool = True,
                           flash: bool = False, loss_impl=None):
    """Training step fused with on-device batch assembly (device-resident
    data, `data/device_loader.py`): one dispatch per step does
    gather(fields, idx) -> scatter(aug rows) -> loss/grads/Adam.

    The returned fn takes (state, fields, idx, aug, pos, rng). `fields` is
    the HBM-resident packed split, passed as an ARGUMENT every call — never
    close over it, or the arrays bake into the executable as constants.
    `pos` entries equal to the batch size mean "no augmented row" (dropped
    by the scatter's out-of-bounds mode)."""
    loss_impl = loss_impl or train_step_loss

    def step(state: TrainState, fields, idx, aug, pos, rng):
        batch = {}
        for key, store in fields.items():
            gathered = store[idx]
            batch[key] = gathered.at[pos].set(aug[key], mode="drop")

        def loss_fn(params):
            return loss_impl(params, batch, dims, rng=rng,
                             deterministic=False,
                             compute_dtype=compute_dtype, flash=flash)

        (loss, mets), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), mets

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_packed_device_train_step(optimizer, dims: ModelDims, layout,
                                  batch_size: int, max_aug_rows: int,
                                  compute_dtype=jnp.bfloat16,
                                  donate: bool = True, flash: bool = False,
                                  loss_impl=None, batch_sharding=None):
    """`make_device_train_step` taking the loader's single flat int16 buffer
    (`data/device_loader.py`): the whole step's host->device traffic is ONE
    transfer; idx/pos/aug unpack with static slices inside the program.

    `batch_sharding` (a NamedSharding over the data axis) is applied to the
    assembled batch so that on a multi-device mesh the gather output is
    re-sharded for data parallelism instead of staying wherever the
    resident store lives (advisor finding r2)."""
    from plankassembly_tpu.data.device_loader import unpack_flat

    loss_impl = loss_impl or train_step_loss

    def step(state: TrainState, fields, buf, rng):
        idx, pos, aug = unpack_flat(buf, layout, batch_size, max_aug_rows)
        batch = {}
        for key, store in fields.items():
            gathered = store[idx]
            b = gathered.at[pos].set(aug[key], mode="drop")
            if batch_sharding is not None:
                b = jax.lax.with_sharding_constraint(b, batch_sharding)
            batch[key] = b

        def loss_fn(params):
            return loss_impl(params, batch, dims, rng=rng,
                             deterministic=False,
                             compute_dtype=compute_dtype, flash=flash)

        (loss, mets), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), mets

    return jax.jit(step, donate_argnums=(0,) if donate else ())
