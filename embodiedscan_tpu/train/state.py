"""Train state, optimizer, and the pjit-able train step.

Mirrors the reference schedule (configs/detection/mv-det3d...py:219-231):
AdamW(lr=1e-3, wd=1e-4) + global-norm clip 10 + MultiStepLR [8, 11] x0.1 over
12 epochs, with optional per-parameter lr multipliers (the grounding config's
``lr_mult=0`` text encoder / 0.1 decoder — mv-grounding...py:197-201) and
stage freezing expressed as optimizer masks instead of requires_grad flags.
"""

from typing import Any, Callable, NamedTuple

import flax
import jax
import jax.numpy as jnp
import optax


class TrainState(NamedTuple):
    """Carried training state (a pytree; shardable under pjit)."""
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


def multistep_lr(base_lr: float, steps_per_epoch: int, milestones=(8, 11),
                 gamma: float = 0.1) -> optax.Schedule:
    """Epoch-based MultiStepLR as a step schedule."""
    boundaries = {m * steps_per_epoch: gamma for m in milestones}
    return optax.piecewise_constant_schedule(base_lr, boundaries)


def make_optimizer(lr_schedule: optax.Schedule,
                   weight_decay: float = 1e-4,
                   clip_norm: float = 10.0,
                   lr_mult_fn: Callable[[tuple], float] | None = None,
                   params_template: Any = None
                   ) -> optax.GradientTransformation:
    """AdamW + clip, with optional per-path lr multipliers.

    lr_mult_fn maps a flattened param path to a multiplier; 0.0 freezes the
    parameter (the JAX equivalent of the reference's lr_mult/frozen_stages,
    mv-grounding...py:197-201). When given, ``params_template`` (an example
    params pytree) is required to build the per-group transforms eagerly.
    """
    tx = optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.adamw(lr_schedule, weight_decay=weight_decay),
    )
    if lr_mult_fn is None:
        return tx
    assert params_template is not None, 'lr_mult_fn needs params_template'
    flat = flax.traverse_util.flatten_dict(params_template)
    labels_flat = {k: f'm{lr_mult_fn(k)}' for k in flat}
    mults = {labels_flat[k]: lr_mult_fn(k) for k in flat}
    labels = flax.traverse_util.unflatten_dict(labels_flat)
    transforms = {
        name: (optax.chain(tx, optax.scale(m)) if m != 1.0 else tx)
        if m != 0.0 else optax.set_to_zero()
        for name, m in mults.items()
    }
    return optax.multi_transform(transforms, labels)


def create_train_state(model, variables, tx) -> TrainState:
    """Initialize optimizer state from initialized model variables."""
    params = variables['params']
    batch_stats = variables.get('batch_stats', {})
    return TrainState(jnp.zeros((), jnp.int32), params, batch_stats,
                      tx.init(params))


def make_train_step(model, tx, loss_mode: str = 'loss'):
    """Build the jittable train step: grads + optimizer + batch-stats update."""

    def train_step(state: TrainState, batch):
        def loss_fn(params):
            out, mutated = model.apply(
                {'params': params, 'batch_stats': state.batch_stats},
                batch, train=True, mode=loss_mode, mutable=['batch_stats'])
            total = sum(out.values())
            return total, (out, mutated['batch_stats'])

        (total, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(state.step + 1, new_params, new_stats, new_opt)
        metrics = dict(losses, loss_total=total)
        return new_state, metrics

    return train_step


def make_train_step_sharded(model, tx, mesh, loss_mode: str = 'loss'):
    """DDP-style train step: per-device replica via ``shard_map`` + grad pmean.

    The global-pjit step (:func:`make_train_step` under data-sharded
    ``in_shardings``) lets XLA partition *ops*: the flat batch engine's
    coordinate sorts run over all B*N rows of the global batch, and the SPMD
    partitioner must insert collectives (all-gathers) around every sharded
    sort. This step instead partitions *the program*: each device runs the
    full model on its local batch shard (so every engine sort is
    device-local by construction — the only possible collectives are the
    explicit pmeans below), then gradients are averaged over the ``data``
    axis. This is exactly the reference's DDP semantics
    (tools/train.py:46-49: per-rank loss -> gradient all-reduce mean),
    including its per-rank loss normalizers.

    Requires a 1D ``(data,)`` mesh (view parallelism needs the op-level
    partitioner) and batch size divisible by ``mesh.size``. State is
    replicated; identical pmean'd grads keep it replicated.
    """
    from ..parallel.mesh import DATA_AXIS, VIEW_AXIS
    assert VIEW_AXIS not in mesh.axis_names, (
        'sharded (DDP) step supports the 1D data mesh only; use the pjit '
        'step for view parallelism')
    from jax.sharding import PartitionSpec as P

    def local_step(state: TrainState, batch):
        def loss_fn(params):
            out, mutated = model.apply(
                {'params': params, 'batch_stats': state.batch_stats},
                batch, train=True, mode=loss_mode, mutable=['batch_stats'])
            total = sum(out.values())
            return total, (out, mutated['batch_stats'])

        (total, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        # DDP gradient all-reduce mean; stats/metrics averaged the same way
        # so the replicated state stays bitwise identical across devices
        grads, new_stats, losses, total = jax.lax.pmean(
            (grads, new_stats, losses, total), DATA_AXIS)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(state.step + 1, new_params, new_stats, new_opt)
        return new_state, dict(losses, loss_total=total)

    def train_step(state: TrainState, batch):
        return jax.shard_map(
            local_step, mesh=mesh,
            in_specs=(P(), {k: P(DATA_AXIS) for k in batch}),
            out_specs=(P(), P()), check_vma=False)(state, batch)

    return train_step
