"""Shared test helpers: jit-wrapped init/loss/predict.

Eager flax ``init``/``apply`` dispatches thousands of individual ops — on
the suite's 1-core CPU host that costs minutes per model test. Jitting
funnels everything through ONE compile, which the persistent compile cache
(conftest) then reuses across runs: the suite is compile-dominated, so this
is the wall-time lever. Fixtures build losses AND grads in a single
``value_and_grad`` trace instead of separate loss/grad compiles.
"""

import jax


def jit_init(model, batch, mode='feats', seed=0):
    """Jitted ``model.init`` (one compile instead of eager op dispatch)."""
    return jax.jit(lambda r, b: model.init(r, b, train=False, mode=mode))(
        jax.random.PRNGKey(seed), batch)


def jit_losses_and_grads(model, variables, batch):
    """One jitted value_and_grad pass -> (total, losses dict, grads tree)."""

    def loss_fn(params):
        losses, _ = model.apply(
            {'params': params, 'batch_stats': variables['batch_stats']},
            batch, train=True, mode='loss', mutable=['batch_stats'])
        return sum(losses.values()), losses

    (total, losses), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True))(variables['params'])
    return total, losses, grads


def jit_losses(model, variables, batch):
    """Jitted loss-only forward -> losses dict."""
    losses, _ = jax.jit(
        lambda v, b: model.apply(v, b, train=True, mode='loss',
                                 mutable=['batch_stats']))(variables, batch)
    return losses


def jit_predict(model, variables, batch):
    """Jitted predict forward."""
    return jax.jit(
        lambda v, b: model.apply(v, b, train=False, mode='predict'))(
            variables, batch)
