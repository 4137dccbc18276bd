"""Precision helpers.

Geometry math (3x3 rotations, box corners, IoU) must run in true float32 even
on TPU, where the default matmul precision is bfloat16. ``f32_matmuls`` pins
matmul/einsum precision for everything traced inside the wrapped function;
model code is left at the fast default.
"""

import functools

import jax


def f32_matmuls(fn):
    """Decorator: trace ``fn`` with float32 matmul precision."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision('float32'):
            return fn(*args, **kwargs)

    return wrapped
