"""Test environment: force the CPU backend with 8 virtual devices.

The container's sitecustomize pre-imports jax and registers the remote-TPU
(axon) platform, so plain env vars are too late here; ``jax.config`` still
wins as long as no backend has been initialized. Multi-device sharding tests
then run on a virtual CPU mesh (replacing the reference's missing
fake-cluster story, see SURVEY.md §4); real-TPU execution is exercised by
bench.py / the driver instead.
"""

import os

os.environ['JAX_PLATFORMS'] = 'cpu'

import jax

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_num_cpu_devices', 8)
