"""Test configuration: force CPU with 8 virtual devices so multi-chip
sharding paths are exercised without TPU hardware (the TPU-native analog of
the reference's missing distributed test story, SURVEY.md §4).

The driver environment registers a remote TPU backend through
sitecustomize and pins JAX_PLATFORMS=axon; tests must not ride the tunnel,
so both the env var and the jax config are overridden here before any
backend is initialized.
"""
import os
import sys

os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
assert jax.devices()[0].platform == 'cpu', f'tests must run on CPU, got {jax.devices()}'

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
