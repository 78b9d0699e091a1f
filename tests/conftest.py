"""Test configuration: run all tests on a virtual 8-device CPU backend.

Multi-chip sharding semantics are validated without TPU hardware via
`--xla_force_host_platform_device_count` (SURVEY.md §4 test strategy).
Environment must be set before jax is imported anywhere.
"""

import os
import sys

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
_flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (
        _flags + ' --xla_force_host_platform_device_count=8').strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The container's sitecustomize force-registers the axon TPU platform and
# overrides JAX_PLATFORMS; re-point jax at the virtual 8-device CPU backend.
jax.config.update('jax_platforms', 'cpu')

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
