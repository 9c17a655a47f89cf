"""Test configuration: force an 8-device virtual CPU platform.

Mirrors the reference's trick of oversubscribing MPI ranks on one CI node
(reference ``pySDC/tests/test_sweepers/test_MPI_sweeper.py:94``): here the
multi-chip code paths run on 8 emulated XLA host devices so sharding is
exercised without TPU pod hardware.  Set PYSDC_TPU_TEST_REAL=1 to run the
suite on whatever real devices are attached instead.
"""

import os
import sys

if not os.environ.get('PYSDC_TPU_TEST_REAL'):
    os.environ['JAX_PLATFORMS'] = 'cpu'
    flags = os.environ.get('XLA_FLAGS', '')
    if '--xla_force_host_platform_device_count' not in flags:
        os.environ['XLA_FLAGS'] = (flags + ' --xla_force_host_platform_device_count=8').strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if not os.environ.get('PYSDC_TPU_TEST_REAL'):
    # the sandbox's sitecustomize force-registers the axon TPU platform and
    # overrides JAX_PLATFORMS; the config route still wins
    jax.config.update('jax_platforms', 'cpu')

jax.config.update('jax_enable_x64', True)
