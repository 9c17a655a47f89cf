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
import pytest

if not os.environ.get('PYSDC_TPU_TEST_REAL'):
    # the sandbox's sitecustomize force-registers the axon TPU platform and
    # overrides JAX_PLATFORMS; the config route still wins
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_enable_x64', True)
# the real-hardware lane keeps the TPU's native float32 — x64 is not
# supported on TPU, and the tpu_smoke tests pin float32 explicitly


# -- fast 'core' profile ---------------------------------------------------
# The reference runs its CI in per-marker environments (pyproject.toml:60-74);
# here one table pins the heavyweight integration tests so `pytest -m core`
# stays under 5 minutes while `pytest` (no -m) still runs everything.
# Matching is by (file basename, test-name prefix) so parametrized cases are
# covered without editing each module.
_SLOW = {
    # whole heavyweight integration suites: their parity tests compile
    # multi-minute XLA programs; tests/test_core_smoke.py keeps one
    # small-shape smoke per lane in the core profile (round-5 rebalance —
    # the round-4 core lane could not finish on a 2-core host)
    ('test_fused.py', ''),
    ('test_sharded.py', ''),
    ('test_sparse.py', ''),
    ('test_examples.py', 'test_example_runs[step_9'),
    ('test_examples.py', 'test_example_runs[step_10'),
    ('test_sharded.py', 'test_pipelined_coarse_chain_matches_replicated'),
    ('test_sharded.py', 'test_sharded_three_axis_mesh'),
    ('test_examples.py', 'test_example_runs[step_5'),
    ('test_examples.py', 'test_example_runs[step_6'),
    ('test_examples.py', 'test_example_runs[step_4'),
    ('test_spectral.py', ''),
    ('test_baseline_configs.py', ''),
    ('test_sharded.py', 'test_sharded_time_space_mesh_2d'),
    ('test_sharded.py', 'test_sharded_adaptivity_matches_virtual'),
    ('test_sharded.py', 'test_sharded_stats_equivalence_adaptive_run'),
    ('test_sharded.py', 'test_sharded_matches_virtual_pfasst[4]'),
    ('test_sharded.py', 'test_graft_entry_surface'),
    ('test_sweeper_families.py', 'test_multistep_orders'),
    ('test_controllers.py', 'test_pfasst_tutorial_step6_iteration_counts[8]'),
    ('test_controllers.py', 'test_pfasst_tutorial_step6_iteration_counts[4]'),
    ('test_controllers.py', 'test_pfasst_residuals_decrease_and_equivalence_across_block_sizes'),
    ('test_controllers.py', 'test_mssdc_matches_serial_sdc'),
    ('test_quench_boussinesq.py', ''),
    ('test_monodomain.py', ''),
    ('test_boris_power_dae.py', ''),
    ('test_matrix_controller.py', 'test_matrix_pfasst_matches_step_controller'),
    ('test_transfer.py', 'test_fft_transfer_roundtrip_identity'),
    ('test_wscc9_rdc.py', ''),
    ('test_logging_hooks_extra.py', 'test_plot_post_step'),
    ('test_logging_hooks_extra.py', 'test_log_extrapolation_error_estimate'),
    ('test_convergence_controllers.py', 'test_adaptive_collocation_reaches_final_rule_accuracy'),
    ('test_allen_cahn_spectral.py', 'test_allencahn_temp_coupling'),
    ('test_runge_kutta.py', 'test_new_rk_order_nonlinear'),
    ('test_runge_kutta.py', 'test_rk_order_nonlinear'),
    ('test_runge_kutta.py', 'test_new_imex_order'),
    ('test_pallas_stencil.py', 'test_halo_cross_arbitrary_width[4]'),
    ('test_tpu_smoke.py', 'test_mlsdc_coarse_64_grid_runs'),
    ('test_fused.py', 'test_fused_adaptive_allen_cahn_pfasst_block'),
    ('test_examples.py', 'test_example_runs[step_12'),
    ('test_examples.py', 'test_example_runs[step_13'),
    ('test_examples.py', 'test_example_runs[step_14'),
    ('test_examples.py', 'test_example_runs[step_15'),
    ('test_examples.py', 'test_example_runs[step_16'),
    ('test_examples.py', 'test_example_runs[step_17'),
    ('test_examples.py', 'test_example_runs[step_18'),
    ('test_examples.py', 'test_example_runs[step_19'),
    ('test_examples.py', 'test_example_runs[step_20'),
    ('test_examples.py', 'test_example_runs[step_21'),
    ('test_examples.py', 'test_example_runs[step_22'),
    ('test_examples.py', 'test_example_runs[step_23'),
    ('test_examples.py', 'test_example_runs[step_24'),
    ('test_examples.py', 'test_example_runs[step_25'),
    ('test_examples.py', 'test_example_runs[step_26'),
    ('test_fused.py', 'test_fused_adaptive_van_der_pol_block'),
    ('test_fused.py', 'test_run_autodispatch_lanes'),
    ('test_tpu_smoke.py', 'test_restol_reachable_in_float32'),
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        fname = os.path.basename(str(item.fspath))
        is_slow = any(f == fname and item.name.startswith(pref) for f, pref in _SLOW)
        item.add_marker(pytest.mark.slow if is_slow else pytest.mark.core)
