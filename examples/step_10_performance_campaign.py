"""Step 10: time-parallel scaling campaign (the JUBE/Performance analog).

Counterpart of the reference's Performance project campaigns
(projects/Performance/timings_BSC.txt:2-34, JUBE result tables
bench_run_SPxTP/.../result.dat): sweep the number of time-parallel ranks P
at fixed space size, record wall clock + iteration counts, and report
speedup/efficiency against serial SDC.  Two measurements per P:

  - virtual block run on the attached device(s): T_parallel is projected
    as T_block / P (each rank executes 1/P of the block's work in
    lockstep) — the comm-free upper bound;
  - when >= P devices are attached, the sharded controller measures the
    same schedule with real collectives.

The classic PFASST trade-off must be visible: iteration counts grow with
P (the reference's JUBE data shows niter 4 -> 7 from 1 -> 12 ranks), so
parallel efficiency sits well below 1.
"""
import time

import jax
jax.config.update('jax_enable_x64', True)
import jax.numpy as jnp

from pysdc_tpu import ControllerNonMPI, GenericImplicit, ShardedController, get_sorted, make_mesh
from pysdc_tpu.models.heat import HeatND


def _description(nvars=(64, 64), coarse=(32, 32)):
    return dict(
        problem_class=HeatND,
        problem_params=dict(nu=0.1, freq=2, nvars=[nvars, coarse], bc='periodic'),
        sweeper_class=GenericImplicit,
        sweeper_params=dict(quad_type='RADAU-RIGHT', num_nodes=[3], QI='LU'),
        level_params=dict(restol=1e-8, dt=0.05),
        step_params=dict(maxiter=50),
        space_transfer_params=dict(rorder=2, iorder=6, periodic=True),
    )


def _run(controller, u0, Tend):
    controller.run(u0, 0.0, Tend)  # warm (compile)
    start = time.perf_counter()
    _, stats = controller.run(u0, 0.0, Tend)
    elapsed = time.perf_counter() - start
    iters = [v for _, v in get_sorted(stats, type='niter')]
    return elapsed, iters


def main():
    desc = _description()
    cp = {'logger_level': 40, 'predict_type': 'pfasst_burnin'}
    Ps = (1, 2, 4, 8)
    Tend = max(Ps) * desc['level_params']['dt']
    n_dev = len(jax.devices())

    serial = ControllerNonMPI(1, {'logger_level': 40}, desc)
    prob = serial.MS[0].levels[0].prob
    u0 = prob.u_exact(0.0)
    t_serial, it_serial = _run(serial, u0, Tend)

    # result.dat-style table (reference JUBE result format)
    print(f'{"P":>3} {"t_block[s]":>11} {"t_proj[s]":>10} {"speedup":>8} {"eff":>6} {"niter":>6} {"mode":>8}')
    print(f'{1:>3} {t_serial:>11.3f} {t_serial:>10.3f} {1.0:>8.2f} {1.0:>6.2f} {max(it_serial):>6} {"serial":>8}')

    rows = []
    for P in Ps[1:]:
        block = ControllerNonMPI(P, cp, desc)
        t_block, iters = _run(block, u0, Tend)
        t_proj = t_block / P
        speedup = t_serial / t_proj
        rows.append((P, max(iters), speedup))
        print(f'{P:>3} {t_block:>11.3f} {t_proj:>10.3f} {speedup:>8.2f} {speedup / P:>6.2f} '
              f'{max(iters):>6} {"virtual":>8}')

        if n_dev >= P:
            sharded = ShardedController(P, cp, desc, mesh=make_mesh(n_time=P))
            t_sh, it_sh = _run(sharded, u0, Tend)
            print(f'{P:>3} {t_sh:>11.3f} {t_sh:>10.3f} {t_serial / t_sh:>8.2f} '
                  f'{t_serial / t_sh / P:>6.2f} {max(it_sh):>6} {"sharded":>8}')
            assert it_sh == iters, 'sharded schedule must match the virtual oracle'

    # the classic trade-off: more ranks, more iterations, sublinear speedup
    assert rows[-1][1] >= max(it_serial), 'PFASST iteration counts should not shrink with P'
    assert all(s > 0 for _, _, s in rows)


if __name__ == '__main__':
    main()
