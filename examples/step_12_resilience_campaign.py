"""Step 12: soft-fault statistics campaign — recovery strategies compared.

The campaign shape of the reference Resilience project
(``projects/Resilience/fault_stats.py`` + ``strategies.py``): inject a fixed
ensemble of random bit flips — drawn once, replayed identically against
every strategy (paired trials) — into runs of two problems, and tabulate
how often each recovery strategy restores the solution:

- **fixed**       plain SDC, fixed iteration count, no detection (baseline)
- **iterate**     restol-driven iteration: keep sweeping until the residual
                  recovers (reference strategies.py IterateStrategy)
- **adaptivity**  embedded-error adaptivity: the corrupted step overshoots
                  e_tol and is redone with a smaller dt
                  (reference strategies.py AdaptivityStrategy)
- **hotrod**      Hot Rod detector: embedded-vs-extrapolation discrepancy
                  flags the fault, the step restarts
                  (reference hotrod.py:6, strategies.py HotRodStrategy)

A trial counts as *recovered* when the final error stays within a small
multiple of the same strategy's fault-free error.  The per-strategy
recovery counts are golden-gated; the structural invariant — detection
strategies beat the undefended baseline — is asserted directly.
"""

import jax

jax.config.update('jax_enable_x64', True)
jax.config.update('jax_platforms', 'cpu')

import os

import jax.numpy as jnp
import numpy as np

from pysdc_tpu import ControllerNonMPI, GenericImplicit
from pysdc_tpu.convergence.adaptivity import Adaptivity
from pysdc_tpu.convergence.hotrod import HotRod
from pysdc_tpu.models.heat import HeatND
from pysdc_tpu.models.odes import VanDerPol
from pysdc_tpu.resilience.fault_injection import Fault, FaultInjector
from pysdc_tpu.utils.golden import GoldenStore

N_FAULTS = 12

PROBLEMS = {
    'heat1d': dict(
        problem_class=HeatND,
        problem_params=dict(nvars=64, nu=0.1, freq=2, bc='periodic'),
        Tend=1.0,
        dt=0.1,
        shape=(64,),
    ),
    'van_der_pol': dict(
        problem_class=VanDerPol,
        problem_params=dict(mu=5.0, u0=(2.0, 0.0), newton_tol=1e-10),
        Tend=0.5,
        dt=2.5e-2,
        shape=(2,),
    ),
}


def _description(prob_cfg, strategy):
    desc = dict(
        problem_class=prob_cfg['problem_class'],
        problem_params=dict(prob_cfg['problem_params']),
        sweeper_class=GenericImplicit,
        sweeper_params=dict(num_nodes=3, QI='LU', quad_type='RADAU-RIGHT'),
    )
    if strategy == 'fixed':
        desc.update(level_params=dict(dt=prob_cfg['dt'], restol=-1.0), step_params=dict(maxiter=5))
    elif strategy == 'iterate':
        desc.update(level_params=dict(dt=prob_cfg['dt'], restol=1e-9), step_params=dict(maxiter=99))
    elif strategy == 'adaptivity':
        desc.update(
            level_params=dict(dt=prob_cfg['dt'], restol=-1.0),
            step_params=dict(maxiter=5),
            convergence_controllers={
                Adaptivity: {'e_tol': 1e-7, 'dt_min': prob_cfg['dt'] / 64, 'dt_max': prob_cfg['dt']}
            },
        )
    elif strategy == 'hotrod':
        desc.update(
            level_params=dict(dt=prob_cfg['dt'], restol=-1.0),
            step_params=dict(maxiter=6),
            convergence_controllers={HotRod: {'HotRod_tol': 1e-7, 'no_storage': False}},
        )
    else:
        raise ValueError(strategy)
    return desc


def _run(prob_cfg, strategy, fault=None):
    """One trial: returns (final error vs exact, fault_happened)."""
    desc = _description(prob_cfg, strategy)
    c = ControllerNonMPI(1, {'logger_level': 40}, desc)
    injector = None
    if fault is not None:
        injector = FaultInjector()
        injector.add_fault(fault)
        c.hooks.append(injector)
    P = c.MS[0].levels[0].prob
    try:
        uend, _ = c.run(P.u_exact(0.0), 0.0, prob_cfg['Tend'])
        err = float(jnp.max(jnp.abs(uend - P.u_exact(prob_cfg['Tend']))))
    except Exception:  # NaN blowups / giving up after max restarts = not recovered
        err = float('inf')
    happened = injector.faults[0].happened if injector else False
    return err, happened


def draw_faults(prob_cfg, rng):
    """The fault ensemble, drawn once and replayed against every strategy.

    Iterations capped at 3 so every strategy's iteration range can trigger
    them; bits cover sign/exponent/high-mantissa (the damaging range)."""
    n_steps = int(round(prob_cfg['Tend'] / prob_cfg['dt']))
    return [
        Fault(
            timestep=int(rng.integers(2, n_steps)),
            iteration=int(rng.integers(1, 4)),
            node=int(rng.integers(1, 4)),
            problem_pos=tuple(int(rng.integers(0, s)) for s in prob_cfg['shape']),
            bit=int(rng.integers(0, 24)),
        )
        for _ in range(N_FAULTS)
    ]


def main():
    strategies = ('fixed', 'iterate', 'adaptivity', 'hotrod')
    recovery = {}
    triggered = {}

    for pname, prob_cfg in PROBLEMS.items():
        faults = draw_faults(prob_cfg, np.random.default_rng(2026))
        for strategy in strategies:
            err_ff, _ = _run(prob_cfg, strategy)  # fault-free reference error
            threshold = 5.0 * err_ff + 1e-9
            n_rec = n_hap = 0
            for fault in faults:
                err, happened = _run(
                    prob_cfg, strategy,
                    Fault(**{k: getattr(fault, k) for k in
                             ('timestep', 'iteration', 'node', 'problem_pos', 'bit')}),
                )
                if happened:
                    n_hap += 1
                    n_rec += int(err <= threshold)
            recovery[(pname, strategy)] = n_rec
            triggered[(pname, strategy)] = n_hap
            rate = n_rec / max(n_hap, 1)
            print(f'{pname:12s} {strategy:10s}: {n_rec:2d}/{n_hap:2d} recovered ({rate:.0%})')

    # structural invariants (reference fault_stats.py's headline): every
    # detection/adaptation strategy must beat the undefended baseline
    for pname in PROBLEMS:
        base = recovery[(pname, 'fixed')] / max(triggered[(pname, 'fixed')], 1)
        for strategy in ('iterate', 'adaptivity', 'hotrod'):
            rate = recovery[(pname, strategy)] / max(triggered[(pname, strategy)], 1)
            assert rate >= base, (pname, strategy, rate, base)
        best = max(
            recovery[(pname, s)] / max(triggered[(pname, s)], 1)
            for s in ('iterate', 'adaptivity', 'hotrod')
        )
        assert best >= 0.75, f'{pname}: best strategy only recovered {best:.0%}'

    # golden-gate the exact paired-trial outcome counts
    store = GoldenStore(os.path.join(os.path.dirname(__file__), 'golden', 'step_12_resilience.json'))
    for pname in PROBLEMS:
        store.check(
            f'{pname}_recovered', [recovery[(pname, s)] for s in strategies], rtol=0, atol=0
        )
        store.check(
            f'{pname}_triggered', [triggered[(pname, s)] for s in strategies], rtol=0, atol=0
        )
    store.flush()
    print('resilience campaign: all gates passed')


if __name__ == '__main__':
    main()
