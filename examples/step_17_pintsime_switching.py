"""Step 17: power-electronics event handling — the PinTSimE campaign.

The campaign shape of the reference's ``PinTSimE`` project
(``battery_model.py``, ``buck_model.py``, ``switch_estimator`` paper runs):
discontinuous right-hand sides (a battery hitting its reference voltage, a
buck converter's duty-cycled switch) integrated with SDC, where the
:class:`SwitchEstimator` locates the discontinuity by interpolating the
state over the collocation nodes and restarting the step to land ON the
event.

Gates:
- WITHOUT event detection the battery's switch time is only resolved to
  O(dt); WITH the estimator the located time is accurate to the estimator
  tolerance at every dt (the project's headline table);
- the estimator composes with embedded-error adaptivity (the project's
  production mode): event still found, dt adapts around it;
- the N-capacitor battery finds BOTH its switching events in order;
- the buck converter's duty cycle steps the output voltage down to
  ~duty * Vs.
"""

import jax

jax.config.update('jax_enable_x64', True)
jax.config.update('jax_platforms', 'cpu')

import os

import jax.numpy as jnp
import numpy as np

from pysdc_tpu import ControllerNonMPI, IMEXSweeper, get_sorted
from pysdc_tpu.convergence.adaptivity import Adaptivity
from pysdc_tpu.convergence.switch_estimator import SwitchEstimator
from pysdc_tpu.models.power_electronics import Battery, BatteryNCapacitors, BuckConverter
from pysdc_tpu.utils.golden import GoldenStore

T_EVENT = float(np.log(1.2))  # battery: vC crosses V_ref at RC * ln(1.2)


def run_battery(dt, use_estimator, adaptivity=False):
    cc = {}
    if use_estimator:
        cc[SwitchEstimator] = {}
    if adaptivity:
        cc[Adaptivity] = {'e_tol': 1e-7, 'dt_max': 4e-2}
    desc = dict(
        problem_class=Battery,
        problem_params={},
        sweeper_class=IMEXSweeper,
        sweeper_params=dict(num_nodes=4, QI='LU'),
        level_params=dict(dt=dt, restol=-1.0 if adaptivity else 1e-12),
        step_params=dict(maxiter=8),
        convergence_controllers=cc,
    )
    c = ControllerNonMPI(1, {'logger_level': 40}, desc)
    P = c.MS[0].levels[0].prob
    uend, stats = c.run(P.u_exact(0.0), 0.0, 0.5)
    n_steps = len(get_sorted(stats, type='niter', recomputed=False))
    return P, uend, n_steps


def battery_event_accuracy():
    """Event localization vs dt: without the estimator the switch fires
    wherever the state condition happens to trip inside a step (no event
    time is resolved at all, and the post-switch solution carries an O(dt)
    consistency error); with it, the located time hits the true crossing to
    estimator tolerance at EVERY dt."""
    rows = {}
    for dt in (4e-2, 1e-2):
        P, uend_plain, _ = run_battery(dt, use_estimator=False)
        assert not np.isfinite(P.t_switch), 'plain runs never resolve the event time'
        P2, uend_est, _ = run_battery(dt, use_estimator=True)
        err_est = abs(P2.t_switch - T_EVENT)
        rows[dt] = err_est
        # post-switch state: vC pinned at V_ref; the un-detected run
        # overshoots the pin by its step-quantization error
        pin_est = abs(float(uend_est[1]) - 1.0)
        pin_plain = abs(float(uend_plain[1]) - 1.0)
        print(f'dt={dt:.0e}: event error with estimator {err_est:.2e}; '
              f'vC pin error plain {pin_plain:.2e} vs est {pin_est:.2e}')
        assert err_est < 1e-4, 'the estimator must land on the event'
        assert P2.nswitches == 1
    # the located time is dt-independent (estimator tolerance)
    assert rows[4e-2] < 1e-4 and rows[1e-2] < 1e-4
    return rows


def main():
    store = GoldenStore(os.path.join(os.path.dirname(__file__), 'golden', 'step_17_pintsime.json'))

    rows = battery_event_accuracy()
    store.check('battery_event_errors', [rows[4e-2], rows[1e-2]], rtol=1e-6, atol=1e-12)

    # estimator + adaptivity together (the project's production combination)
    P, uend, n_steps = run_battery(4e-2, use_estimator=True, adaptivity=True)
    print(f'estimator+adaptivity: event at {P.t_switch:.6f} (target {T_EVENT:.6f}), {n_steps} steps')
    assert P.nswitches == 1
    assert abs(P.t_switch - T_EVENT) < 1e-4
    assert abs(float(uend[1]) - 1.0) < 5e-3  # vC pinned at V_ref after the switch

    # two-event cascade: the N-capacitor battery switches per capacitor
    desc = dict(
        problem_class=BatteryNCapacitors,
        problem_params=dict(ncapacitors=2),
        sweeper_class=IMEXSweeper,
        sweeper_params=dict(num_nodes=4, QI='LU'),
        level_params=dict(dt=1e-2, restol=1e-12),
        step_params=dict(maxiter=8),
        convergence_controllers={SwitchEstimator: {}},
    )
    c = ControllerNonMPI(1, {'logger_level': 40}, desc)
    P2 = c.MS[0].levels[0].prob
    event_times = []
    orig_count = P2.count_switches
    P2.count_switches = lambda: (event_times.append(float(P2.t_switch)), orig_count())[1]
    c.run(P2.u_exact(0.0), 0.0, 1.2)
    print(f'n-capacitor battery: {P2.nswitches} switches, times {event_times}')
    assert P2.nswitches == 2, P2.nswitches
    assert event_times[0] < event_times[1]
    store.check('ncap_switch_times', event_times, rtol=1e-6, atol=1e-10)

    # buck converter: the duty cycle sets the mean output voltage
    desc = dict(
        problem_class=BuckConverter,
        problem_params=dict(duty=0.4, fsw=1e3),
        sweeper_class=IMEXSweeper,
        sweeper_params=dict(num_nodes=3, QI='LU'),
        level_params=dict(dt=2e-5, restol=1e-11),
        step_params=dict(maxiter=20),
    )
    c = ControllerNonMPI(1, {'logger_level': 40}, desc)
    P3 = c.MS[0].levels[0].prob
    uend, stats = c.run(P3.u_exact(0.0), 0.0, 1.5e-2)
    v_out = float(uend[1])
    print(f'buck converter duty=0.4: v_out {v_out:.2f} (supply {float(P3.Vs):.0f})')
    assert 0.25 * float(P3.Vs) < v_out < 0.55 * float(P3.Vs), v_out

    store.flush()
    print('PinTSimE switching campaign: all gates passed')


if __name__ == '__main__':
    main()
