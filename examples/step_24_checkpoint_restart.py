"""Step 24: checkpoint / restart — the GPU-project run-system analog.

The reference's ``GPU`` project wraps its production runs in a
checkpoint-restart system (``run_experiment.py``: dump the field at a
checkpoint time, restart a FRESH controller from the file and continue).
This step proves the same property end-to-end on the FieldsIO layer
(``pysdc_tpu/utils/fieldsio.py``, reference ``helpers/fieldsIO.py``):

- run Allen-Cahn to T/2, write the state with Rectilinear FieldsIO;
- build a brand-new controller in a "fresh process" role, read the
  checkpoint back, continue to T;
- the restarted trajectory must match the uninterrupted run EXACTLY
  (bitwise identity of the float64 fields — determinism is part of the
  contract: same program, same inputs, same XLA results);
- the file round-trips dtype, time metadata and grid coordinates.
"""

import jax

jax.config.update('jax_enable_x64', True)
jax.config.update('jax_platforms', 'cpu')

import os
import tempfile

import jax.numpy as jnp
import numpy as np

from pysdc_tpu import ControllerNonMPI, IMEXSweeper
from pysdc_tpu.models.allen_cahn import AllenCahnPeriodicSemiImplicitND
from pysdc_tpu.utils.fieldsio import Rectilinear


def _controller(n=64, dt=1e-3):
    desc = dict(
        problem_class=AllenCahnPeriodicSemiImplicitND,
        problem_params=dict(nvars=(n, n), eps=0.04, radius=0.25),
        sweeper_class=IMEXSweeper,
        sweeper_params=dict(num_nodes=3, QI='LU', quad_type='RADAU-RIGHT'),
        level_params=dict(dt=dt, restol=1e-9),
        step_params=dict(maxiter=12),
    )
    return ControllerNonMPI(1, {'logger_level': 40}, desc)


def main():
    n, dt, n_steps = 64, 1e-3, 16
    t_mid = (n_steps // 2) * dt

    # uninterrupted reference trajectory
    c = _controller(n, dt)
    P = c.MS[0].levels[0].prob
    u0 = P.u_exact(0.0)
    u_full, _ = c.run(u0, 0.0, n_steps * dt)

    # leg 1: run to the checkpoint and dump the field
    c1 = _controller(n, dt)
    u_mid, _ = c1.run(u0, 0.0, t_mid)
    tmp = tempfile.mkdtemp()
    path = os.path.join(tmp, 'checkpoint.pysdc')
    io = Rectilinear(np.dtype('float64'), path)
    x = np.asarray(P.xvalues)
    io.setHeader(nVar=1, coords=[x, x])
    io.initialize()
    io.addField(t_mid, np.asarray(u_mid)[None])

    # leg 2: a FRESH controller restarts from the file only
    io2 = Rectilinear.fromFile(path)
    t_read, field = io2.readField(0)
    assert io2.dtype == np.dtype('float64')
    assert abs(t_read - t_mid) < 1e-14
    assert np.array_equal(np.asarray(io2.header['coords'][0]), x)
    u_restart = jnp.asarray(field[0])
    assert np.array_equal(np.asarray(u_restart), np.asarray(u_mid)), 'file round-trip not exact'

    c2 = _controller(n, dt)
    u_end, _ = c2.run(u_restart, t_read, n_steps * dt)

    diff = float(jnp.max(jnp.abs(u_end - u_full)))
    print(f'checkpoint at t={t_mid}: restarted-vs-uninterrupted max diff = {diff:.3e}')
    assert diff == 0.0, 'restart must reproduce the uninterrupted run bitwise'
    print('checkpoint/restart: all gates passed')


if __name__ == '__main__':
    main()
