"""Step 25: real-chip soak of the campaign layer at TPU-sized shapes.

Steps 20-23 run CPU-sized shapes in CI; this campaign runs the same three
flagship studies at hardware scale on the attached chip — the
published-numbers discipline of the reference's ``projects/Performance``
(timings_BSC.txt) applied to the campaign layer:

- Allen-Cahn contracting circle at 1024^2 (vs 64^2 in CI): the sharp-
  interface law R(t)^2 = R0^2 - 2t tracked to interface resolution, the
  run marching on the fused device-resident lane in chunks;
- incompressible Navier-Stokes at 256^2 (vs 64^2): fixed-sweep temporal
  order in float32 plus the physics dashboard invariants (E/Z decay,
  divergence-free manifold, no grid-scale pile-up);
- Rayleigh-Benard at 64x32 (vs 32x16): Nusselt onset gates.

Goldens are committed under the ``tpu`` lane (examples/golden/
step_25_tpu_soak.json) with the device kind recorded; re-baseline with
PYSDC_TPU_WRITE_GOLDEN=1 on hardware.  On CPU hosts the script still runs
(slowly) — the golden gates only apply on the lane they were recorded for.
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from pysdc_tpu.models.allen_cahn import AllenCahnPeriodicSemiImplicitND
from pysdc_tpu.parallel.sharded import ShardedController
from pysdc_tpu.sweepers.imex import IMEXSweeper
from pysdc_tpu.utils.golden import GoldenStore


def _lane():
    return jax.devices()[0].platform


def contracting_circle_1024(n=1024, dt=2e-4, n_chunks=6, steps_per_chunk=4,
                            radius=0.25, eps=0.04):
    """AC contracting circle at hardware scale on the fused lane.

    The CI-sized campaign (step_20) drives a per-step radius hook through
    the stage machine; at 1024^2 on the chip the per-sweep dispatch would
    dominate, so the march runs fused in chunks with the radius reduction
    (one jitted count of above-threshold cells) between chunks.
    """
    desc = dict(
        problem_class=AllenCahnPeriodicSemiImplicitND,
        problem_params=dict(nvars=(n, n), eps=eps, radius=radius, dtype=jnp.float32),
        sweeper_class=IMEXSweeper,
        sweeper_params=dict(num_nodes=3, QI='LU', quad_type='RADAU-RIGHT'),
        level_params=dict(dt=dt, restol=1e-4),
        step_params=dict(maxiter=12),
    )
    c = ShardedController(1, {'logger_level': 40}, desc)
    P = c.MS[0].levels[0].prob

    @jax.jit
    def radius_of(u):
        area = jnp.sum(u > 0.5) * P.dx ** 2
        return jnp.sqrt(jnp.maximum(area, 0.0) / jnp.pi)

    u, t = P.u_exact(0.0), 0.0
    radii, times = [float(radius_of(u))], [0.0]
    start = time.perf_counter()
    for _ in range(n_chunks):
        u, _ = c.run_fused(u, t, t + steps_per_chunk * dt)
        t += steps_per_chunk * dt
        radii.append(float(radius_of(u)))
        times.append(t)
    wall = time.perf_counter() - start

    times = np.asarray(times)
    r_num = np.asarray(radii)
    r_exact = np.sqrt(np.maximum(radius**2 - 2.0 * times, 0.0))
    rel = np.abs(r_num - r_exact) / radius
    print(f'AC 1024^2: radius {r_num[0]:.4f} -> {r_num[-1]:.4f} '
          f'(exact {r_exact[-1]:.4f}), max rel dev {rel.max():.4f}, '
          f'{n_chunks * steps_per_chunk} steps in {wall:.1f}s')
    # at 1024^2 the interface is resolved ~40x finer than the CI gate; the
    # deviation budget still carries the O(eps) curvature correction
    assert rel.max() < max(3.0 / (n * radius), 2.0 * eps / radius), rel.max()
    assert r_num[-1] < r_num[0] - 5e-3, 'circle did not shrink'
    return r_num, wall


def ns_order_and_dashboard(n=256, nu=5e-3, strict=True):
    """NS temporal order (float32 regime) at 256^2."""
    from pysdc_tpu.models.navier_stokes import NavierStokesVorticity2D
    from pysdc_tpu.parallel.nonmpi import ControllerNonMPI

    def err_at(K, dt, Tend=0.16):
        desc = dict(
            problem_class=NavierStokesVorticity2D,
            problem_params=dict(nvars=(n, n), nu=nu, dtype=jnp.float32),
            sweeper_class=IMEXSweeper,
            sweeper_params=dict(num_nodes=3, QI='LU', quad_type='RADAU-RIGHT'),
            level_params=dict(dt=dt, restol=-1.0),
            step_params=dict(maxiter=K),
        )
        c = ControllerNonMPI(1, {'logger_level': 40}, desc)
        P = c.MS[0].levels[0].prob
        uend, _ = c.run(P.u_exact(0.0, kind='random'), 0.0, Tend)
        return P, uend

    # fine-dt reference per sweep-count family
    P, ref = err_at(5, 0.005)
    errs, orders = {}, {}
    for K in (2, 3):
        es = []
        for dt in (0.04, 0.02):
            _, u = err_at(K, dt)
            es.append(float(jnp.max(jnp.abs(u - ref))))
        errs[K] = es
        orders[K] = float(np.log(es[0] / es[1]) / np.log(2))
        print(f'NS 256^2 K={K}: errs {es[0]:.2e} -> {es[1]:.2e}, order {orders[K]:.2f}')
    # float32 regime: the fine-dt reference itself carries ~1e-5 error, so
    # K=3's order fit saturates against it (measured errs 5.1e-5 -> 1.3e-5);
    # the f64 CI campaign (step_22) gates the order GROWTH, here we gate
    # clean 2nd order at K=2 plus a strict per-dt error win for the extra
    # sweep — what float32 can resolve
    assert orders[2] > 1.4, orders
    if strict:  # CI-shrunk shapes saturate K=3 against the reference
        assert orders[3] > 1.4, orders
        assert all(e3 < e2 for e3, e2 in zip(errs[3], errs[2])), errs
    return errs, orders


def rbc_nusselt(nx=64, nz=32, Ra=2e6, Tend=6.0, dt=0.02):
    """RBC onset at double the CI resolution: conduction floor + onset."""
    from pysdc_tpu.models.rayleigh_benard import RayleighBenard
    from pysdc_tpu.parallel.nonmpi import ControllerNonMPI

    desc = dict(
        problem_class=RayleighBenard,
        problem_params=dict(nx=nx, nz=nz, Rayleigh=Ra, dtype=jnp.float32),
        sweeper_class=IMEXSweeper,
        sweeper_params=dict(num_nodes=2, QI='LU', quad_type='RADAU-RIGHT'),
        level_params=dict(dt=dt, restol=-1.0),
        step_params=dict(maxiter=4),
    )
    c = ControllerNonMPI(1, {'logger_level': 40}, desc)
    P = c.MS[0].levels[0].prob
    uend, _ = c.run(P.u_exact(0.0, seed=99), 0.0, Tend)
    nus = P.compute_Nusselt_numbers(uend)
    print(f'RBC {nx}x{nz}: Nu_V = {nus["V"]:.3f} (t {nus["t"]:.3f} / b {nus["b"]:.3f})')
    assert np.isfinite(float(nus['V']))
    assert float(nus['V']) > 0.9, 'below conduction floor'
    return {k: float(v) for k, v in nus.items()}


def main():
    lane = _lane()
    kind = getattr(jax.devices()[0], 'device_kind', lane)
    print(f'soak lane: {lane} ({kind})')
    if lane == 'tpu':
        r_ac, wall_ac = contracting_circle_1024()
        errs, orders = ns_order_and_dashboard()
        nus = rbc_nusselt()
    else:  # CI hosts: same code paths at CI-scale shapes; gates skip below
        r_ac, wall_ac = contracting_circle_1024(n=128, dt=1e-3, n_chunks=3)
        errs, orders = ns_order_and_dashboard(n=64, strict=False)
        nus = rbc_nusselt(nx=32, nz=16, Tend=3.0)

    store = GoldenStore(os.path.join(os.path.dirname(__file__), 'golden', 'step_25_tpu_soak.json'))
    if lane == 'tpu' or store.writing:
        store.check('lane', [1.0 if lane == 'tpu' else 0.0], rtol=0)
        store.check('ac_1024_radii', list(np.round(r_ac, 5)), rtol=2e-3, atol=1e-4)
        store.check('ns_256_orders', [orders[2], orders[3]], rtol=0.25)
        store.check('rbc_64x32_nusselt_V', [nus['V']], rtol=0.2)
        store.flush()
        print('golden gates (tpu lane): OK')
    else:
        print('golden gates skipped (recorded on the tpu lane)')


if __name__ == '__main__':
    main()
