"""ParaDiag controller: all-at-once diagonalization in time.

Counterpart of the reference ``controller_ParaDiag_nonMPI``
(``implementations/controller_classes/controller_ParaDiag_nonMPI.py:11-471``)
with the increment formulation of https://arxiv.org/abs/2103.12571:

  per iteration:
    (1) all-at-once residual (uend -> u0 chain + node-local residual)
    (2) alpha-weighted FFT across the L steps
    (3) per-step collocation solves, diagonalized via Q G_l^{-1} = S w S^{-1}
    (4) weighted iFFT; add increment

TPU-native realization: the entire block lives in one complex array
(L, M, *shape); the weighted FFT in time is a dense (L, L) matmul over the
leading axis, the node transforms dense (M, M) matmuls, and the L*M
complex-shifted spatial solves one flat vmapped call — the whole iteration
is a single XLA program.  This is the reference's P5 parallelism
(SURVEY §2.10); passing ``mesh=`` with a 'time' axis shards the block's
leading (L) axis over the devices: per-step solves stay chip-local and the
two weighted DFT matmuls per iteration carry the (all-to-all-equivalent)
collectives XLA inserts — the reference has no distributed ParaDiag at all
(controller_ParaDiag_nonMPI.py:11 is virtual-only).  Parity between the
sharded and unsharded controllers is gated in tests/test_paradiag.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pysdc_tpu.convergence.basic_restarting import BasicRestarting
from pysdc_tpu.core.errors import ControllerError, ParameterError
from pysdc_tpu.core.step import Step
from pysdc_tpu.parallel.controller import Controller
from pysdc_tpu.sweepers.paradiag import QDiagonalization, compute_diagonalization


def get_fft_matrix(N: int) -> np.ndarray:
    """Ortho-normalized DFT matrix (reference ParaDiagHelper.py:4-20)."""
    idx = np.arange(N, dtype=complex)
    i1, i2 = np.meshgrid(idx, idx)
    return np.exp(-2 * np.pi * 1j * i1 * i2 / N) / np.sqrt(N)


def get_weighted_fft_matrices(L: int, alpha: float):
    """Weighted FFT/iFFT matrices for the alpha-circulant preconditioner."""
    gamma = alpha ** (-np.arange(L) / L)
    F = get_fft_matrix(L)
    W_fft = F @ np.diag(1 / gamma)
    W_ifft = np.diag(gamma) @ np.conjugate(F)
    return W_fft, W_ifft


def get_G_inv_matrices(L: int, M: int, alpha: float, coll) -> list[np.ndarray]:
    """Per-step G_l^{-1} (reference ParaDiagHelper.py:101-131)."""
    if not coll.right_is_node:
        raise ParameterError('ParaDiag needs RADAU-RIGHT-type collocation (uend = u_M)')
    H = np.zeros((M, M))
    H[:, -1] = 1.0
    gamma = alpha ** (-np.arange(L) / L)
    # first column of E_alpha is [0, -1, 0, ...]^T
    col = np.zeros(L, dtype=complex)
    if L > 1:
        col[1] = -1.0
    diags = np.fft.fft(col / gamma, norm='backward')
    out = []
    for l in range(L):
        G = diags[l] * H + np.eye(M)
        out.append(np.linalg.inv(G))
    return out


class ParaDiagController(Controller):
    """nonMPI ParaDiag over a block of ``n_steps`` time steps.

    controller_params must contain ``alpha``; ``average_jacobian`` (default
    True) controls the Jacobian linearization point for nonlinear problems.
    """

    def __init__(self, num_procs: int, controller_params: dict, description: dict, mesh=None):
        if 'alpha' not in controller_params:
            raise ParameterError('Please supply alpha as a parameter to the ParaDiag controller!')
        if controller_params.get('all_to_done', True) is False:
            raise NotImplementedError('ParaDiag only implemented with option all_to_done=True')
        controller_params = {'average_jacobian': True, 'all_to_done': True, **controller_params}

        description = dict(description)
        description['sweeper_class'] = description.get('sweeper_class', QDiagonalization)

        super().__init__(controller_params, description, useMPI=False)
        self.add_convergence_controller(BasicRestarting, description)

        self.n_steps = num_procs
        self.mesh = mesh
        self.template = Step(description)
        #: shadow steps (one per time step) so the standard hook machinery
        #: sees real per-step status, as in the reference's ParaDiag
        #: controller (controller_ParaDiag_nonMPI.py:56-90)
        self.MS = [self.template] + [Step(description) for _ in range(num_procs - 1)]
        if len(self.template.levels) != 1:
            raise ControllerError('Multi-level SDC not implemented in ParaDiag')
        lvl = self.template.levels[0]
        if not isinstance(lvl.sweep, QDiagonalization):
            self.logger.warning(
                f'Your sweeper class {type(lvl.sweep).__name__} is not derived from QDiagonalization.'
            )
        self.maxiter = self.template.params.maxiter

        L, M = num_procs, lvl.sweep.coll.num_nodes
        alpha = self.params.alpha
        self.W_fft, self.W_ifft = get_weighted_fft_matrices(L, alpha)
        G_invs = get_G_inv_matrices(L, M, alpha, lvl.sweep.coll)
        # stacked per-step diagonalizations of Q G_l^{-1}
        ws, Ss, S_invs = [], [], []
        for G_inv in G_invs:
            w, S, S_inv = compute_diagonalization(lvl.sweep.coll.q @ G_inv)
            ws.append(w)
            Ss.append(S)
            S_invs.append(S_inv)
        self.w = np.stack(ws)  # (L, M)
        self.S = np.stack(Ss)  # (L, M, M)
        self.S_inv = np.stack(S_invs)
        self.G_inv = np.stack(G_invs)

        self._build_kernels()

    def all_steps(self):
        return self.MS

    # ------------------------------------------------------------------
    def _build_kernels(self):
        lvl = self.template.levels[0]
        prob, sweep = lvl.prob, lvl.sweep
        coll = sweep.coll
        L, M = self.n_steps, coll.num_nodes
        q = jnp.asarray(coll.q)
        nodes = jnp.asarray(coll.nodes)
        average_jacobian = self.params.average_jacobian

        # -- time-axis sharding (SURVEY P5) --------------------------------
        # The block (L, M, *shape) carries the time axis sharded over the
        # mesh's 'time' axis.  The weighted DFT is a dense (L, L) matmul
        # over that axis — XLA inserts the one all-to-all-equivalent
        # collective per transform (two per iteration); the per-step
        # diagonalized node solves stay chip-local.  This is the TPU-native
        # upgrade over the reference, whose ParaDiag controller is
        # nonMPI-only (controller_ParaDiag_nonMPI.py:11).
        mesh = self.mesh
        time_sharded = (
            mesh is not None
            and 'time' in mesh.axis_names
            and mesh.shape['time'] > 1
            and L % mesh.shape['time'] == 0
        )
        self._time_sharded = time_sharded

        def constrain(x):
            if not time_sharded:
                return x
            from jax.sharding import NamedSharding, PartitionSpec

            spec = PartitionSpec('time', *([None] * (x.ndim - 1)))
            return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

        # complex coefficient matrices stay NUMPY: they embed as trace-time
        # constants in the jitted iteration — a pre-made complex DEVICE
        # array would be read back to host at trace for embedding, and the
        # axon TPU tunnel cannot transfer complex either way
        # (core/compat.py)
        W_fft, W_ifft = self.W_fft, self.W_ifft
        S, S_inv, G_inv = self.S, self.S_inv, self.G_inv
        w = self.w

        def eval_all(u, t_arr, dt):
            """f at all (L, M) nodes; complex state, real problems get .real."""
            def eval_step(u_l, t_l):
                ts = t_l + dt * nodes
                return prob.eval_f_batched(u_l, ts)

            f = jax.vmap(eval_step)(u, t_arr)
            return f

        def iteration(u, u0, t_arr, dt):
            """One ParaDiag iteration; returns (u_new, residual_norms)."""
            from pysdc_tpu.core.state import f_total

            u = constrain(u)
            f = eval_all(u, t_arr, dt)
            ft = f_total(f)
            # all-at-once residual: u0 chain via uend = u[:, -1] (RADAU-RIGHT)
            uend = u[:, -1]
            u0_steps = jnp.concatenate([u0[None].astype(u.dtype), uend[:-1]], axis=0)
            integral = dt * jnp.einsum('mj,lj...->lm...', q.astype(u.dtype), ft)
            res = integral + u0_steps[:, None] - u
            res_norms = jnp.max(jnp.abs(res.reshape(L, -1)), axis=1)

            # averaged state for Jacobian linearization
            if average_jacobian:
                u_avg = jnp.mean(u, axis=(0, 1)).real.astype(prob.dtype)
            else:
                u_avg = None

            # weighted FFT in time (dense matmul over the L axis; when the
            # time axis is sharded this is where XLA places the collective)
            res_hat = constrain(jnp.tensordot(W_fft, res.astype(W_fft.dtype), axes=(1, 0)))

            # per-step diagonalized solves
            def solve_step(res_l, S_inv_l, S_l, G_inv_l, w_l, t_l):
                x1 = jnp.tensordot(S_inv_l, res_l, axes=(1, 0))

                def solve_node(rhs_m, w_m, tau_m):
                    return prob.solve_jacobian(rhs_m, dt * w_m, u_avg, t_l + dt * tau_m)

                x2 = jax.vmap(solve_node)(x1, w_l, nodes)
                return jnp.tensordot(G_inv_l.astype(x2.dtype), jnp.tensordot(S_l, x2, axes=(1, 0)), axes=(1, 0))

            incr_hat = jax.vmap(solve_step)(res_hat, S_inv, S, G_inv, w, t_arr)

            # weighted iFFT in time, add increment
            incr = constrain(jnp.tensordot(W_ifft, incr_hat, axes=(1, 0)))
            u_new = u + incr
            return u_new, res_norms

        self._iteration = jax.jit(iteration)

        def predict(u0, t_arr, dt):
            u0c = u0.astype(complex)
            u = jnp.broadcast_to(u0c, (L, M) + u0.shape)
            if time_sharded:
                from jax.sharding import NamedSharding, PartitionSpec

                spec = PartitionSpec('time', *([None] * (u.ndim - 1)))
                u = jax.device_put(u, NamedSharding(mesh, spec))
            return u

        self._predict = predict

    # ------------------------------------------------------------------
    def _fire(self, point, step, lvl, **kw):
        """Broadcast one hook point to every registered hook."""
        for hook in self.hooks:
            getattr(hook, point)(step=step, level_number=lvl, **kw)

    def _sync_shadows(self, u, res_norms, niter):
        """Refresh the shadow steps' status/uend so hooks read live data."""
        is_complex = jnp.iscomplexobj(self.template.levels[0].prob.u_init)
        for j, step in enumerate(self.MS):
            step.status.iter = niter
            L0 = step.levels[0]
            L0.status.residual = float(res_norms[j])
            L0.status.updated = False
            ue = u[j, -1]
            L0.uend = ue if is_complex else ue.real.astype(L0.prob.dtype)

    def run(self, u0, t0, Tend):
        """March ParaDiag blocks from t0 to Tend, firing the standard hook
        points per step (pre/post run, step, iteration — the reference's
        ParaDiag controller drives the same hooks machinery as the PFASST
        controllers, controller_ParaDiag_nonMPI.py:56-90)."""
        lvl = self.template.levels[0]
        prob = lvl.prob
        dt = lvl.params.dt
        restol = lvl.params.restol
        L = self.n_steps
        eps = max(10 * np.finfo(float).eps, 1e-12 * abs(Tend))

        for hook in self.hooks:
            hook.reset_stats()
        self._fire('post_setup', None, None)
        for step in self.MS:
            self._fire('pre_run', step, 0)

        t_block = float(t0)
        uend = jnp.asarray(u0)
        while t_block < Tend - eps:
            t_arr = jnp.asarray(t_block + dt * np.arange(L))
            for j, step in enumerate(self.MS):
                step.reset_step()
                step.status.slot = j
                step.status.first = j == 0
                step.status.last = j == L - 1
                step.status.iter = 0
                step.status.stage = 'SPREAD'
                L0 = step.levels[0]
                L0.status.sweep = 1
                L0.status.time = float(t_arr[j])
                self._fire('pre_step', step, 0)

            for step in self.MS:
                self._fire('pre_predict', step, 0)
            u = self._predict(uend, t_arr, dt)
            for step in self.MS:
                self._fire('post_predict', step, 0)
                step.status.stage = 'IT_PARADIAG'

            niter = 0
            res_norm = np.inf
            while niter < self.maxiter:
                for step in self.MS:
                    step.status.iter = niter + 1
                    self._fire('pre_iteration', step, 0)
                u, res_norms = self._iteration(u, uend, t_arr, dt)
                niter += 1
                self._sync_shadows(u, np.asarray(res_norms), niter)
                for step in self.MS:
                    self._fire('post_iteration', step, 0)
                res_norm = float(np.max(np.asarray(res_norms)))
                if res_norm <= restol:
                    break

            for step in self.MS:
                step.status.done = True
                self._fire('post_step', step, 0)

            uend_c = u[-1, -1]
            uend = uend_c.real.astype(prob.dtype) if not jnp.iscomplexobj(prob.u_init) else uend_c.astype(prob.dtype)
            t_block = float(t_arr[-1]) + dt

        for step in self.MS:
            self._fire('post_run', step, 0)
        return uend, self.return_stats()
