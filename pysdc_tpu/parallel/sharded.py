"""Sharded time-parallel PFASST controller (the real thing).

TPU-native replacement for the reference's MPI PFASST controller
(``implementations/controller_classes/controller_MPI.py:10-807``).  Instead
of one MPI rank per time step with Issend/Irecv pipelines, the whole block of
``num_procs`` time steps lives in single global-view arrays with a leading
time axis sharded over the ``time`` axis of a ``jax.sharding.Mesh``:

  - "send/recv" of ``uend -> u0``  = an axis-0 shift; XLA lowers it to a
    collective-permute over ICI (replacing Issend/Irecv with tags,
    controller_MPI.py:235-306).
  - sweeps/residuals/transfers     = vmapped over the time axis.
  - the serialized coarse chain    = two equivalent strategies selected by
    size (``coarse_mode``): 'replicated' scans a replication-constrained
    coarse state (one all-gather; every chip redundantly computes the whole
    Gauss-Seidel chain — beats ping-ponging P tiny sweeps at toy sizes) and
    'pipelined' keeps the block time-sharded and moves ONE step's state per
    round over ICI (bounded memory — the scale-out choice).
  - convergence flags              = one tiny device->host sync per
    iteration, replacing the cancellable Ibcast waits
    (controller_MPI.py:307-322); SPMD cannot early-exit per rank, so
    converged steps are frozen by where-masks instead.

The *policy* layer is not reimplemented: :class:`ShardedController` derives
from the virtual controller and inherits its block driver, all 15 hook
points, and the full ordered convergence-controller stack — exactly as the
reference's MPI controller runs the identical hook/CC machinery as its
virtual twin (controller_MPI.py:403-460, core/convergence_controller.py:144+).
Only the stage handlers are overridden: each one launches the batched device
kernels and then refreshes per-step *shadow views* (sliced pytrees) on the
``Step``/``Level`` objects that hooks and policies read.

Iteration counts, adaptive step sizes, restarts, and the stats dictionary
match the virtual controller entry for entry (the invariant the reference
pins in tests/test_tutorials/test_step_6.py:26-42; gated in
tests/test_sharded.py).

Per-step problem-attribute overrides (``NewtonInexactness`` writing
``prob.newton_tol``, ``SwitchEstimator`` writing ``t_switch``) are read off
the shadow steps each sweep and enter the batched kernels as (P,)-shaped
runtime arguments (``_block_overrides``), mirroring the Level layer's
override threading — per-step values apply on the batched lanes exactly as
on the virtual controller (gated in tests/test_sharded.py).  Exception: the
owner-computes coarse chain keeps template values (see its docstring).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec

from pysdc_tpu.core.errors import ControllerError
from pysdc_tpu.core.state import LevelState
from pysdc_tpu.parallel.nonmpi import ControllerNonMPI


def _where_mask(mask, new, old):
    """Per-step merge: mask (P,) selects leaves from new (P, ...) vs old."""

    def sel(n, o):
        m = mask.reshape((-1,) + (1,) * (n.ndim - 1))
        return jnp.where(m, n, o)

    return jax.tree_util.tree_map(sel, new, old)


class _BlockLevel:
    """One level's device data for ALL steps of the block: a LevelState
    pytree with a leading (P,) time axis + jitted batched kernels."""

    def __init__(self, level, num_procs, mesh=None):
        self.level = level  # template Level (holds problem + sweeper + params)
        self.P = num_procs
        self.mesh = mesh
        self.state: LevelState | None = None
        self.uend = None  # (P, *shape)
        self.uold = None
        self.fold = None
        self._build_kernels()

    # -- sharding -------------------------------------------------------
    def _spec(self, leaf):
        """(time, node, ..., space-dims): leading axis over 'time', the
        collocation-node axis over 'node' (when the mesh has one and the
        node count divides), first spatial axis over 'space' (block leaves
        always end with the problem's spatial shape)."""
        ndim_space = len(self.level.prob.shape)
        mid = leaf.ndim - 1 - ndim_space
        axes = ['time'] + [None] * mid
        names = self.mesh.axis_names
        if 'node' in names and mid >= 1:
            n_node = self.mesh.shape['node']
            if n_node > 1 and leaf.shape[1] % n_node == 0:
                axes[1] = 'node'
        if ndim_space > 0 and 'space' in names:
            axes += ['space'] + [None] * (ndim_space - 1)
        else:
            axes += [None] * ndim_space
        return PartitionSpec(*axes)

    def _shard(self, leaf):
        if self.mesh is None:
            return leaf
        return jax.device_put(leaf, NamedSharding(self.mesh, self._spec(leaf)))

    def shard_tree(self, tree):
        return jax.tree_util.tree_map(self._shard, tree)

    def _time_spec(self, leaf):
        return NamedSharding(self.mesh, self._spec(leaf))

    def _time_vmap_kwargs(self):
        """When an operator of this level runs the halo-exchange shard_map
        and the mesh also has a time axis, the time-axis vmaps must carry
        ``spmd_axis_name='time'`` so the inner space-only shard_map
        partitions instead of all-gathering the block (SURVEY P6-P8 mixed
        meshes; round-3 missing #5)."""
        mesh = self.mesh
        if mesh is None or 'time' not in mesh.axis_names or mesh.shape['time'] <= 1:
            return {}
        has_halo = any(
            getattr(attr, '_halo', None) is not None
            for attr in vars(self.level.prob).values()
        )
        return {'spmd_axis_name': 'time'} if has_halo else {}

    # -- kernels --------------------------------------------------------
    def _build_kernels(self):
        prob, sweep = self.level.prob, self.level.sweep
        mesh = self.mesh
        tkw = self._time_vmap_kwargs()

        def predict(u0_block, t_arr, dt):
            return jax.vmap(lambda u0, t: sweep.predict(prob, u0, t, dt, 0.0), **tkw)(u0_block, t_arr)

        # mutable problem scalars (newton_tol written per step by
        # NewtonInexactness, t_switch by SwitchEstimator) enter the batched
        # kernels as (P,)-shaped runtime arguments, mirroring the Level
        # layer's override threading (core/level.py _build_jitted) — the
        # round-4 known limitation where batched kernels traced the template
        # values while policies steered only the shadow levels.
        self.traced_keys = tuple(k for k in ('newton_tol', 't_switch') if hasattr(prob, k))

        def _with_ov(fn, ov):
            old = {key: getattr(prob, key) for key in ov}
            for key, val in ov.items():
                setattr(prob, key, val)
            try:
                return fn()
            finally:
                for key, val in old.items():
                    setattr(prob, key, val)

        def _sweep_one(s, t, ov, dt, k):
            return _with_ov(lambda: sweep.update_nodes(prob, s, t, dt, k), ov)

        def do_sweep(states, t_arr, dt, active, k, overrides=None):
            if overrides:
                new = jax.vmap(lambda s, t, ov: _sweep_one(s, t, ov, dt, k), **tkw)(
                    states, t_arr, overrides
                )
            else:
                new = jax.vmap(lambda s, t: sweep.update_nodes(prob, s, t, dt, k), **tkw)(states, t_arr)
            return _where_mask(active, new, states)

        def residual(states, dt):
            _, norms = jax.vmap(
                lambda s: sweep.compute_residual(s, dt, self.level.params.residual_type), **tkw
            )(states)
            return norms

        def endpoint(states, t_arr, dt, active, uend_old):
            new = jax.vmap(lambda s, t: sweep.compute_end_point(s, t, dt), **tkw)(states, t_arr)
            return _where_mask(active, new, uend_old)

        def set_u0_one(s, u0, t, m):
            u = s.u.at[0].set(jnp.where(m, u0, s.u[0]))
            f0 = prob.eval_f(u[0], t)
            f = jax.tree_util.tree_map(lambda leaf, new0: leaf.at[0].set(jnp.where(m, new0, leaf[0])), s.f, f0)
            return LevelState(u=u, f=f, tau=s.tau)

        def shift_recv(states, uend, t_arr, recv_mask):
            """u0[j] <- uend[j-1] on masked steps (axis-0 shift -> ICI permute)."""
            u0_cand = jnp.concatenate([states.u[:1, 0], uend[:-1]], axis=0)
            return jax.vmap(set_u0_one, **tkw)(states, u0_cand, t_arr, recv_mask)

        def coarse_chain_pipelined(states, uend, t_arr, dt, recv_mask, active, k, overrides=None):
            """Gauss-Seidel chain with the block state kept time-sharded:
            each round materializes ONE step's state (dynamic slice — the
            owning chip broadcasts a single step over ICI), sweeps it
            replicated, and scatters the result back.  Peak per-chip memory
            is one step's coarse state instead of the whole block; same
            math as the replicated chain (gated in tests/test_sharded.py)."""
            P = self.P

            def body(q, carry):
                states, uend = carry
                s_q = jax.tree_util.tree_map(
                    lambda a: jax.lax.dynamic_index_in_dim(a, q, 0, keepdims=False), states
                )
                ue_prev = jnp.where(
                    q == 0,
                    states.u[0, 0],
                    jax.lax.dynamic_index_in_dim(uend, jnp.maximum(q - 1, 0), 0, keepdims=False),
                )
                t_q, recv_q, act_q = t_arr[q], recv_mask[q], active[q]
                s_q = set_u0_one(s_q, ue_prev, t_q, jnp.logical_and(recv_q, act_q))
                ov_q = {
                    key: jax.lax.dynamic_index_in_dim(v, q, 0, keepdims=False)
                    for key, v in (overrides or {}).items()
                }
                s_sw = _with_ov(lambda: sweep.update_nodes(prob, s_q, t_q, dt, k), ov_q)
                ue_sw = sweep.compute_end_point(s_sw, t_q, dt)
                s_out = jax.tree_util.tree_map(
                    lambda a, b: jnp.where(act_q, a, b), s_sw, s_q
                )
                ue_old = jax.lax.dynamic_index_in_dim(uend, q, 0, keepdims=False)
                ue_out = jnp.where(act_q, ue_sw, ue_old)
                states = jax.tree_util.tree_map(
                    lambda a, v: jax.lax.dynamic_update_index_in_dim(a, v, q, 0), states, s_out
                )
                uend = jax.lax.dynamic_update_index_in_dim(uend, ue_out, q, 0)
                return states, uend

            return jax.lax.fori_loop(0, P, body, (states, uend))

        def coarse_chain_replicated(states, uend, t_arr, dt, recv_mask, active, k, overrides=None):
            """Serial Gauss-Seidel chain over the time axis, computed
            redundantly on every chip via a replication constraint."""
            if mesh is not None:
                rep = NamedSharding(mesh, PartitionSpec())
                states = jax.lax.with_sharding_constraint(
                    states, jax.tree_util.tree_map(lambda _: rep, states)
                )
                uend = jax.lax.with_sharding_constraint(uend, rep)

            def body(carry_uend, inp):
                s, ue_old, t, recv, act, ov = inp
                s = jax.lax.cond(
                    jnp.logical_and(recv, act), lambda s: set_u0_one(s, carry_uend, t, True), lambda s: s, s
                )

                def sweep_fn(s):
                    s2 = _with_ov(lambda: sweep.update_nodes(prob, s, t, dt, k), ov)
                    return s2, sweep.compute_end_point(s2, t, dt)

                s_new, ue_new = jax.lax.cond(act, sweep_fn, lambda s: (s, ue_old), s)
                return ue_new, (s_new, ue_new)

            _, (states_new, uend_new) = jax.lax.scan(
                body, states.u[0, 0],
                (states, uend, t_arr, recv_mask, active, overrides or {}),
            )
            if mesh is not None:
                states_new = jax.lax.with_sharding_constraint(
                    states_new, jax.tree_util.tree_map(self._time_spec, states_new)
                )
                uend_new = jax.lax.with_sharding_constraint(uend_new, self._time_spec(uend_new))
            return states_new, uend_new

        # -- diagonal-basis serial chains (linear diagonalizable problems) --
        # The Gauss-Seidel chain and the burn-in wavefront are the Amdahl
        # term of PFASST: serialized in time-rank, they do not divide by P.
        # When the level's operator is diagonalizable (all-periodic FD,
        # tensor-product eigenbasis, spectral symbol — ops/diag_sdc.py), the
        # WHOLE serial chain runs in the operator's diagonal basis: one
        # batched transform of the full (P, M+1, *shape) block in, P tiny
        # elementwise sweeps, one batched transform out — instead of 2*M
        # transforms per step per link (each generic node solve is
        # transform/divide/transform).  The serialized part collapses to
        # elementwise VPU work; the transforms are batched over the block.
        # Mathematically identical to the generic chain (the diag sweep is
        # gated to roundoff in tests/test_diag_sdc.py; chain parity in
        # tests/test_sharded.py).
        from pysdc_tpu.sweepers.generic_implicit import GenericImplicit

        arange = jnp.arange(self.P)
        diag_op = getattr(prob, 'diagonalizable_operator', None)
        self._diag_eligible = (
            diag_op is not None
            and mesh is None
            # exactly GenericImplicit: subclasses (LinearizedImplicitParallel)
            # override update_nodes with different sweep math
            and type(sweep) is GenericImplicit
            and not sweep.k_dependent
        )

        def _hat_setup(states, k):
            from pysdc_tpu.ops.diag_sdc import _one_sweep_diag  # noqa: F401

            uhat = diag_op.diag_forward(states.u)
            tauhat = diag_op.diag_forward(states.tau)
            sym = diag_op.diag_symbol
            lam_dt = jnp.real(uhat).dtype
            if np.iscomplexobj(sym):
                lam_dt = jnp.promote_types(lam_dt, jnp.complex64)
            lam = jnp.asarray(sym, lam_dt)
            return uhat, tauhat, lam, sweep._qi(k)

        def _endpoint_hat(uh, th, lam, dt):
            """compute_end_point in the diagonal basis (linear in uhat)."""
            if sweep.coll.right_is_node and not sweep.do_coll_update:
                return uh[-1]
            w = jnp.asarray(sweep.coll.weights, jnp.real(uh).dtype)
            return uh[0] + dt * jnp.tensordot(w, lam * uh[1:], axes=(0, 0)) + th[-1]

        def _hat_teardown(states, uend, uhat_new, uendhat_new, lam, mask):
            """Back to real space; masked steps keep their exact old data
            (a transform round-trip would perturb frozen steps by roundoff)."""
            real = not jnp.iscomplexobj(states.u)
            u = diag_op.diag_backward(uhat_new, states.u.dtype, real)
            f = diag_op.diag_backward(lam * uhat_new, states.f.dtype, real)
            new = _where_mask(mask, LevelState(u=u, f=f, tau=states.tau), states)
            ue = diag_op.diag_backward(uendhat_new, uend.dtype, real)
            return new, _where_mask(mask, ue, uend)

        def coarse_chain_diag(states, uend, t_arr, dt, recv_mask, active, k, overrides=None):
            """Serial Gauss-Seidel chain entirely in the diagonal basis.
            ``overrides`` is accepted for signature parity and ignored: the
            diag chain is an exact linear solve (no Newton, no switching)."""
            from pysdc_tpu.ops.diag_sdc import _one_sweep_diag

            uhat, tauhat, lam, QI = _hat_setup(states, k)
            uendhat = diag_op.diag_forward(uend)
            q = sweep.coll.q

            def body(carry_ue, inp):
                uh, th, ueh_old, recv, act = inp
                take = jnp.logical_and(recv, act)
                uh = uh.at[0].set(jnp.where(take, carry_ue, uh[0]))
                uh_sw = _one_sweep_diag(uh, lam, dt, q, QI, th)
                uh_new = jnp.where(act, uh_sw, uh)
                ueh = jnp.where(act, _endpoint_hat(uh_new, th, lam, dt), ueh_old)
                return ueh, (uh_new, ueh)

            _, (uhat_new, uendhat_new) = jax.lax.scan(
                body, uhat[0, 0], (uhat, tauhat, uendhat, recv_mask, active)
            )
            return _hat_teardown(states, uend, uhat_new, uendhat_new, lam, active)

        def wavefront(states, uend, t_arr, dt, window, n_rounds):
            """Burn-in staggered coarse wavefront (nonmpi.py _burnin), as one
            device loop: round q sweeps slots >= q and shifts uend forward."""

            def wave(q, carry):
                cst, cuend = carry
                m = (arange >= q) & window
                cst = do_sweep(cst, t_arr, dt, m, 0)
                cuend = endpoint(cst, t_arr, dt, m, cuend)
                cst = shift_recv(cst, cuend, t_arr, (arange >= q + 1) & window)
                return cst, cuend

            return jax.lax.fori_loop(0, n_rounds, wave, (states, uend))

        def wavefront_diag(states, uend, t_arr, dt, window, n_rounds):
            """The same wavefront with ALL rounds in the diagonal basis."""
            from pysdc_tpu.ops.diag_sdc import _one_sweep_diag

            uhat, tauhat, lam, QI = _hat_setup(states, 0)
            uendhat = diag_op.diag_forward(uend)
            q = sweep.coll.q
            sweep_hat = jax.vmap(lambda uh, th: _one_sweep_diag(uh, lam, dt, q, QI, th))
            end_hat = jax.vmap(lambda uh, th: _endpoint_hat(uh, th, lam, dt))

            def wave(qr, carry):
                uh, ueh = carry
                m = (arange >= qr) & window
                uh = _where_mask(m, sweep_hat(uh, tauhat), uh)
                ueh = _where_mask(m, end_hat(uh, tauhat), ueh)
                recv = (arange >= qr + 1) & window
                u0c = jnp.concatenate([uh[:1, 0], ueh[:-1]], axis=0)
                rm = recv.reshape((-1,) + (1,) * (u0c.ndim - 1))
                uh = uh.at[:, 0].set(jnp.where(rm, u0c, uh[:, 0]))
                return uh, ueh

            uh, ueh = jax.lax.fori_loop(0, n_rounds, wave, (uhat, uendhat))
            return _hat_teardown(states, uend, uh, ueh, lam, window)

        def coarse_chain_owner(states, uend, t_arr, dt, recv_mask, active, k, overrides=None):
            """Owner-computes Gauss-Seidel chain: the block stays
            time-sharded and ONLY the device owning the current step(s)
            sweeps — a per-device ``lax.cond`` inside ``shard_map`` — while
            uend rides a ppermute ring to the successor.  Unlike the
            replicated/pipelined chains (which make every chip redundantly
            execute the whole serial chain), total work is one sweep per
            step; idle chips wait at the ring permute, so the wall-clock
            is still the chain latency.  Requires a time-only mesh with
            P % n_time == 0 (checked in select_coarse_impl).  Per-step
            ``overrides`` are not threaded through the shard_map (the
            owner chain keeps template problem scalars)."""
            try:
                from jax import shard_map
            except ImportError:  # older jax
                from jax.experimental.shard_map import shard_map

            n_time = mesh.shape['time']
            B = self.P // n_time

            def tree_idx(tree, i):
                return jax.tree_util.tree_map(
                    lambda a: jax.lax.dynamic_index_in_dim(a, i, 0, keepdims=False), tree
                )

            def tree_put(tree, val, i):
                return jax.tree_util.tree_map(
                    lambda a, v: jax.lax.dynamic_update_index_in_dim(a, v, i, 0), tree, val
                )

            def local(st, ue, t_l, dt, recv_l, act_l):
                me = jax.lax.axis_index('time')

                def my_block(carry):
                    st, ue, ue_in = carry

                    def step_body(i, c):
                        st, ue, prev_ue = c
                        s_i = tree_idx(st, i)
                        recv_i, act_i = recv_l[i], act_l[i]
                        s_i = set_u0_one(s_i, prev_ue, t_l[i], jnp.logical_and(recv_i, act_i))
                        s_sw = sweep.update_nodes(prob, s_i, t_l[i], dt, k)
                        ue_sw = sweep.compute_end_point(s_sw, t_l[i], dt)
                        s_out = jax.tree_util.tree_map(
                            lambda a, b: jnp.where(act_i, a, b), s_sw, s_i
                        )
                        ue_out = jnp.where(act_i, ue_sw, ue[i])
                        return tree_put(st, s_out, i), ue.at[i].set(ue_out), ue_out

                    st, ue, _ = jax.lax.fori_loop(0, B, step_body, (st, ue, ue_in))
                    return st, ue

                def round_body(q, carry):
                    st, ue, ue_prev = carry
                    st, ue = jax.lax.cond(
                        me == q, my_block, lambda c: (c[0], c[1]), (st, ue, ue_prev)
                    )
                    ue_next = jax.lax.ppermute(
                        ue[B - 1], 'time', [(i, (i + 1) % n_time) for i in range(n_time)]
                    )
                    return st, ue, ue_next

                st, ue, _ = jax.lax.fori_loop(0, n_time, round_body, (st, ue, st.u[0, 0]))
                return st, ue

            P = jax.sharding.PartitionSpec
            state_specs = jax.tree_util.tree_map(lambda a: P('time'), states)
            return shard_map(
                local,
                mesh=mesh,
                in_specs=(state_specs, P('time'), P('time'), P(), P('time'), P('time')),
                out_specs=(state_specs, P('time')),
            )(states, uend, t_arr, dt, recv_mask, active)

        self.predict = jax.jit(predict)
        self.sweep = jax.jit(do_sweep, static_argnums=(4,))
        self.residual = jax.jit(residual)
        self.endpoint = jax.jit(endpoint)
        self.shift_recv = jax.jit(shift_recv)
        self._coarse_replicated = jax.jit(coarse_chain_replicated, static_argnums=(6,))
        self._coarse_pipelined = jax.jit(coarse_chain_pipelined, static_argnums=(6,))
        self._coarse_owner = jax.jit(coarse_chain_owner, static_argnums=(6,))
        self._coarse_diag = jax.jit(coarse_chain_diag, static_argnums=(6,))
        self.coarse_chain = self._coarse_replicated
        self._coarse_owner_raw = coarse_chain_owner

        # unjitted building blocks for the fused whole-block program
        # (parallel/fused.py composes them into one lax.while_loop)
        from types import SimpleNamespace

        self.raw = SimpleNamespace(
            predict=predict,
            sweep=do_sweep,
            residual=residual,
            endpoint=endpoint,
            shift_recv=shift_recv,
            coarse_replicated=coarse_chain_replicated,
            coarse_pipelined=coarse_chain_pipelined,
            coarse_owner=coarse_chain_owner,
            coarse_diag=coarse_chain_diag,
            wavefront=wavefront,
            wavefront_diag=wavefront_diag,
            # resolved by select_coarse_impl: the burn-in implementation the
            # fused lane and the bench chain program should use
            wavefront_active=wavefront,
        )

    def _owner_chain_eligible(self):
        """The owner-computes chain needs the block time-sharded on a
        time-only mesh (other axes would appear in its shard_map specs)."""
        m = self.mesh
        return (
            m is not None
            and 'time' in m.axis_names
            and m.shape['time'] > 1
            and self.P % m.shape['time'] == 0
            and all(m.shape[ax] == 1 for ax in m.axis_names if ax != 'time')
        )

    def select_coarse_impl(self, mode='auto', threshold_bytes=4 << 20):
        """Pick the Gauss-Seidel chain implementation.

        'diag' runs the whole serial chain (and the burn-in wavefront) in
        the operator's diagonal basis — one batched transform in/out, P
        elementwise sweep links — the single-chip default for linear
        diagonalizable coarse problems (cuts the PFASST Amdahl term).
        'owner' keeps the block time-sharded and only the owning device
        sweeps each round (uend rides a ppermute ring) — no redundant
        compute, the scale-out default on a time-sharded mesh.
        'replicated' all-gathers the coarse block once per chain and every
        chip redundantly computes the whole chain (lowest latency at toy
        sizes); 'pipelined' moves one step's state per round (bounded
        memory when the owner layout is unavailable).  'auto' prefers
        'diag', then 'owner' on eligible meshes, then sizes between the
        other two via ``threshold_bytes``."""
        if mode == 'auto':
            if self._diag_eligible:
                mode = 'diag'
            elif self._owner_chain_eligible():
                mode = 'owner'
            else:
                prob = self.level.prob
                M = self.level.sweep.coll.num_nodes
                itemsize = jnp.dtype(prob.dtype or jnp.float64).itemsize
                est = self.P * int(np.prod(prob.shape)) * itemsize * (3 * M + 2)
                mode = 'pipelined' if est > threshold_bytes else 'replicated'
        if mode == 'owner' and not self._owner_chain_eligible():
            raise ControllerError('owner coarse chain needs a time-only mesh dividing P')
        if mode == 'diag' and not self._diag_eligible:
            raise ControllerError(
                'diag coarse chain needs a diagonalizable operator, a fixed-QI '
                'generic-implicit sweeper, and no device mesh'
            )
        self.coarse_chain = {
            'owner': self._coarse_owner,
            'pipelined': self._coarse_pipelined,
            'replicated': self._coarse_replicated,
            'diag': self._coarse_diag,
        }[mode]
        self.raw.wavefront_active = (
            self.raw.wavefront_diag if mode == 'diag' else self.raw.wavefront
        )
        return mode

    def reset(self):
        self.state = None
        self.uend = jnp.zeros((self.P,) + self.level.prob.shape, self.level.prob.dtype)
        self.uold = None
        self.fold = None


class _BlockTransfer:
    """Batched FAS transfer between two block levels (vmapped BaseTransfer)."""

    def __init__(self, base_transfer, fine_block, coarse_block):
        self.bt = base_transfer
        self.fine = fine_block
        self.coarse = coarse_block

        bt = base_transfer
        tkw = {}
        if coarse_block._time_vmap_kwargs() or fine_block._time_vmap_kwargs():
            tkw = {'spmd_axis_name': 'time'}  # FAS re-evaluates f through halo ops

        def restrict(F_states, t_arr, dt_c, dt_f):
            return jax.vmap(lambda s, t: bt._restrict_pure(s, t, dt_c, dt_f), **tkw)(F_states, t_arr)

        def prolong(F_states, G_states, G_uold, t_arr, dt_f):
            return jax.vmap(lambda fs, gs, uo, t: bt._prolong_pure(fs, gs, uo, t, dt_f), **tkw)(
                F_states, G_states, G_uold, t_arr
            )

        self.restrict = jax.jit(restrict)
        self.prolong = jax.jit(prolong)
        self.restrict_raw = restrict
        self.prolong_raw = prolong


class ShardedController(ControllerNonMPI):
    """Block PFASST over a device mesh, with the complete hook and
    convergence-controller stack of the virtual controller."""

    def __init__(self, num_procs: int, controller_params: dict, description: dict, mesh=None,
                 coarse_mode: str = 'auto'):
        self.mesh = mesh
        super().__init__(num_procs, controller_params, description)

        # GSPMD workarounds, scoped to what actually breaks:
        #  - rfft: XLA's fft thunk hits a layout RET_CHECK only when the FFT
        #    dims themselves are sharded (a 'space' axis); time/node-sharded
        #    operands keep the fast real-FFT lane (the full complex path
        #    costs 2x and erases the time-parallel win).
        #  - pallas_call: an opaque custom call GSPMD cannot partition — it
        #    would all-gather the block; sharded applies stay on rolls.
        if mesh is not None:
            from pysdc_tpu.ops.linop import SeparableFDOperator

            space_sharded = dict(mesh.shape).get('space', 1) > 1
            # Space-decomposed applies (SURVEY P6/P7) go through the
            # halo-exchange path — one rx-deep ppermute per direction with
            # ghost-independent taps overlapping the exchange — instead of
            # GSPMD's per-tap boundary shuffles.  On time x space meshes the
            # time-axis vmaps carry spmd_axis_name='time' so the inner
            # space-only shard_map partitions (see _time_vmap_kwargs); only
            # a sharded NODE axis still forces GSPMD rolls (the collocation
            # axis threads through sweeper internals, not one vmap).
            space_only = space_sharded and dict(mesh.shape).get('node', 1) == 1
            for S in self.MS:
                for lvl in S.levels:
                    for attr in vars(lvl.prob).values():
                        if isinstance(attr, SeparableFDOperator):
                            if space_sharded:
                                attr.disable_rfft()
                            attr.disable_pallas()
                            n_sp = dict(mesh.shape)['space']
                            if (
                                space_only
                                and attr._cross_terms is not None
                                and attr.shape[-2] % n_sp == 0
                                and attr.shape[-2] // n_sp
                                >= max(abs(s) for c, o in attr._cross_terms for s in o)
                            ):
                                attr.enable_halo(mesh)
                if space_sharded:
                    from pysdc_tpu.transfer.space_mesh import MeshTransfer

                    for bt in S.base_transfers:
                        if isinstance(bt.space_transfer, MeshTransfer):
                            bt.space_transfer.disable_stencils()

        # one compile serves all shadow steps: share the template step's
        # jitted level kernels (shapes and configs are identical; mutable
        # problem scalars enter as runtime arguments, so per-step values
        # still apply)
        shared = ('_predict_fn', '_update_fn', '_residual_fn', '_endpoint_fn',
                  '_integrate_fn', '_eval_f0')
        for S in self.MS[1:]:
            for L, L0 in zip(S.levels, self.MS[0].levels):
                for name in shared:
                    if hasattr(L0, name):
                        setattr(L, name, getattr(L0, name))
                if hasattr(L0, '_endpoint_embedded_fn'):
                    L._endpoint_embedded_fn = L0._endpoint_embedded_fn

        template = self.MS[0]
        self.num_procs = num_procs
        self.blocks = [_BlockLevel(lvl, num_procs, mesh) for lvl in template.levels]
        self.transfers = [
            _BlockTransfer(bt, self.blocks[i], self.blocks[i + 1])
            for i, bt in enumerate(template.base_transfers)
        ]
        #: resolved Gauss-Seidel chain strategy on the coarsest level
        self.coarse_mode = self.blocks[-1].select_coarse_impl(coarse_mode)

    @property
    def template(self):
        return self.MS[0]

    def run(self, u0, t0, Tend, lane='auto'):
        """Single entry point, like the reference's one ``run()``
        (controller_nonMPI.py:85).  ``lane='auto'`` (default) picks the
        fastest eligible execution path: the fused device-resident block
        runner (parallel/fused.py), its adaptive sibling (embedded-error
        adaptivity + restarts on device), or the stage machine as the
        general fallback.  The chosen lane is logged and recorded in stats
        as a ``type='lane'`` entry.  Pass ``lane='stage'`` to force the
        stage machine (e.g. for per-sweep diagnostics) or
        ``lane='fused'``/``'fused_adaptive'`` to require a fast lane."""
        from pysdc_tpu.parallel import fused

        if lane == 'auto':
            try:
                fused.check_fused_eligibility(self)
                lane = 'fused'
            except ControllerError:
                try:
                    fused.check_fused_adaptive_eligibility(self)
                    lane = 'fused_adaptive'
                except ControllerError:
                    lane = 'stage'

        if lane == 'fused':
            uend, _ = fused.run_fused(self, u0, t0, Tend)
        elif lane == 'fused_adaptive':
            uend, _ = fused.run_fused_adaptive(self, u0, t0, Tend)
        elif lane == 'stage':
            uend, _ = super().run(u0, t0, Tend)
        else:
            raise ControllerError(f'unknown execution lane {lane!r}')
        self.logger.info(f'execution lane: {lane}')
        self.hooks[0].add_to_stats(
            process=-1, time=t0, level=-1, iter=-1, sweep=-1, type='lane', value=lane
        )
        return uend, self.return_stats()

    def _advance(self, block):
        if getattr(self, '_fused_adaptive', False):
            from pysdc_tpu.parallel.fused import advance_fused_adaptive

            return advance_fused_adaptive(self, block)
        return super()._advance(block)

    def run_fused(self, u0, t0, Tend):
        """Whole-block device-resident run (parallel/fused.py): the entire
        PFASST iterate-until-converged loop compiles to ONE XLA program per
        block with zero host syncs.  Same uend and iteration counts as
        :meth:`run` (gated in tests/test_fused.py); stats carry the default
        entries only.  Adaptive configurations route to the device-resident
        adaptive lane.  Raises ControllerError for configurations needing
        the stage machine (HotRod, k-dependent preconditioners, hooks
        needing per-sweep data, ...)."""
        from pysdc_tpu.parallel import fused

        try:
            fused.check_fused_eligibility(self)
        except ControllerError as plain_err:
            try:
                fused.check_fused_adaptive_eligibility(self)
            except ControllerError as adaptive_err:
                # raise the error for whichever lane the config is shaped for
                if float(self.MS[0].levels[0].params.restol) < 0:
                    raise adaptive_err
                raise plain_err
            return fused.run_fused_adaptive(self, u0, t0, Tend)
        return fused.run_fused(self, u0, t0, Tend)

    # -- helpers ----------------------------------------------------------
    def _mask_of(self, steps):
        m = np.zeros(self.num_procs, bool)
        for s in steps:
            m[s.status.slot] = True
        return jnp.asarray(m)

    def _recv_mask_of(self, running):
        m = np.zeros(self.num_procs, bool)
        for s in running:
            m[s.status.slot] = (not s.status.first) and (not s.status.prev_done)
        return jnp.asarray(m)

    def _block_times(self):
        return jnp.asarray([
            s.levels[0].status.time if s.levels[0].status.time is not None else 0.0
            for s in self.MS
        ])

    def _block_dt(self, running, lvl_idx=0):
        """One dt per block per level.  Levels may carry DIFFERENT dts after
        adaptive restarts: only the finest level gets a dt_new proposal, so
        coarser levels keep their previous dt — the reference's per-level
        spreading semantics (spread_step_sizes.py:133-154; FAS makes the
        coarse level a preconditioner, so a stale coarse dt changes the
        iteration, not the fixed point)."""
        dts = {float(s.levels[lvl_idx].params.dt) for s in running}
        if len(dts) != 1:
            raise ControllerError(
                f'sharded block kernels need one dt per block, got {sorted(dts)} '
                '(SpreadStepSizesBlockwise keeps blocks uniform — is a policy '
                'assigning per-step step sizes?)'
            )
        return dts.pop()

    def _block_overrides(self, lvl_idx):
        """(P,)-shaped per-step problem scalars (newton_tol, t_switch) read
        from the shadow steps — policies like NewtonInexactness and
        SwitchEstimator write them per step; the batched kernels consume
        them as runtime arguments (round-4 known limitation, closed)."""
        keys = getattr(self.blocks[lvl_idx], 'traced_keys', ())
        if not keys:
            return None
        return {
            key: jnp.asarray([float(getattr(S.levels[lvl_idx].prob, key)) for S in self.MS])
            for key in keys
        }

    def _sync_level(self, running, lvl_idx):
        """Refresh shadow views: each step's Level points at its slice of the
        block state, so hooks and convergence policies read live data."""
        blk = self.blocks[lvl_idx]
        for step in running:
            j = step.status.slot
            L = step.levels[lvl_idx]
            L.state = jax.tree_util.tree_map(lambda a: a[j], blk.state)
            if blk.uend is not None:
                L.uend = blk.uend[j]
            L.status.unlocked = True

    def _set_residuals(self, running, lvl_idx, stage, norms):
        """Mirror Level.compute_residual's stage-skip semantics per step."""
        norms = np.asarray(norms)
        for step in running:
            L = step.levels[lvl_idx]
            if stage in L.sweep.skip_residual_computation:
                if L.status.residual is None:
                    L.status.residual = 0.0
            else:
                L.status.residual = float(norms[step.status.slot])
                L.status.updated = False

    def _comm_hooks(self, steps, lvl, record=False):
        """Fire the pre/post comm hook pair for each step (the batched shift
        is the actual transport)."""
        for step in steps:
            with self._comm_scope(step, lvl, record):
                pass

    def _exchange(self, running, lvl_idx, record=False):
        """Batched uend -> u0 pipeline exchange on one level + comm hooks."""
        blk = self.blocks[lvl_idx]
        t_arr, dt = self._block_times(), self._block_dt(running, lvl_idx)
        mask = self._mask_of(running)
        self._comm_hooks(running, lvl_idx)  # send side
        blk.uend = blk.endpoint(blk.state, t_arr, dt, mask, blk.uend)
        recv = self._recv_mask_of(running)
        blk.state = blk.shift_recv(blk.state, blk.uend, t_arr, recv)
        self._comm_hooks(running, lvl_idx, record=record)  # recv side

    def _masked_sweeps(self, running, lvl_idx, nsweeps, stage, record_last=True):
        """nsweeps batched sweeps on one level with exchanges and hooks,
        matching the virtual controller's per-level sweep loops."""
        blk = self.blocks[lvl_idx]
        t_arr, dt = self._block_times(), self._block_dt(running, lvl_idx)
        mask = self._mask_of(running)
        sweep = blk.level.sweep
        for k in range(nsweeps):
            if lvl_idx == 0:
                for step in running:
                    step.levels[0].status.sweep += 1
            self._exchange(running, lvl_idx, record=(record_last and k == nsweeps - 1))
            for step in running:
                self._fire('pre_sweep', step, lvl_idx)
            kk = running[0].levels[lvl_idx].status.sweep if sweep.k_dependent else 0
            blk.state = blk.sweep(blk.state, t_arr, dt, mask, kk, self._block_overrides(lvl_idx))
            norms = blk.residual(blk.state, dt)
            self._sync_level(running, lvl_idx)
            self._set_residuals(running, lvl_idx, stage, norms)
            for step in running:
                self._fire('post_sweep', step, lvl_idx)

    # -- stage handlers (device-batched versions of the inherited ones) ---
    def _spread(self, running):
        for step in running:
            self._fire('pre_step', step, 0)

        dt = self._block_dt(running)
        t_arr = self._block_times()
        fine = self.blocks[0]
        for b in self.blocks:
            b.reset()
        u0 = jnp.asarray(running[0].u0)
        u0_block = jnp.broadcast_to(u0, (self.num_procs,) + u0.shape)
        fine.state = fine.shard_tree(fine.predict(u0_block, t_arr, dt))
        mask = self._mask_of(running)
        fine.uend = fine.endpoint(fine.state, t_arr, dt, mask, fine.uend)
        self._sync_level(running, 0)

        for step in running:
            step.status.stage = 'PREDICT' if len(step.levels) > 1 else 'IT_CHECK'
            for policy in self._policies():
                policy.post_spread_processing(self, step, MS=running)

    def _predict(self, running):
        for step in running:
            self._fire('pre_predict', step, 0)

        kind = self.params.predict_type
        if kind is None:
            pass
        elif kind == 'fine_only':
            self._masked_sweeps(running, 0, 1, 'PREDICT', record_last=False)
        elif kind == 'pfasst_burnin':
            self._burnin(running)
        elif kind == 'fmg':
            self._full_multigrid(running)
        else:
            raise ControllerError(f'unrecognized predict_type {kind!r}')

        for step in running:
            self._fire('post_predict', step, 0)
            step.status.stage = 'IT_CHECK'

    def _burnin(self, running):
        """Batched pfasst_burnin: staggered coarse wavefront via masks."""
        t_arr = self._block_times()
        dts = [self._block_dt(running, l) for l in range(self.nlevels)]
        slots = np.array([s.status.slot for s in running])

        for lvl, tr in enumerate(self.transfers):
            F, G = self.blocks[lvl], self.blocks[lvl + 1]
            G.state, G.uold, G.fold = tr.restrict(F.state, t_arr, dts[lvl + 1], dts[lvl])

        coarse = self.blocks[-1]
        dt = dts[-1]
        coarse_idx = self.nlevels - 1
        ov_coarse = self._block_overrides(coarse_idx)
        for q in range(len(running)):
            sweep_mask = jnp.asarray(np.isin(np.arange(self.num_procs), slots[q:]))
            coarse.state = coarse.sweep(coarse.state, t_arr, dt, sweep_mask, 0, ov_coarse)
            self._comm_hooks(running[q:], coarse_idx)
            coarse.uend = coarse.endpoint(coarse.state, t_arr, dt, sweep_mask, coarse.uend)
            recv_np = np.isin(np.arange(self.num_procs), slots[q + 1 :])
            for j, step in enumerate(running[q + 1 :], start=q + 1):
                recv_np[step.status.slot] &= not step.status.prev_done and not step.status.first
                with self._comm_scope(step, coarse_idx, record=(j == len(running) - 1)):
                    pass
            coarse.state = coarse.shift_recv(coarse.state, coarse.uend, t_arr, jnp.asarray(recv_np))

        for lvl in range(self.nlevels - 1, 0, -1):
            tr = self.transfers[lvl - 1]
            F, G = self.blocks[lvl - 1], self.blocks[lvl]
            F.state = tr.prolong(F.state, G.state, G.uold, t_arr, dts[lvl - 1])

        self._exchange(running, 0)
        fine = self.blocks[0]
        fine.state = fine.sweep(fine.state, t_arr, dts[0], self._mask_of(running), 0)
        self._sync_level(running, 0)

    def _full_multigrid(self, running):
        """Batched FMG predictor (see the virtual twin for the algorithm)."""
        t_arr = self._block_times()
        dts = [self._block_dt(running, l) for l in range(self.nlevels)]
        mask = self._mask_of(running)

        for lvl, tr in enumerate(self.transfers):
            F, G = self.blocks[lvl], self.blocks[lvl + 1]
            G.state, G.uold, G.fold = tr.restrict(F.state, t_arr, dts[lvl + 1], dts[lvl])

        coarse = self.blocks[-1]
        coarse_idx = self.nlevels - 1
        self._comm_hooks(running, coarse_idx)
        recv = self._recv_mask_of(running)
        coarse.state, coarse.uend = coarse.coarse_chain(
            coarse.state, coarse.uend, t_arr, dts[-1], recv, mask, 0,
            self._block_overrides(coarse_idx),
        )
        self._comm_hooks(running, coarse_idx)

        for l in range(self.nlevels - 1, 0, -1):
            tr = self.transfers[l - 1]
            F, G = self.blocks[l - 1], self.blocks[l]
            F.state = tr.prolong(F.state, G.state, G.uold, t_arr, dts[l - 1])
            if l - 1 > 0:
                F.state = F.sweep(F.state, t_arr, dts[l - 1], mask, 0)

        self._exchange(running, 0)
        fine = self.blocks[0]
        fine.state = fine.sweep(fine.state, t_arr, dts[0], mask, 0)
        self._sync_level(running, 0)

    def _measure_at_check(self, running):
        """IT_CHECK entry: batched boundary exchange + residuals; the policy
        sequence that follows is inherited unchanged."""
        self._exchange(running, 0)
        fine = self.blocks[0]
        norms = fine.residual(fine.state, self._block_dt(running, 0))
        self._sync_level(running, 0)
        self._set_residuals(running, 0, 'IT_CHECK', norms)

    def _fine_sweeps(self, running):
        for step in running:
            step.levels[0].status.sweep = 0
        self._masked_sweeps(running, 0, self.nsweeps[0], 'IT_FINE')
        for step in running:
            step.status.stage = 'IT_CHECK'

    def _restrict_cascade(self, running):
        t_arr = self._block_times()
        for lvl, tr in enumerate(self.transfers):
            F, G = self.blocks[lvl], self.blocks[lvl + 1]
            if lvl > 0:
                self._masked_sweeps(running, lvl, self.nsweeps[lvl], 'IT_DOWN', record_last=False)
            G.state, G.uold, G.fold = tr.restrict(
                F.state, t_arr, self._block_dt(running, lvl + 1), self._block_dt(running, lvl)
            )
            self._sync_level(running, lvl + 1)
        for step in running:
            step.status.stage = 'IT_COARSE'

    def _coarse_chain(self, running):
        coarse = self.blocks[-1]
        coarse_idx = self.nlevels - 1
        t_arr, dt = self._block_times(), self._block_dt(running, coarse_idx)
        mask = self._mask_of(running)
        recv = self._recv_mask_of(running)

        self._comm_hooks(running, coarse_idx)  # pull side
        for step in running:
            self._fire('pre_sweep', step, coarse_idx)
        coarse.state, coarse.uend = coarse.coarse_chain(
            coarse.state, coarse.uend, t_arr, dt, recv, mask, 0,
            self._block_overrides(coarse_idx),
        )
        norms = coarse.residual(coarse.state, dt)
        self._sync_level(running, coarse_idx)
        self._set_residuals(running, coarse_idx, 'IT_COARSE', norms)
        for step in running:
            self._fire('post_sweep', step, coarse_idx)
        self._comm_hooks(running, coarse_idx, record=True)  # push side

        for step in running:
            step.status.stage = 'IT_UP' if self.nlevels > 1 else 'IT_CHECK'

    def _prolong_cascade(self, running):
        t_arr = self._block_times()
        for l in range(self.nlevels - 1, 0, -1):
            tr = self.transfers[l - 1]
            F, G = self.blocks[l - 1], self.blocks[l]
            # done steps were masked out of every sweep since restriction, so
            # their prolongation correction is exactly zero — no mask needed
            F.state = tr.prolong(F.state, G.state, G.uold, t_arr, self._block_dt(running, l - 1))
            self._sync_level(running, l - 1)
            if l - 1 > 0:
                self._masked_sweeps(running, l - 1, self.nsweeps[l - 1], 'IT_UP')
        for step in running:
            step.status.stage = 'IT_FINE'
