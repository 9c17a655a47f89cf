"""Virtual-parallel PFASST/MLSDC/SDC/MSSDC controller.

Faithful TPU-side counterpart of the reference ``controller_nonMPI``
(``implementations/controller_classes/controller_nonMPI.py:12-689``): a block
of ``num_procs`` virtual time steps advances through the stage machine

    SPREAD -> [PREDICT] -> IT_CHECK -> {IT_FINE | IT_DOWN -> IT_COARSE ->
    IT_UP} -> IT_CHECK -> ... -> DONE

in lockstep; "communication" copies ``uend`` of a step into ``u[0]`` of its
successor.  This controller is the equivalence oracle for the sharded
(device-mesh) time-parallel controller: both must produce identical
iteration counts (the reference pins the same invariant in
tests/test_tutorials/test_step_6.py:26-42).

All numerics (sweeps, residuals, transfers) are jit-compiled device kernels;
this class is pure host orchestration.
"""

from __future__ import annotations

import itertools

import numpy as np

from pysdc_tpu.convergence.basic_restarting import BasicRestarting
from pysdc_tpu.core.errors import CommunicationError, ControllerError
from pysdc_tpu.core.step import Step
from pysdc_tpu.parallel.controller import Controller


def _tend_eps(Tend):
    """End-of-interval guard: the reference uses 10*eps absolute
    (controller_nonMPI.py:112), which accumulated dt-rounding drift exceeds
    after ~40 steps; a relative component keeps "t == Tend up to drift" from
    scheduling a spurious extra step while staying far below any real dt."""
    return max(10 * np.finfo(float).eps, 1e-12 * abs(Tend))


class ControllerNonMPI(Controller):
    def __init__(self, num_procs: int, controller_params: dict, description: dict):
        if 'predict' in controller_params:
            raise ControllerError('predict flag is ignored, use predict_type instead')
        super().__init__(controller_params, description, useMPI=False)

        self.MS = [Step(description) for _ in range(num_procs)]

        self.base_convergence_controllers = self.base_convergence_controllers + [BasicRestarting]
        for cls in [BasicRestarting]:
            self.add_convergence_controller(cls, description)

        if self.params.dump_setup:
            self.dump_setup(self.MS[0], controller_params, description)

        num_levels = len(self.MS[0].levels)
        if num_procs > 1 and num_levels > 1:
            for S in self.MS:
                for L in S.levels:
                    if not L.sweep.coll.right_is_node:
                        raise ControllerError('For PFASST to work, we assume uend^k = u_M^k')

        if num_levels == 0:
            raise ControllerError('need at least one level')
        self.nlevels = num_levels

        self.nsweeps = [self.MS[0].levels[lvl].params.nsweeps for lvl in range(num_levels)]
        if self.nlevels > 1 and self.nsweeps[-1] > 1:
            raise ControllerError('this controller cannot do multiple sweeps on coarsest level')

        for C in self.ordered_convergence_controllers():
            C.reset_buffers_nonMPI(self)
            C.setup_status_variables(self, MS=self.MS)

    def all_steps(self):
        return self.MS

    # ------------------------------------------------------------------
    def run(self, u0, t0, Tend):
        """Main driver (reference controller_nonMPI.py:85-178)."""
        uend = None
        num_procs = len(self.MS)
        for hook in self.hooks:
            hook.reset_stats()

        slots = list(range(num_procs))
        time = [t0 + sum(self.MS[j].dt for j in range(p)) for p in slots]
        active = [time[p] < Tend - _tend_eps(Tend) for p in slots]
        if not any(active):
            raise ControllerError('Nothing to do, check t0, dt and Tend.')
        active_slots = list(itertools.compress(slots, active))

        self.restart_block(active_slots, time, u0)

        for hook in self.hooks:
            hook.post_setup(step=None, level_number=None)
        for S in self.MS:
            for hook in self.hooks:
                hook.pre_run(step=S, level_number=0)

        while any(active):
            MS_active = [self.MS[p] for p in active_slots]
            done = False
            while not done:
                done = self.pfasst(MS_active)

            restarts = [S.status.restart for S in MS_active]
            restart_at = np.where(restarts)[0][0] if True in restarts else len(MS_active)
            if True in restarts:
                uend = self.MS[restart_at].levels[0].u[0]
                time[active_slots[0]] = time[restart_at]
                self.logger.info(f'Starting next block with initial conditions from step {restart_at}')
            else:
                uend = self.MS[active_slots[-1]].levels[0].uend
                time[active_slots[0]] = time[active_slots[-1]] + self.MS[active_slots[-1]].dt

            for S in MS_active[:restart_at]:
                for C in self.ordered_convergence_controllers():
                    C.post_step_processing(self, S, MS=MS_active)

            for C in self.ordered_convergence_controllers():
                [C.prepare_next_block(self, S, len(active_slots), time, Tend, MS=MS_active) for S in self.MS]

            for i in range(1, len(active_slots)):
                time[active_slots[i]] = time[active_slots[i] - 1] + self.MS[active_slots[i] - 1].dt

            active = [time[p] < Tend - _tend_eps(Tend) for p in slots]
            active_slots = list(itertools.compress(slots, active))

            self.restart_block(active_slots, time, uend)

        for S in self.MS:
            for hook in self.hooks:
                hook.post_run(step=S, level_number=0)
        for S in self.MS:
            for C in self.ordered_convergence_controllers():
                C.post_run_processing(self, S, MS=MS_active)

        return uend, self.return_stats()

    # ------------------------------------------------------------------
    def restart_block(self, active_slots, time, u0):
        """Reset/restart a block of active steps (reference :180-224)."""
        for j, p in enumerate(active_slots):
            self.MS[p].status.slot = p
            self.MS[p].prev = self.MS[active_slots[j - 1]]
            self.MS[p].reset_step()
            self.MS[p].status.first = active_slots.index(p) == 0
            self.MS[p].status.last = active_slots.index(p) == len(active_slots) - 1
            self.MS[p].init_step(u0)
            self.MS[p].status.done = False
            self.MS[p].status.prev_done = False
            self.MS[p].status.iter = 0
            self.MS[p].status.stage = 'SPREAD'
            self.MS[p].status.force_done = False
            self.MS[p].status.time_size = len(active_slots)
            for l in self.MS[p].levels:
                l.tag = None
                l.status.sweep = 1

        for p in active_slots:
            for lvl in self.MS[p].levels:
                lvl.status.time = time[p]

        for C in self.ordered_convergence_controllers():
            C.reset_status_variables(self, active_slots=active_slots)

    # -- "communication" ------------------------------------------------
    def send_full(self, S, level=None, add_to_stats=False):
        """Compute uend and tag it — one-sided send (reference :226-257)."""
        for hook in self.hooks:
            hook.pre_comm(step=S, level_number=level)
        if not S.status.last:
            src = S.levels[level]
            src.compute_end_point()
            src.tag = (level, S.status.iter, S.status.slot)
        for hook in self.hooks:
            hook.post_comm(step=S, level_number=level, add_to_stats=add_to_stats)

    def recv_full(self, S, level=None, add_to_stats=False):
        """Copy predecessor uend into u[0], re-evaluate f[0] (reference :259-295)."""
        for hook in self.hooks:
            hook.pre_comm(step=S, level_number=level)
        if not S.status.prev_done and not S.status.first:
            target = S.levels[level]
            source = S.prev.levels[level]
            expected = (level, S.status.iter, S.prev.status.slot)
            if source.tag != expected:
                raise CommunicationError(
                    f'source and target tag are not the same, got {source.tag} and {expected}'
                )
            target.set_u0(source.uend)
        for hook in self.hooks:
            hook.post_comm(step=S, level_number=level, add_to_stats=add_to_stats)

    # -- stage machine ---------------------------------------------------
    def pfasst(self, local_MS_active):
        """Dispatch one stage for the whole block (reference :297-332)."""
        stages = [S.status.stage for S in local_MS_active if S.status.stage != 'DONE']
        if stages and stages[1:] != stages[:-1]:
            raise ControllerError('not all stages are equal')

        if stages:
            stage = stages[0]
            MS_running = [S for S in local_MS_active if S.status.stage != 'DONE']
            switcher = {
                'SPREAD': self.spread,
                'PREDICT': self.predict,
                'IT_CHECK': self.it_check,
                'IT_FINE': self.it_fine,
                'IT_DOWN': self.it_down,
                'IT_COARSE': self.it_coarse,
                'IT_UP': self.it_up,
            }
            if stage not in switcher:
                raise ControllerError(f'Unknown stage, got {stage}')
            switcher[stage](MS_running)

        return all(S.status.done for S in local_MS_active)

    def spread(self, local_MS_running):
        """SPREAD stage (reference :334-357)."""
        for S in local_MS_running:
            for hook in self.hooks:
                hook.pre_step(step=S, level_number=0)

            S.levels[0].predict(S.u0)

            if len(S.levels) > 1:
                S.status.stage = 'PREDICT'
            else:
                S.status.stage = 'IT_CHECK'

            for C in self.ordered_convergence_controllers():
                C.post_spread_processing(self, S, MS=local_MS_running)

    def predict(self, local_MS_running):
        """PREDICT stage (reference :359-477)."""
        for S in local_MS_running:
            for hook in self.hooks:
                hook.pre_predict(step=S, level_number=0)

        if self.params.predict_type is None:
            pass
        elif self.params.predict_type == 'fine_only':
            for S in local_MS_running:
                S.levels[0].update_nodes()
        elif self.params.predict_type == 'pfasst_burnin':
            for S in local_MS_running:
                for l in range(1, len(S.levels)):
                    S.transfer(source=S.levels[l - 1], target=S.levels[l])

            for q in range(len(local_MS_running)):
                # staggered coarse sweeps: [q..], then receive on [q+1..]
                for p in range(q, len(local_MS_running)):
                    S = local_MS_running[p]
                    S.levels[-1].update_nodes()
                    self.send_full(S, level=len(S.levels) - 1)
                for p in range(q + 1, len(local_MS_running)):
                    S = local_MS_running[p]
                    self.recv_full(
                        S, level=len(S.levels) - 1, add_to_stats=(p == len(local_MS_running) - 1)
                    )

            for S in local_MS_running:
                for l in range(len(S.levels) - 1, 0, -1):
                    S.transfer(source=S.levels[l], target=S.levels[l - 1])
                self.send_full(S, level=0)
                self.recv_full(S, level=0)

            for S in local_MS_running:
                S.levels[0].update_nodes()
        elif self.params.predict_type == 'fmg':
            raise NotImplementedError('FMG predictor is not yet implemented')
        else:
            raise ControllerError(f'Wrong predictor type, got {self.params.predict_type}')

        for S in local_MS_running:
            for hook in self.hooks:
                hook.post_predict(step=S, level_number=0)
        for S in local_MS_running:
            S.status.stage = 'IT_CHECK'

    def it_check(self, local_MS_running):
        """Convergence check + stage routing (reference :479-543)."""
        for S in local_MS_running:
            self.send_full(S, level=0)
            self.recv_full(S, level=0)
            S.levels[0].compute_residual(stage='IT_CHECK')

        for S in local_MS_running:
            if S.status.iter > 0:
                for hook in self.hooks:
                    hook.post_iteration(step=S, level_number=0)
            for C in self.ordered_convergence_controllers():
                C.post_iteration_processing(self, S, MS=local_MS_running)
                C.convergence_control(self, S, MS=local_MS_running)

        for S in local_MS_running:
            if not S.status.first:
                for hook in self.hooks:
                    hook.pre_comm(step=S, level_number=0)
                S.status.prev_done = S.prev.status.done  # "communicate"
                for hook in self.hooks:
                    hook.post_comm(step=S, level_number=0, add_to_stats=True)
                S.status.done = S.status.done and S.status.prev_done

            if self.params.all_to_done:
                for hook in self.hooks:
                    hook.pre_comm(step=S, level_number=0)
                S.status.done = all(T.status.done for T in local_MS_running)
                for hook in self.hooks:
                    hook.post_comm(step=S, level_number=0, add_to_stats=True)

            if not S.status.done:
                S.status.iter += 1
                for hook in self.hooks:
                    hook.pre_iteration(step=S, level_number=0)
                for C in self.ordered_convergence_controllers():
                    C.pre_iteration_processing(self, S, MS=local_MS_running)

                if len(S.levels) > 1:
                    S.status.stage = 'IT_DOWN'
                else:
                    if len(local_MS_running) == 1 or self.params.mssdc_jac:
                        S.status.stage = 'IT_FINE'
                    else:
                        S.status.stage = 'IT_COARSE'  # serial MSSDC (Gauss-like)
            else:
                S.levels[0].compute_end_point()
                for hook in self.hooks:
                    hook.post_step(step=S, level_number=0)
                S.status.stage = 'DONE'

        for C in self.ordered_convergence_controllers():
            C.reset_buffers_nonMPI(self)

    def it_fine(self, local_MS_running):
        """Fine sweeps (reference :545-580)."""
        for S in local_MS_running:
            S.levels[0].status.sweep = 0

        for k in range(self.nsweeps[0]):
            for S in local_MS_running:
                S.levels[0].status.sweep += 1

            for S in local_MS_running:
                self.send_full(S, level=0)
                self.recv_full(S, level=0, add_to_stats=(k == self.nsweeps[0] - 1))

            for S in local_MS_running:
                for hook in self.hooks:
                    hook.pre_sweep(step=S, level_number=0)
                S.levels[0].update_nodes()
                S.levels[0].compute_residual(stage='IT_FINE')
                for hook in self.hooks:
                    hook.post_sweep(step=S, level_number=0)

        for S in local_MS_running:
            S.status.stage = 'IT_CHECK'

    def it_down(self, local_MS_running):
        """Restrict down the hierarchy with middle-level sweeps (reference :582-617)."""
        for S in local_MS_running:
            S.transfer(source=S.levels[0], target=S.levels[1])

        for l in range(1, self.nlevels - 1):
            for _ in range(self.nsweeps[l]):
                for S in local_MS_running:
                    self.send_full(S, level=l)
                    self.recv_full(S, level=l)
                for S in local_MS_running:
                    for hook in self.hooks:
                        hook.pre_sweep(step=S, level_number=l)
                    S.levels[l].update_nodes()
                    S.levels[l].compute_residual(stage='IT_DOWN')
                    for hook in self.hooks:
                        hook.post_sweep(step=S, level_number=l)

            for S in local_MS_running:
                S.transfer(source=S.levels[l], target=S.levels[l + 1])

        for S in local_MS_running:
            S.status.stage = 'IT_COARSE'

    def it_coarse(self, local_MS_running):
        """Serialized coarse sweep chain (reference :619-646)."""
        for S in local_MS_running:
            self.recv_full(S, level=len(S.levels) - 1)

            for hook in self.hooks:
                hook.pre_sweep(step=S, level_number=len(S.levels) - 1)
            S.levels[-1].update_nodes()
            S.levels[-1].compute_residual(stage='IT_COARSE')
            for hook in self.hooks:
                hook.post_sweep(step=S, level_number=len(S.levels) - 1)

            self.send_full(S, level=len(S.levels) - 1, add_to_stats=True)

            if len(S.levels) > 1:
                S.status.stage = 'IT_UP'
            else:
                S.status.stage = 'IT_CHECK'

    def it_up(self, local_MS_running):
        """Prolong corrections up to the finest level (reference :648-680)."""
        for l in range(self.nlevels - 1, 0, -1):
            for S in local_MS_running:
                S.transfer(source=S.levels[l], target=S.levels[l - 1])

            if l - 1 > 0:
                for k in range(self.nsweeps[l - 1]):
                    for S in local_MS_running:
                        self.send_full(S, level=l - 1)
                        self.recv_full(S, level=l - 1, add_to_stats=(k == self.nsweeps[l - 1] - 1))
                    for S in local_MS_running:
                        for hook in self.hooks:
                            hook.pre_sweep(step=S, level_number=l - 1)
                        S.levels[l - 1].update_nodes()
                        S.levels[l - 1].compute_residual(stage='IT_UP')
                        for hook in self.hooks:
                            hook.post_sweep(step=S, level_number=l - 1)

        for S in local_MS_running:
            S.status.stage = 'IT_FINE'
