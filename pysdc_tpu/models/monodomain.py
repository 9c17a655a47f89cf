"""Monodomain cardiac electrophysiology: diffusion + ionic membrane models.

Counterpart of the reference Monodomain project
(projects/Monodomain/problem_classes/MonodomainODE.py + the C++ ionic
models): V_t = div(D grad V) + I_ion(y) + I_stim, gating variables evolve as
local ODEs.  IMEX split: diffusion of V implicit (FFT direct solve on the
periodic/Neumann grid), ionic currents explicit.  The ionic RHS is the JAX
implementation from :mod:`pysdc_tpu.models.ionic` (verified against the
native C++ library).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from pysdc_tpu.core.problem import Problem, WorkCounter
from pysdc_tpu.core.state import IMEX, IMEXEXP
from pysdc_tpu.ops.fd import get_1d_grid
from pysdc_tpu.ops.linop import SeparableFDOperator
from pysdc_tpu.models.ionic import JAX_MODELS


class MonodomainIMEX(Problem):
    """State shape: (model.size, *grid); component 0 is the potential V."""

    f_kind = 'imex'

    def __init__(self, nvars=256, ionic_model='hodgkinhuxley', diff=1.0e-1, L=10.0,
                 stim_dur=2.0, stim_ampl=80.0, stim_width=0.1, dtype=None):
        self.model = JAX_MODELS[ionic_model]()
        nvars = (nvars,) if isinstance(nvars, int) else tuple(nvars)
        super().__init__(shape=(self.model.size,) + nvars, dtype=dtype)
        self._register(nvars=nvars, ionic_model=ionic_model, diff=diff, L=L,
                       stim_dur=stim_dur, stim_ampl=stim_ampl, stim_width=stim_width)
        dx = L / nvars[0]
        self.dx = dx
        self.A = SeparableFDOperator(
            [dict(size=n, dx=dx, derivative=2, order=2, bc='periodic') for n in nvars], scale=diff
        )
        self.xvalues = np.arange(nvars[0]) * dx
        self.work_counters['rhs'] = WorkCounter()

    @property
    def grids(self):
        x = jnp.asarray(self.xvalues, self.dtype)
        if len(self.nvars) == 1:
            return (x,)
        return jnp.meshgrid(*([x] * len(self.nvars)), indexing='ij')

    def _stimulus(self, t):
        """Initial stimulus applied near the left edge for stim_dur time."""
        gs = self.grids
        bump = jnp.exp(-sum((g / (self.stim_width * self.L)) ** 2 for g in gs))
        return jnp.where(t < self.stim_dur, self.stim_ampl * bump, 0.0)

    def eval_f(self, u, t):
        self.work_counters['rhs']()
        impl = jnp.zeros_like(u).at[0].set(self.A.apply(u[0]))
        ion = self.model.f(u)
        expl = ion.at[0].add(self._stimulus(t))
        return IMEX(impl=impl, expl=expl)

    def solve_system(self, rhs, factor, u0, t):
        """(I - factor*D Lap) on V only; gating variables are unchanged."""
        v = self.A.solve_shifted(rhs[0], factor)
        return rhs.at[0].set(v)

    def u_exact(self, t, u_init=None, t_init=None):
        if float(t) != 0.0:
            raise NotImplementedError('monodomain has no closed-form solution; t=0 only')
        y0 = self.model.initial_values()
        return jnp.broadcast_to(
            y0.reshape((self.model.size,) + (1,) * len(self.nvars)), self.shape
        ).astype(self.dtype)


class MonodomainIMEXEXP(MonodomainIMEX):
    """Three-way splitting for exponential SDC (reference
    projects/Monodomain/problem_classes/MonodomainODE.py:280-420):
    diffusion on V implicit, ionic currents + stimulus on V explicit,
    gating variables exponential (Rush-Larsen): y' = lambda(V)(y - y_inf(V)).
    """

    f_kind = 'imexexp'

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        mask = np.zeros((self.model.size,) + (1,) * len(self.nvars))
        for i in getattr(self.model, 'f_exp_indices', ()):
            mask[i] = 1.0
        self.exp_mask = jnp.asarray(mask)
        nonstiff = np.zeros_like(mask)
        for i in getattr(self.model, 'f_expl_indices', (0,)):
            nonstiff[i] = 1.0
        self.nonstiff_mask = jnp.asarray(nonstiff)

    def lmbda_eval(self, u, t):
        """Full-shape lambda; zero on non-exponential components."""
        return self.model.lmbda_exp(u) * self.exp_mask

    def eval_f(self, u, t):
        self.work_counters['rhs']()
        impl = jnp.zeros_like(u).at[0].set(self.A.apply(u[0]))
        lm, yinf = self.model.lmbda_yinf_exp(u)
        expl = (self.model.f_expl(u).at[0].add(self._stimulus(t))) * self.nonstiff_mask
        f_exp = lm * (u - yinf) * self.exp_mask
        return IMEXEXP(impl=impl, expl=expl, exp=f_exp)
