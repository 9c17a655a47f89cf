"""Cardiac ionic models: JAX compute path + native C++ verification core.

Counterpart of the reference Monodomain project's pybind11 ``ionicmodels``
module (projects/Monodomain/problem_classes/ionicmodels/cpp): the TPU compute
path evaluates the models in JAX (fused into the monodomain RHS); the C++
library (``native/ionicmodels``) provides the same surface through a C ABI +
ctypes and serves as the native reference the JAX formulas are verified
against (see tests/test_monodomain.py).

Model surface per model: ``size``, ``initial_values()``, ``f``, ``f_expl``,
``lmbda_exp``, ``lmbda_yinf_exp``, ``rho_f_expl`` (spectral-radius bound of
the explicit part, used by stabilized integrators).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import jax.numpy as jnp
import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), '..', '..', 'native', 'ionicmodels')


def load_native():
    """Build (if needed) and load the C++ ionic-model library via ctypes."""
    so = os.path.join(_NATIVE_DIR, 'libionicmodels.so')
    if not os.path.exists(so):
        subprocess.run(['make', '-C', _NATIVE_DIR], check=True, capture_output=True)
    lib = ctypes.CDLL(so)
    dptr = ctypes.POINTER(ctypes.c_double)
    for name in ('bistable_f', 'bistable_f_expl'):
        getattr(lib, name).argtypes = [dptr, dptr, ctypes.c_size_t, ctypes.c_double]
    for name in ('hodgkinhuxley_f', 'hodgkinhuxley_f_expl'):
        getattr(lib, name).argtypes = [dptr, dptr, ctypes.c_size_t, ctypes.c_double]
    lib.hodgkinhuxley_lmbda_exp.argtypes = [dptr, dptr, ctypes.c_size_t]
    lib.hodgkinhuxley_lmbda_yinf_exp.argtypes = [dptr, dptr, dptr, ctypes.c_size_t]
    lib.bistable_rho_f_expl.restype = ctypes.c_double
    lib.hodgkinhuxley_rho_f_expl.restype = ctypes.c_double
    return lib


class NativeIonicModel:
    """ctypes wrapper exposing the reference-style numpy API."""

    def __init__(self, name: str, scale: float = 1.0):
        self.name = name
        self.scale = scale
        self.lib = load_native()
        self.size = getattr(self.lib, f'{name}_size')()

    def initial_values(self):
        y0 = np.zeros(self.size)
        getattr(self.lib, f'{self.name}_initial_values')(y0.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        return y0

    def _call2(self, fname, y):
        y = np.ascontiguousarray(y, dtype=np.float64)
        out = np.zeros_like(y)
        n = y.shape[-1]
        getattr(self.lib, fname)(
            y.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            n,
            self.scale,
        )
        return out

    def f(self, y):
        return self._call2(f'{self.name}_f', y)

    def f_expl(self, y):
        return self._call2(f'{self.name}_f_expl', y)

    def lmbda_exp(self, y):
        y = np.ascontiguousarray(y, dtype=np.float64)
        out = np.zeros_like(y)
        getattr(self.lib, f'{self.name}_lmbda_exp')(
            y.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            y.shape[-1],
        )
        return out

    def lmbda_yinf_exp(self, y):
        y = np.ascontiguousarray(y, dtype=np.float64)
        lm = np.zeros_like(y)
        yi = np.zeros_like(y)
        getattr(self.lib, f'{self.name}_lmbda_yinf_exp')(
            y.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            lm.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            yi.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            y.shape[-1],
        )
        return lm, yi

    def rho_f_expl(self):
        return getattr(self.lib, f'{self.name}_rho_f_expl')()


# ---------------------------------------------------------------------------
# JAX implementations (the TPU compute path; same formulas)
# ---------------------------------------------------------------------------


class BiStableJAX:
    """Nagumo-type cubic, one variable."""

    size = 1
    V_th, V_depol, V_rest, a = -57.6, 30.0, -85.0, 1.4e-3
    #: indices whose RHS is treated explicitly / exponentially (reference
    #: f_expl_indeces / f_exp_indeces)
    f_expl_indices = (0,)
    f_exp_indices = ()

    def __init__(self, scale: float = 1.0):
        self.scale = scale

    def initial_values(self):
        return jnp.asarray([-85.0])

    def f(self, y):
        v = y[0]
        return (-self.scale * self.a * (v - self.V_th) * (v - self.V_depol) * (v - self.V_rest))[None]

    f_expl = f

    def lmbda_exp(self, y):
        return jnp.zeros_like(y)

    def lmbda_yinf_exp(self, y):
        return jnp.zeros_like(y), jnp.zeros_like(y)

    def rho_f_expl(self):
        return 20.0


class HodgkinHuxleyJAX:
    """Hodgkin-Huxley 1952 squid axon (original E_R = -75 convention)."""

    size = 4
    g_L, Cm, E_R = 0.3, 1.0, -75.0
    E_K, g_K = E_R - 12.0, 36.0
    E_Na, g_Na = E_R + 115.0, 120.0
    E_L = E_R + 10.613
    f_expl_indices = (0,)
    f_exp_indices = (1, 2, 3)

    def __init__(self, scale: float = 1.0):
        self.scale = scale

    def initial_values(self):
        return jnp.asarray([-75.0, 0.05, 0.595, 0.317])

    def _rates(self, v):
        an = -0.01 * (v + 65.0) / (jnp.exp(-(v + 65.0) / 10.0) - 1.0)
        bn = 0.125 * jnp.exp((v + 75.0) / 80.0)
        ah = 0.07 * jnp.exp(-(v + 75.0) / 20.0)
        bh = 1.0 / (jnp.exp(-(v + 45.0) / 10.0) + 1.0)
        am = -0.1 * (v + 50.0) / (jnp.exp(-(v + 50.0) / 10.0) - 1.0)
        bm = 4.0 * jnp.exp(-(v + 75.0) / 18.0)
        return am, bm, ah, bh, an, bn

    def _current(self, v, m, h, n):
        iK = self.g_K * n**4 * (v - self.E_K)
        iNa = self.g_Na * m**3 * h * (v - self.E_Na)
        iL = self.g_L * (v - self.E_L)
        return iNa + iK + iL

    def f(self, y):
        v, m, h, n = y[0], y[1], y[2], y[3]
        am, bm, ah, bh, an, bn = self._rates(v)
        return jnp.stack(
            [
                -self.scale * self._current(v, m, h, n),
                am * (1 - m) - bm * m,
                ah * (1 - h) - bh * h,
                an * (1 - n) - bn * n,
            ]
        )

    def f_expl(self, y):
        v, m, h, n = y[0], y[1], y[2], y[3]
        out = jnp.zeros_like(y)
        return out.at[0].set(-self.scale * self._current(v, m, h, n))

    def lmbda_exp(self, y):
        am, bm, ah, bh, an, bn = self._rates(y[0])
        out = jnp.zeros_like(y)
        return out.at[1].set(-(am + bm)).at[2].set(-(ah + bh)).at[3].set(-(an + bn))

    def lmbda_yinf_exp(self, y):
        am, bm, ah, bh, an, bn = self._rates(y[0])
        lm = jnp.zeros_like(y).at[1].set(-(am + bm)).at[2].set(-(ah + bh)).at[3].set(-(an + bn))
        yi = (
            jnp.zeros_like(y)
            .at[1].set(am / (am + bm))
            .at[2].set(ah / (ah + bh))
            .at[3].set(an / (an + bn))
        )
        return lm, yi

    def rho_f_expl(self):
        return 40.0


JAX_MODELS = {'bistable': BiStableJAX, 'hodgkinhuxley': HodgkinHuxleyJAX}
