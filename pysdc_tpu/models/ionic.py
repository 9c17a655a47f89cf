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
    for model in ('bistable', 'hodgkinhuxley', 'courtemanche', 'tentusscher', 'tentusscher_smooth'):
        for op in ('f', 'f_expl'):
            fn = getattr(lib, f'{model}_{op}', None)
            if fn is not None:
                fn.argtypes = [dptr, dptr, ctypes.c_size_t, ctypes.c_double]
        fn = getattr(lib, f'{model}_lmbda_exp', None)
        if fn is not None:
            fn.argtypes = [dptr, dptr, ctypes.c_size_t]
        fn = getattr(lib, f'{model}_lmbda_yinf_exp', None)
        if fn is not None:
            fn.argtypes = [dptr, dptr, dptr, ctypes.c_size_t]
        fn = getattr(lib, f'{model}_rho_f_expl', None)
        if fn is not None:
            fn.restype = ctypes.c_double
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


class CourtemancheJAX:
    """Courtemanche-Ramirez-Nattel 1998 human atrial myocyte (21 states;
    CellML 'courtemanche_ramirez_nattel_1998'; counterpart of the reference
    courtemanche.h).  States: V, m, h, j, oa, oi, ua, ui, xr, xs, d, f,
    f_Ca, u, v, w, Na_i, Ca_i, K_i, Ca_rel, Ca_up.  The twelve V-gated
    variables {1..11, 15} expose the Rush-Larsen lmbda/yinf splitting."""

    size = 21
    f_expl_indices = (0, 12, 13, 14, 16, 17, 18, 19, 20)
    f_exp_indices = (1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 15)

    R, T, F, Cm = 8.3143, 310.0, 96.4867, 1.0
    Ca_o, K_o, Na_o = 1.8, 5.4, 140.0
    g_Na, g_K1, g_to = 7.8, 0.09, 0.1652
    g_Kr, g_Ks = 2.94117649999999994e-02, 1.29411759999999987e-01
    g_Ca_L, g_B_Na, g_B_Ca, g_B_K = 0.12375, 6.74437500000000015e-04, 0.001131, 0.0
    i_NaK_max, Km_Na_i, Km_K_o = 5.99338739999999981e-01, 10.0, 1.5
    I_NaCa_max, K_mNa, K_mCa, K_sat, ncx_gamma = 1600.0, 87.5, 1.38, 0.1, 0.35
    i_CaP_max = 0.275
    K_rel, tau_tr, I_up_max, K_up, Ca_up_max = 30.0, 180.0, 0.005, 0.00092, 15.0
    tau_u, tau_f_Ca, K_Q10 = 8.0, 2.0, 3.0
    CMDN_max, CSQN_max, TRPN_max = 0.05, 10.0, 0.07
    Km_CMDN, Km_CSQN, Km_TRPN = 0.00238, 0.8, 0.0005
    V_cell = 20100.0
    V_i, V_rel, V_up = V_cell * 0.68, 0.0048 * V_cell, 0.0552 * V_cell

    def __init__(self, scale: float = 1.0):
        self.scale = scale
        self.sigma = (np.exp(self.Na_o / 67.3) - 1.0) / 7.0
        self.FRT = self.F / (self.R * self.T)

    def initial_values(self):
        return jnp.asarray(
            [-81.18, 0.002908, 0.9649, 0.9775, 0.03043, 0.9992, 0.004966, 0.9986,
             3.296e-05, 0.01869, 0.0001367, 0.9996, 0.7755, 2.35e-112, 1.0, 0.9992,
             11.17, 0.0001013, 139.0, 1.488, 1.488]
        )

    def rho_f_expl(self):
        return 7.5

    # -- gate rates: (tau, yinf) per gate, V only -------------------------
    def _gate_rates(self, V):
        """dict gate_index -> (tau, yinf)."""
        w = jnp.where
        KQ = self.K_Q10
        out = {}
        # m (removable singularity at V = -47.13)
        Vs = w(jnp.abs(V + 47.13) < 1e-12, V + 1e-6, V)
        a = 0.32 * (Vs + 47.13) / (1.0 - jnp.exp(-0.1 * (Vs + 47.13)))
        a = w(jnp.abs(V + 47.13) < 1e-12, 3.2, a)
        b = 0.08 * jnp.exp(-V / 11.0)
        out[1] = (1.0 / (a + b), a / (a + b))
        # h
        a = w(V < -40.0, 0.135 * jnp.exp(-(V + 80.0) / 6.8), 0.0)
        b = w(
            V < -40.0,
            3.56 * jnp.exp(0.079 * V) + 310000.0 * jnp.exp(0.35 * jnp.minimum(V, 0.0)),
            1.0 / (0.13 * (1.0 + jnp.exp(-(V + 10.66) / 11.1))),
        )
        out[2] = (1.0 / (a + b), a / (a + b))
        # j
        a = w(
            V < -40.0,
            (-127140.0 * jnp.exp(0.2444 * jnp.minimum(V, 0.0)) - 3.474e-05 * jnp.exp(-0.04391 * V))
            * (V + 37.78)
            / (1.0 + jnp.exp(0.311 * jnp.minimum(V + 79.23, 200.0))),
            0.0,
        )
        b = w(
            V < -40.0,
            0.1212 * jnp.exp(-0.01052 * V) / (1.0 + jnp.exp(-0.1378 * (V + 40.14))),
            0.3 * jnp.exp(-2.535e-07 * V) / (1.0 + jnp.exp(-0.1 * (V + 32.0))),
        )
        out[3] = (1.0 / (a + b), a / (a + b))
        # oa / ua share alpha,beta
        a = 0.65 / (jnp.exp(-(V + 10.0) / 8.5) + jnp.exp(-(V - 30.0) / 59.0))
        b = 0.65 / (2.5 + jnp.exp((V + 82.0) / 17.0))
        tau_shared = 1.0 / ((a + b) * KQ)
        out[4] = (tau_shared, 1.0 / (1.0 + jnp.exp(-(V + 20.47) / 17.54)))
        out[6] = (tau_shared, 1.0 / (1.0 + jnp.exp(-(V + 30.3) / 9.6)))
        # oi
        a = 1.0 / (18.53 + jnp.exp((V + 113.7) / 10.95))
        b = 1.0 / (35.56 + jnp.exp(-(V - 1.26) / 7.44))
        out[5] = (1.0 / ((a + b) * KQ), 1.0 / (1.0 + jnp.exp((V + 43.1) / 5.3)))
        # ui
        a = 1.0 / (21.0 + jnp.exp(-(V - 185.0) / 28.0))
        b = jnp.exp((V - 158.0) / 16.0)
        out[7] = (1.0 / ((a + b) * KQ), 1.0 / (1.0 + jnp.exp((V - 99.45) / 27.48)))
        # xr
        Vs = w(jnp.abs(V + 14.1) < 1e-10, V + 1e-6, V)
        a = w(jnp.abs(V + 14.1) < 1e-10, 0.0015, 0.0003 * (Vs + 14.1) / (1.0 - jnp.exp(-(Vs + 14.1) / 5.0)))
        Vs = w(jnp.abs(V - 3.3328) < 1e-10, V + 1e-6, V)
        b = w(
            jnp.abs(V - 3.3328) < 1e-10,
            3.78361180000000004e-04,
            7.38980000000000030e-05 * (Vs - 3.3328) / (jnp.exp((Vs - 3.3328) / 5.1237) - 1.0),
        )
        out[8] = (1.0 / (a + b), 1.0 / (1.0 + jnp.exp(-(V + 14.1) / 6.5)))
        # xs
        Vs = w(jnp.abs(V - 19.9) < 1e-10, V + 1e-6, V)
        a = w(jnp.abs(V - 19.9) < 1e-10, 0.00068, 4e-05 * (Vs - 19.9) / (1.0 - jnp.exp(-(Vs - 19.9) / 17.0)))
        b = w(jnp.abs(V - 19.9) < 1e-10, 0.000315, 3.5e-05 * (Vs - 19.9) / (jnp.exp((Vs - 19.9) / 9.0) - 1.0))
        out[9] = (0.5 / (a + b), (1.0 + jnp.exp(-(V - 19.9) / 12.7)) ** -0.5)
        # d
        Vs = w(jnp.abs(V + 10.0) < 1e-10, V + 1e-6, V)
        e = jnp.exp(-(Vs + 10.0) / 6.24)
        tau_d = w(
            jnp.abs(V + 10.0) < 1e-10,
            4.579 / (1.0 + jnp.exp(-(V + 10.0) / 6.24)),
            (1.0 - e) / (0.035 * (Vs + 10.0) * (1.0 + e)),
        )
        out[10] = (tau_d, 1.0 / (1.0 + jnp.exp(-(V + 10.0) / 8.0)))
        # f
        e = jnp.exp(-(V + 28.0) / 6.9)
        out[11] = (9.0 / (0.0197 * jnp.exp(-(0.0337**2) * (V + 10.0) ** 2) + 0.02), e / (1.0 + e))
        # w
        Vs = w(jnp.abs(V - 7.9) < 1e-10, V + 1e-6, V)
        e = jnp.exp(-(Vs - 7.9) / 5.0)
        tau_w = w(jnp.abs(V - 7.9) < 1e-10, 6.0 * 0.2 / 1.3, 6.0 * (1.0 - e) / ((1.0 + 0.3 * e) * (Vs - 7.9)))
        out[15] = (tau_w, 1.0 - 1.0 / (1.0 + jnp.exp(-(V - 40.0) / 17.0)))
        return out

    def _nonlin(self, y):
        """dict index -> RHS for the explicit indices."""
        V, m, h, j = y[0], y[1], y[2], y[3]
        oa, oi, ua, ui, xr, xs, d, fg = y[4], y[5], y[6], y[7], y[8], y[9], y[10], y[11]
        fCa, u, v, wg = y[12], y[13], y[14], y[15]
        Na_i, Ca_i, K_i, Ca_rel, Ca_up = y[16], y[17], y[18], y[19], y[20]
        FRT = self.FRT
        out = {}
        out[12] = (1.0 / (1.0 + Ca_i / 0.00035) - fCa) / self.tau_f_Ca
        i_tr = (Ca_up - Ca_rel) / self.tau_tr
        i_up_leak = self.I_up_max * Ca_up / self.Ca_up_max
        i_rel = self.K_rel * u**2 * v * wg * (Ca_rel - Ca_i)
        out[19] = (i_tr - i_rel) / (1.0 + self.CSQN_max * self.Km_CSQN / (Ca_rel + self.Km_CSQN) ** 2)
        i_up = self.I_up_max / (1.0 + self.K_up / Ca_i)
        out[20] = i_up - (i_up_leak + i_tr * self.V_rel / self.V_up)
        i_CaP = self.Cm * self.i_CaP_max * Ca_i / (0.0005 + Ca_i)
        f_NaK = 1.0 / (1.0 + 0.1245 * jnp.exp(-0.1 * FRT * V) + 0.0365 * self.sigma * jnp.exp(-FRT * V))
        i_NaK = (
            self.Cm * self.i_NaK_max * f_NaK / (1.0 + (self.Km_Na_i / Na_i) ** 1.5)
            * self.K_o / (self.K_o + self.Km_K_o)
        )
        E_K = jnp.log(self.K_o / K_i) / FRT
        i_K1 = self.Cm * self.g_K1 * (V - E_K) / (1.0 + jnp.exp(0.07 * (V + 80.0)))
        i_to = self.Cm * self.g_to * oa**3 * oi * (V - E_K)
        g_Kur = 0.005 + 0.05 / (1.0 + jnp.exp(-(V - 15.0) / 13.0))
        i_Kur = self.Cm * g_Kur * ua**3 * ui * (V - E_K)
        i_Ca_L = self.Cm * self.g_Ca_L * d * fg * fCa * (V - 65.0)
        i_NaCa = (
            self.Cm * self.I_NaCa_max
            * (
                jnp.exp(self.ncx_gamma * FRT * V) * Na_i**3 * self.Ca_o
                - jnp.exp((self.ncx_gamma - 1.0) * FRT * V) * self.Na_o**3 * Ca_i
            )
            / (
                (self.K_mNa**3 + self.Na_o**3) * (self.K_mCa + self.Ca_o)
                * (1.0 + self.K_sat * jnp.exp((self.ncx_gamma - 1.0) * FRT * V))
            )
        )
        E_Ca = jnp.log(self.Ca_o / Ca_i) / (2.0 * FRT)
        i_B_K = self.Cm * self.g_B_K * (V - E_K)
        E_Na = jnp.log(self.Na_o / Na_i) / FRT
        i_Kr = self.Cm * self.g_Kr * xr * (V - E_K) / (1.0 + jnp.exp((V + 15.0) / 22.4))
        i_Ks = self.Cm * self.g_Ks * xs**2 * (V - E_K)
        Fn = 1000.0 * (1e-15 * self.V_rel * i_rel - 1e-15 / (2.0 * self.F) * (0.5 * i_Ca_L - 0.2 * i_NaCa))
        i_B_Ca = self.Cm * self.g_B_Ca * (V - E_Ca)
        i_B_Na = self.Cm * self.g_B_Na * (V - E_Na)
        i_Na = self.Cm * self.g_Na * m**3 * h * j * (V - E_Na)
        out[18] = (2.0 * i_NaK - (i_K1 + i_to + i_Kur + i_Kr + i_Ks + i_B_K)) / (self.V_i * self.F)
        u_inf = 1.0 / (1.0 + jnp.exp(-(Fn - 3.41749999999999983e-13) / 1.367e-15))
        tau_v = 1.91 + 2.09 / (1.0 + jnp.exp(-(Fn - 3.41749999999999983e-13) / 1.367e-15))
        v_inf = 1.0 - 1.0 / (1.0 + jnp.exp(-(Fn - 6.835e-14) / 1.367e-15))
        out[16] = (-3.0 * i_NaK - (3.0 * i_NaCa + i_B_Na + i_Na)) / (self.V_i * self.F)
        out[0] = (
            self.scale
            * -(i_Na + i_K1 + i_to + i_Kur + i_Kr + i_Ks + i_B_Na + i_B_Ca + i_NaK + i_CaP + i_NaCa + i_Ca_L)
            / self.Cm
        )
        out[13] = (u_inf - u) / self.tau_u
        out[14] = (v_inf - v) / tau_v
        B1 = (2.0 * i_NaCa - (i_CaP + i_Ca_L + i_B_Ca)) / (2.0 * self.V_i * self.F) + (
            self.V_up * (i_up_leak - i_up) + i_rel * self.V_rel
        ) / self.V_i
        B2 = (
            1.0
            + self.TRPN_max * self.Km_TRPN / (Ca_i + self.Km_TRPN) ** 2
            + self.CMDN_max * self.Km_CMDN / (Ca_i + self.Km_CMDN) ** 2
        )
        out[17] = B1 / B2
        return out

    def f(self, y):
        rates = self._gate_rates(y[0])
        nl = self._nonlin(y)
        rows = []
        for i in range(self.size):
            if i in nl:
                rows.append(nl[i])
            else:
                tau, yinf = rates[i]
                rows.append((yinf - y[i]) / tau)
        return jnp.stack(rows)

    def f_expl(self, y):
        nl = self._nonlin(y)
        zero = jnp.zeros_like(y[0])
        return jnp.stack([nl.get(i, zero) for i in range(self.size)])

    def lmbda_exp(self, y):
        rates = self._gate_rates(y[0])
        zero = jnp.zeros_like(y[0])
        return jnp.stack([-1.0 / rates[i][0] if i in rates else zero for i in range(self.size)])

    def lmbda_yinf_exp(self, y):
        rates = self._gate_rates(y[0])
        zero = jnp.zeros_like(y[0])
        lm = jnp.stack([-1.0 / rates[i][0] if i in rates else zero for i in range(self.size)])
        yi = jnp.stack([rates[i][1] if i in rates else zero for i in range(self.size)])
        return lm, yi


class TenTusscherJAX:
    """ten Tusscher & Panfilov 2006 human ventricular myocyte, epicardial
    parameterisation (19 states; CellML 'tentusscher_panfilov_2006_epi';
    counterpart of the reference tentusscher.h).  States: V, Xr1, Xr2, Xs,
    m, h, j, d, f, f2, fCass, s, r, Ca_i, Ca_SR, Ca_ss, R_prime, Na_i, K_i.
    Gates {1..12} expose the Rush-Larsen lmbda/yinf splitting (fCass rates
    depend on Ca_ss; the others on V only)."""

    size = 19
    f_expl_indices = (0, 13, 14, 15, 16, 17, 18)
    f_exp_indices = (1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12)
    #: if True, the V < -40 branches of the h/j gates are dropped so the RHS
    #: is smooth (reference tentusscher_smooth.h; for high-order convergence)
    smooth = False

    Cm, F, R, T = 1.0, 96.485, 8.314, 310.0
    Ca_o, K_o, Na_o = 2.0, 5.4, 140.0
    g_Na, g_K1, g_to, g_Kr, g_Ks = 14.838, 5.405, 0.294, 0.153, 0.392
    g_CaL, g_bna, g_bca, g_pCa, g_pK = 0.0398, 0.00029, 0.000592, 0.1238, 0.0146
    K_pCa, P_kna = 0.0005, 0.03
    K_NaCa, K_sat, Km_Ca, Km_Nai = 1000.0, 0.1, 1.38, 87.5
    ncx_alpha, ncx_gamma = 2.5, 0.35
    K_mNa, K_mk, P_NaK = 40.0, 1.0, 2.724
    Buf_c, Buf_sr, Buf_ss = 0.2, 10.0, 0.4
    K_buf_c, K_buf_sr, K_buf_ss = 0.001, 0.3, 0.00025
    K_up, V_leak, V_rel, V_xfer, Vmax_up = 0.00025, 0.00036, 0.102, 0.0038, 0.006375
    k1_prime, k2_prime, k3, k4 = 0.15, 0.045, 0.06, 0.005
    max_sr, min_sr, EC = 2.5, 1.0, 1.5
    V_c, V_sr, V_ss = 16404.0, 1094.0, 54.68

    def __init__(self, scale: float = 1.0):
        self.scale = scale
        self.FRT = self.F / (self.R * self.T)

    def initial_values(self):
        return jnp.asarray(
            [-85.23, 0.00621, 0.4712, 0.0095, 0.00172, 0.7444, 0.7045, 3.373e-05,
             0.7888, 0.9755, 0.9953, 0.999998, 2.42e-08, 0.000126, 3.64, 0.00036,
             0.9073, 8.604, 136.89]
        )

    def rho_f_expl(self):
        return 6.5

    def _gate_rates(self, V, Ca_ss):
        w = jnp.where
        out = {}
        a = 450.0 / (1.0 + jnp.exp((-45.0 - V) / 10.0))
        b = 6.0 / (1.0 + jnp.exp((V + 30.0) / 11.5))
        out[1] = (a * b, 1.0 / (1.0 + jnp.exp((-26.0 - V) / 7.0)))
        a = 3.0 / (1.0 + jnp.exp((-60.0 - V) / 20.0))
        b = 1.12 / (1.0 + jnp.exp((V - 60.0) / 20.0))
        out[2] = (a * b, 1.0 / (1.0 + jnp.exp((V + 88.0) / 24.0)))
        a = 1400.0 / jnp.sqrt(1.0 + jnp.exp((5.0 - V) / 6.0))
        b = 1.0 / (1.0 + jnp.exp((V - 35.0) / 15.0))
        out[3] = (a * b + 80.0, 1.0 / (1.0 + jnp.exp((-5.0 - V) / 14.0)))
        a = 1.0 / (1.0 + jnp.exp((-60.0 - V) / 5.0))
        b = 0.1 / (1.0 + jnp.exp((V + 35.0) / 5.0)) + 0.1 / (1.0 + jnp.exp((V - 50.0) / 200.0))
        out[4] = (a * b, (1.0 + jnp.exp((-56.86 - V) / 9.03)) ** -2)
        hj_inf = (1.0 + jnp.exp((V + 71.55) / 7.43)) ** -2
        bh_pos = 0.77 / (0.13 * (1.0 + jnp.exp(-(V + 10.66) / 11.1)))
        bj_pos = 0.6 * jnp.exp(0.057 * V) / (1.0 + jnp.exp(-0.1 * (V + 32.0)))
        if self.smooth:
            out[5] = (1.0 / bh_pos, hj_inf)
            out[6] = (1.0 / bj_pos, hj_inf)
        else:
            a = w(V < -40.0, 0.057 * jnp.exp(-(V + 80.0) / 6.8), 0.0)
            b = w(
                V < -40.0,
                2.7 * jnp.exp(0.079 * V) + 310000.0 * jnp.exp(0.3485 * jnp.minimum(V, 0.0)),
                bh_pos,
            )
            out[5] = (1.0 / (a + b), hj_inf)
            a = w(
                V < -40.0,
                (-25428.0 * jnp.exp(0.2444 * jnp.minimum(V, 0.0)) - 6.948e-06 * jnp.exp(-0.04391 * V))
                * (V + 37.78)
                / (1.0 + jnp.exp(0.311 * jnp.minimum(V + 79.23, 200.0))),
                0.0,
            )
            b = w(
                V < -40.0,
                0.02424 * jnp.exp(-0.01052 * V) / (1.0 + jnp.exp(-0.1378 * (V + 40.14))),
                bj_pos,
            )
            out[6] = (1.0 / (a + b), hj_inf)
        a = 1.4 / (1.0 + jnp.exp((-35.0 - V) / 13.0)) + 0.25
        b = 1.4 / (1.0 + jnp.exp((V + 5.0) / 5.0))
        g = 1.0 / (1.0 + jnp.exp((50.0 - V) / 20.0))
        out[7] = (a * b + g, 1.0 / (1.0 + jnp.exp((-8.0 - V) / 7.5)))
        tau = (
            1102.5 * jnp.exp(-((V + 27.0) ** 2) / 225.0)
            + 200.0 / (1.0 + jnp.exp((13.0 - V) / 10.0))
            + 180.0 / (1.0 + jnp.exp((V + 30.0) / 10.0))
            + 20.0
        )
        out[8] = (tau, 1.0 / (1.0 + jnp.exp((V + 20.0) / 7.0)))
        tau = (
            562.0 * jnp.exp(-((V + 27.0) ** 2) / 240.0)
            + 31.0 / (1.0 + jnp.exp((25.0 - V) / 10.0))
            + 80.0 / (1.0 + jnp.exp((V + 30.0) / 10.0))
        )
        out[9] = (tau, 0.67 / (1.0 + jnp.exp((V + 35.0) / 7.0)) + 0.33)
        q = (Ca_ss / 0.05) ** 2
        out[10] = (80.0 / (1.0 + q) + 2.0, 0.6 / (1.0 + q) + 0.4)
        tau = 85.0 * jnp.exp(-((V + 45.0) ** 2) / 320.0) + 5.0 / (1.0 + jnp.exp((V - 20.0) / 5.0)) + 3.0
        out[11] = (tau, 1.0 / (1.0 + jnp.exp((V + 20.0) / 5.0)))
        out[12] = (
            9.5 * jnp.exp(-((V + 40.0) ** 2) / 1800.0) + 0.8,
            1.0 / (1.0 + jnp.exp((20.0 - V) / 6.0)),
        )
        return out

    def _nonlin(self, y):
        V, Xr1, Xr2, Xs, m, h, jg = y[0], y[1], y[2], y[3], y[4], y[5], y[6]
        d, fg, f2, fCass, s, r = y[7], y[8], y[9], y[10], y[11], y[12]
        Ca_i, Ca_SR, Ca_ss, Rp, Na_i, K_i = y[13], y[14], y[15], y[16], y[17], y[18]
        FRT = self.FRT
        out = {}
        fJi = 1.0 / (1.0 + self.Buf_c * self.K_buf_c / (Ca_i + self.K_buf_c) ** 2)
        fJsr = 1.0 / (1.0 + self.Buf_sr * self.K_buf_sr / (Ca_SR + self.K_buf_sr) ** 2)
        fJss = 1.0 / (1.0 + self.Buf_ss * self.K_buf_ss / (Ca_ss + self.K_buf_ss) ** 2)
        i_leak = self.V_leak * (Ca_SR - Ca_i)
        i_up = self.Vmax_up / (1.0 + self.K_up**2 / Ca_i**2)
        i_xfer = self.V_xfer * (Ca_ss - Ca_i)
        kcasr = self.max_sr - (self.max_sr - self.min_sr) / (1.0 + (self.EC / Ca_SR) ** 2)
        k1 = self.k1_prime / kcasr
        k2 = self.k2_prime * kcasr
        O = k1 * Ca_ss**2 * Rp / (self.k3 + k1 * Ca_ss**2)
        out[16] = -k2 * Ca_ss * Rp + self.k4 * (1.0 - Rp)
        i_rel = self.V_rel * O * (Ca_SR - Ca_ss)
        out[14] = (i_up - (i_rel + i_leak)) * fJsr
        E_Ca = 0.5 * jnp.log(self.Ca_o / Ca_i) / FRT
        E_K = jnp.log(self.K_o / K_i) / FRT
        i_NaK = (
            self.P_NaK * self.K_o / (self.K_o + self.K_mk) * Na_i / (Na_i + self.K_mNa)
            / (1.0 + 0.1245 * jnp.exp(-0.1 * V * FRT) + 0.0353 * jnp.exp(-V * FRT))
        )
        i_to = self.g_to * r * s * (V - E_K)
        i_p_Ca = self.g_pCa * Ca_i / (Ca_i + self.K_pCa)
        e2v = jnp.exp(2.0 * (V - 15.0) * FRT)
        i_CaL = (
            self.g_CaL * d * fg * f2 * fCass * 4.0 * (V - 15.0) * self.F * FRT
            * (0.25 * Ca_ss * e2v - self.Ca_o) / (e2v - 1.0)
        )
        i_b_Ca = self.g_bca * (V - E_Ca)
        aK1 = 0.1 / (1.0 + jnp.exp(0.06 * (V - E_K - 200.0)))
        bK1 = (
            3.0 * jnp.exp(0.0002 * (V - E_K + 100.0)) + jnp.exp(0.1 * (V - E_K - 10.0))
        ) / (1.0 + jnp.exp(-0.5 * (V - E_K)))
        i_p_K = self.g_pK * (V - E_K) / (1.0 + jnp.exp((25.0 - V) / 5.98))
        i_Kr = self.g_Kr * jnp.sqrt(self.K_o / 5.4) * Xr1 * Xr2 * (V - E_K)
        E_Ks = jnp.log((self.K_o + self.P_kna * self.Na_o) / (K_i + self.P_kna * Na_i)) / FRT
        E_Na = jnp.log(self.Na_o / Na_i) / FRT
        i_NaCa = (
            self.K_NaCa
            * (
                jnp.exp(self.ncx_gamma * V * FRT) * Na_i**3 * self.Ca_o
                - jnp.exp((self.ncx_gamma - 1.0) * V * FRT) * self.Na_o**3 * Ca_i * self.ncx_alpha
            )
            / (
                (self.Km_Nai**3 + self.Na_o**3) * (self.Km_Ca + self.Ca_o)
                * (1.0 + self.K_sat * jnp.exp((self.ncx_gamma - 1.0) * V * FRT))
            )
        )
        ddt_Ca_i = (
            -(i_b_Ca + i_p_Ca - 2.0 * i_NaCa) * self.Cm / (2.0 * self.V_c * self.F)
            + (i_leak - i_up) * self.V_sr / self.V_c
            + i_xfer
        )
        ddt_Ca_ss = (
            -i_CaL * self.Cm / (2.0 * self.V_ss * self.F)
            + i_rel * self.V_sr / self.V_ss
            - i_xfer * self.V_c / self.V_ss
        )
        i_Na = self.g_Na * m**3 * h * jg * (V - E_Na)
        xK1_inf = aK1 / (aK1 + bK1)
        i_Ks = self.g_Ks * Xs**2 * (V - E_Ks)
        i_b_Na = self.g_bna * (V - E_Na)
        out[13] = ddt_Ca_i * fJi
        out[15] = ddt_Ca_ss * fJss
        i_K1 = self.g_K1 * xK1_inf * jnp.sqrt(self.K_o / 5.4) * (V - E_K)
        out[17] = -(i_Na + i_b_Na + 3.0 * i_NaK + 3.0 * i_NaCa) / (self.V_c * self.F) * self.Cm
        out[0] = self.scale * -(
            i_K1 + i_to + i_Kr + i_Ks + i_CaL + i_NaK + i_Na + i_b_Na + i_NaCa + i_b_Ca + i_p_K + i_p_Ca
        )
        out[18] = -(i_K1 + i_to + i_Kr + i_Ks + i_p_K - 2.0 * i_NaK) / (self.V_c * self.F) * self.Cm
        return out

    def f(self, y):
        rates = self._gate_rates(y[0], y[15])
        nl = self._nonlin(y)
        rows = []
        for i in range(self.size):
            if i in nl:
                rows.append(nl[i])
            else:
                tau, yinf = rates[i]
                rows.append((yinf - y[i]) / tau)
        return jnp.stack(rows)

    def f_expl(self, y):
        nl = self._nonlin(y)
        zero = jnp.zeros_like(y[0])
        return jnp.stack([nl.get(i, zero) for i in range(self.size)])

    def lmbda_exp(self, y):
        rates = self._gate_rates(y[0], y[15])
        zero = jnp.zeros_like(y[0])
        return jnp.stack([-1.0 / rates[i][0] if i in rates else zero for i in range(self.size)])

    def lmbda_yinf_exp(self, y):
        rates = self._gate_rates(y[0], y[15])
        zero = jnp.zeros_like(y[0])
        lm = jnp.stack([-1.0 / rates[i][0] if i in rates else zero for i in range(self.size)])
        yi = jnp.stack([rates[i][1] if i in rates else zero for i in range(self.size)])
        return lm, yi


class TenTusscherSmoothJAX(TenTusscherJAX):
    """Smooth variant (reference tentusscher_smooth.h): the V < -40 branches
    of the h/j gates are removed so the RHS is infinitely differentiable —
    used for convergence tests of high-order methods."""

    smooth = True


JAX_MODELS.update(
    {
        'courtemanche': CourtemancheJAX,
        'tentusscher': TenTusscherJAX,
        'tentusscher_smooth': TenTusscherSmoothJAX,
    }
)
