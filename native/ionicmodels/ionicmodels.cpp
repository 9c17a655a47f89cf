// Cardiac ionic cell models, native C++ core.
//
// TPU-native counterpart of the reference's only native component
// (pySDC/projects/Monodomain/problem_classes/ionicmodels/cpp, pybind11):
// the same model surface — f, f_expl, lmbda_exp, lmbda_yinf_exp,
// initial_values, rho_f_expl — exported as a plain C ABI (loaded through
// ctypes; pybind11 is not available in this image).  The JAX
// implementations in pysdc_tpu/models/ionic.py are verified against this
// library elementwise in tests.
//
// Data layout: y and outputs are row-major (size, n_dofs) double arrays.
// Model constants are the published Hodgkin-Huxley 1952 squid-axon values
// (original resting-potential convention, E_R = -75 mV) and the standard
// bistable (Nagumo) cubic.

#include <cmath>
#include <cstddef>

extern "C" {

// ---------------------------------------------------------------- BiStable
static const double BS_VTH = -57.6, BS_VDEP = 30.0, BS_VREST = -85.0, BS_A = 1.4e-3;

int bistable_size() { return 1; }

void bistable_initial_values(double *y0) { y0[0] = -85.0; }

double bistable_rho_f_expl() { return 20.0; }

void bistable_f(const double *y, double *fy, size_t n, double scale)
{
    for (size_t j = 0; j < n; ++j) {
        const double v = y[j];
        fy[j] = -scale * BS_A * (v - BS_VTH) * (v - BS_VDEP) * (v - BS_VREST);
    }
}

void bistable_f_expl(const double *y, double *fy, size_t n, double scale) { bistable_f(y, fy, n, scale); }

// ---------------------------------------------------------- Hodgkin-Huxley
static const double HH_GL = 0.3, HH_CM = 1.0, HH_ER = -75.0;
static const double HH_EK = HH_ER - 12.0, HH_GK = 36.0;
static const double HH_ENA = HH_ER + 115.0, HH_GNA = 120.0;
static const double HH_EL = HH_ER + 10.613;

int hodgkinhuxley_size() { return 4; }

void hodgkinhuxley_initial_values(double *y0)
{
    y0[0] = -75.0;  // V
    y0[1] = 0.05;   // m
    y0[2] = 0.595;  // h
    y0[3] = 0.317;  // n
}

double hodgkinhuxley_rho_f_expl() { return 40.0; }

static inline void hh_rates(double v, double *am, double *bm, double *ah, double *bh, double *an, double *bn)
{
    *an = -0.01 * (v + 65.0) / (std::exp(-(v + 65.0) / 10.0) - 1.0);
    *bn = 0.125 * std::exp((v + 75.0) / 80.0);
    *ah = 0.07 * std::exp(-(v + 75.0) / 20.0);
    *bh = 1.0 / (std::exp(-(v + 45.0) / 10.0) + 1.0);
    *am = -0.1 * (v + 50.0) / (std::exp(-(v + 50.0) / 10.0) - 1.0);
    *bm = 4.0 * std::exp(-(v + 75.0) / 18.0);
}

static inline double hh_current(double v, double m, double h, double n)
{
    const double iK = HH_GK * n * n * n * n * (v - HH_EK);
    const double iNa = HH_GNA * m * m * m * h * (v - HH_ENA);
    const double iL = HH_GL * (v - HH_EL);
    return iNa + iK + iL;
}

void hodgkinhuxley_f(const double *y, double *fy, size_t n, double scale)
{
    const double *V = y, *m = y + n, *h = y + 2 * n, *nn = y + 3 * n;
    double *fV = fy, *fm = fy + n, *fh = fy + 2 * n, *fn = fy + 3 * n;
    for (size_t j = 0; j < n; ++j) {
        double am, bm, ah, bh, an, bn;
        hh_rates(V[j], &am, &bm, &ah, &bh, &an, &bn);
        fV[j] = -scale * hh_current(V[j], m[j], h[j], nn[j]);
        fm[j] = am * (1.0 - m[j]) - bm * m[j];
        fh[j] = ah * (1.0 - h[j]) - bh * h[j];
        fn[j] = an * (1.0 - nn[j]) - bn * nn[j];
    }
}

void hodgkinhuxley_f_expl(const double *y, double *fy, size_t n, double scale)
{
    const double *V = y, *m = y + n, *h = y + 2 * n, *nn = y + 3 * n;
    for (size_t j = 0; j < n; ++j)
        fy[j] = -scale * hh_current(V[j], m[j], h[j], nn[j]);
}

void hodgkinhuxley_lmbda_exp(const double *y, double *lmbda, size_t n)
{
    const double *V = y;
    double *lm = lmbda + n, *lh = lmbda + 2 * n, *ln = lmbda + 3 * n;
    for (size_t j = 0; j < n; ++j) {
        double am, bm, ah, bh, an, bn;
        hh_rates(V[j], &am, &bm, &ah, &bh, &an, &bn);
        lm[j] = -(am + bm);
        lh[j] = -(ah + bh);
        ln[j] = -(an + bn);
    }
}

void hodgkinhuxley_lmbda_yinf_exp(const double *y, double *lmbda, double *yinf, size_t n)
{
    const double *V = y;
    double *lm = lmbda + n, *lh = lmbda + 2 * n, *ln = lmbda + 3 * n;
    double *ym = yinf + n, *yh = yinf + 2 * n, *yn = yinf + 3 * n;
    for (size_t j = 0; j < n; ++j) {
        double am, bm, ah, bh, an, bn;
        hh_rates(V[j], &am, &bm, &ah, &bh, &an, &bn);
        lm[j] = -(am + bm);
        ym[j] = am / (am + bm);
        lh[j] = -(ah + bh);
        yh[j] = ah / (ah + bh);
        ln[j] = -(an + bn);
        yn[j] = an / (an + bn);
    }
}

}  // extern "C"

// ------------------------------------------------------- Courtemanche 1998
// Human atrial myocyte model (Courtemanche, Ramirez & Nattel, Am. J.
// Physiol. 275, 1998; CellML "courtemanche_ramirez_nattel_1998").
// Counterpart of reference courtemanche.h (574 LoC, pybind11).  21 states:
//   0 V, 1 m, 2 h, 3 j, 4 oa, 5 oi, 6 ua, 7 ui, 8 xr, 9 xs, 10 d, 11 f,
//   12 f_Ca, 13 u, 14 v, 15 w, 16 Na_i, 17 Ca_i, 18 K_i, 19 Ca_rel, 20 Ca_up
// Gates {1..11, 15} relax exponentially with V-only rates (lmbda/yinf
// splitting); the rest is the explicit part.

namespace crn {

const double R = 8.3143, T = 310.0, F = 96.4867, Cm = 1.0;
const double Ca_o = 1.8, K_o = 5.4, Na_o = 140.0;
const double g_Na = 7.8, g_K1 = 0.09, g_to = 0.1652, g_Kr = 2.94117649999999994e-02;
const double g_Ks = 1.29411759999999987e-01, g_Ca_L = 0.12375, g_B_Na = 6.74437500000000015e-04;
const double g_B_Ca = 0.001131, g_B_K = 0.0;
const double i_NaK_max = 5.99338739999999981e-01, Km_Na_i = 10.0, Km_K_o = 1.5;
const double I_NaCa_max = 1600.0, K_mNa = 87.5, K_mCa = 1.38, K_sat = 0.1, ncx_gamma = 0.35;
const double i_CaP_max = 0.275;
const double K_rel = 30.0, tau_tr = 180.0, I_up_max = 0.005, K_up = 0.00092, Ca_up_max = 15.0;
const double tau_u = 8.0, tau_f_Ca = 2.0, K_Q10 = 3.0;
const double CMDN_max = 0.05, CSQN_max = 10.0, TRPN_max = 0.07;
const double Km_CMDN = 0.00238, Km_CSQN = 0.8, Km_TRPN = 0.0005;
const double V_cell = 20100.0, V_i = V_cell * 0.68, V_rel = 0.0048 * V_cell, V_up = 0.0552 * V_cell;
const double sigma = (std::exp(Na_o / 67.3) - 1.0) / 7.0;
const double FRT = F / (R * T);

// per-gate (tau, yinf) as functions of V alone -----------------------------
static inline void gate_m(double V, double *tau, double *yinf)
{
    const double a = (V == -47.13) ? 3.2 : 0.32 * (V + 47.13) / (1.0 - std::exp(-0.1 * (V + 47.13)));
    const double b = 0.08 * std::exp(-V / 11.0);
    *tau = 1.0 / (a + b);
    *yinf = a * (*tau);
}

static inline void gate_h(double V, double *tau, double *yinf)
{
    const double a = (V < -40.0) ? 0.135 * std::exp(-(V + 80.0) / 6.8) : 0.0;
    const double b = (V < -40.0) ? 3.56 * std::exp(0.079 * V) + 310000.0 * std::exp(0.35 * V)
                                 : 1.0 / (0.13 * (1.0 + std::exp(-(V + 10.66) / 11.1)));
    *tau = 1.0 / (a + b);
    *yinf = a * (*tau);
}

static inline void gate_j(double V, double *tau, double *yinf)
{
    const double a = (V < -40.0)
                         ? (-127140.0 * std::exp(0.2444 * V) - 3.474e-05 * std::exp(-0.04391 * V)) * (V + 37.78)
                               / (1.0 + std::exp(0.311 * (V + 79.23)))
                         : 0.0;
    const double b = (V < -40.0)
                         ? 0.1212 * std::exp(-0.01052 * V) / (1.0 + std::exp(-0.1378 * (V + 40.14)))
                         : 0.3 * std::exp(-2.535e-07 * V) / (1.0 + std::exp(-0.1 * (V + 32.0)));
    *tau = 1.0 / (a + b);
    *yinf = a * (*tau);
}

static inline void gate_oa(double V, double *tau, double *yinf)
{
    const double a = 0.65 / (std::exp(-(V + 10.0) / 8.5) + std::exp(-(V - 30.0) / 59.0));
    const double b = 0.65 / (2.5 + std::exp((V + 82.0) / 17.0));
    *tau = 1.0 / ((a + b) * K_Q10);
    *yinf = 1.0 / (1.0 + std::exp(-(V + 20.47) / 17.54));
}

static inline void gate_oi(double V, double *tau, double *yinf)
{
    const double a = 1.0 / (18.53 + std::exp((V + 113.7) / 10.95));
    const double b = 1.0 / (35.56 + std::exp(-(V - 1.26) / 7.44));
    *tau = 1.0 / ((a + b) * K_Q10);
    *yinf = 1.0 / (1.0 + std::exp((V + 43.1) / 5.3));
}

static inline void gate_ua(double V, double *tau, double *yinf)
{
    const double a = 0.65 / (std::exp(-(V + 10.0) / 8.5) + std::exp(-(V - 30.0) / 59.0));
    const double b = 0.65 / (2.5 + std::exp((V + 82.0) / 17.0));
    *tau = 1.0 / ((a + b) * K_Q10);
    *yinf = 1.0 / (1.0 + std::exp(-(V + 30.3) / 9.6));
}

static inline void gate_ui(double V, double *tau, double *yinf)
{
    const double a = 1.0 / (21.0 + std::exp(-(V - 185.0) / 28.0));
    const double b = std::exp((V - 158.0) / 16.0);
    *tau = 1.0 / ((a + b) * K_Q10);
    *yinf = 1.0 / (1.0 + std::exp((V - 99.45) / 27.48));
}

static inline void gate_xr(double V, double *tau, double *yinf)
{
    const double a = (std::fabs(V + 14.1) < 1e-10) ? 0.0015
                                                   : 0.0003 * (V + 14.1) / (1.0 - std::exp(-(V + 14.1) / 5.0));
    const double b = (std::fabs(V - 3.3328) < 1e-10)
                         ? 3.78361180000000004e-04
                         : 7.38980000000000030e-05 * (V - 3.3328) / (std::exp((V - 3.3328) / 5.1237) - 1.0);
    *tau = 1.0 / (a + b);
    *yinf = 1.0 / (1.0 + std::exp(-(V + 14.1) / 6.5));
}

static inline void gate_xs(double V, double *tau, double *yinf)
{
    const double a = (std::fabs(V - 19.9) < 1e-10) ? 0.00068
                                                   : 4e-05 * (V - 19.9) / (1.0 - std::exp(-(V - 19.9) / 17.0));
    const double b = (std::fabs(V - 19.9) < 1e-10) ? 0.000315
                                                   : 3.5e-05 * (V - 19.9) / (std::exp((V - 19.9) / 9.0) - 1.0);
    *tau = 0.5 / (a + b);
    *yinf = std::pow(1.0 + std::exp(-(V - 19.9) / 12.7), -0.5);
}

static inline void gate_d(double V, double *tau, double *yinf)
{
    const double e = std::exp(-(V + 10.0) / 6.24);
    *tau = (std::fabs(V + 10.0) < 1e-10) ? 4.579 / (1.0 + e) : (1.0 - e) / (0.035 * (V + 10.0) * (1.0 + e));
    *yinf = 1.0 / (1.0 + std::exp(-(V + 10.0) / 8.0));
}

static inline void gate_f(double V, double *tau, double *yinf)
{
    const double e = std::exp(-(V + 28.0) / 6.9);
    *tau = 9.0 / (0.0197 * std::exp(-0.0337 * 0.0337 * (V + 10.0) * (V + 10.0)) + 0.02);
    *yinf = e / (1.0 + e);
}

static inline void gate_w(double V, double *tau, double *yinf)
{
    const double e = std::exp(-(V - 7.9) / 5.0);
    *tau = (std::fabs(V - 7.9) < 1e-10) ? 6.0 * 0.2 / 1.3 : 6.0 * (1.0 - e) / ((1.0 + 0.3 * e) * (V - 7.9));
    *yinf = 1.0 - 1.0 / (1.0 + std::exp(-(V - 40.0) / 17.0));
}

typedef void (*gate_fn)(double, double *, double *);
// gate index -> rate function; -1 entries handled separately
static const int GATE_IDX[12] = {1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 15};
static const gate_fn GATE_FN[12] = {gate_m, gate_h, gate_j, gate_oa, gate_oi, gate_ua,
                                    gate_ui, gate_xr, gate_xs, gate_d, gate_f, gate_w};

// nonlinear part: writes indices {0, 12, 13, 14, 16, 17, 18, 19, 20} -------
static inline void nonlin(const double *y, double **out, size_t j, size_t n, double scale)
{
    const double V = y[0], m = y[1], h = y[2], jj = y[3], oa = y[4], oi = y[5];
    const double ua = y[6], ui = y[7], xr = y[8], xs = y[9], d = y[10], fg = y[11];
    const double fCa = y[12], u = y[13], v = y[14], w = y[15];
    const double Na_i = y[16], Ca_i = y[17], K_i = y[18], Ca_rel = y[19], Ca_up = y[20];

    const double fCa_inf = 1.0 / (1.0 + Ca_i / 0.00035);
    out[12][j] = (fCa_inf - fCa) / tau_f_Ca;

    const double i_tr = (Ca_up - Ca_rel) / tau_tr;
    const double i_up_leak = I_up_max * Ca_up / Ca_up_max;
    const double i_rel = K_rel * u * u * v * w * (Ca_rel - Ca_i);
    out[19][j] = (i_tr - i_rel) / (1.0 + CSQN_max * Km_CSQN / ((Ca_rel + Km_CSQN) * (Ca_rel + Km_CSQN)));

    const double i_up = I_up_max / (1.0 + K_up / Ca_i);
    out[20][j] = i_up - (i_up_leak + i_tr * V_rel / V_up);

    const double i_CaP = Cm * i_CaP_max * Ca_i / (0.0005 + Ca_i);
    const double f_NaK = 1.0 / (1.0 + 0.1245 * std::exp(-0.1 * FRT * V) + 0.0365 * sigma * std::exp(-FRT * V));
    const double i_NaK =
        Cm * i_NaK_max * f_NaK / (1.0 + std::pow(Km_Na_i / Na_i, 1.5)) * K_o / (K_o + Km_K_o);

    const double E_K = std::log(K_o / K_i) / FRT;
    const double i_K1 = Cm * g_K1 * (V - E_K) / (1.0 + std::exp(0.07 * (V + 80.0)));
    const double i_to = Cm * g_to * oa * oa * oa * oi * (V - E_K);
    const double g_Kur = 0.005 + 0.05 / (1.0 + std::exp(-(V - 15.0) / 13.0));
    const double i_Kur = Cm * g_Kur * ua * ua * ua * ui * (V - E_K);

    const double i_Ca_L = Cm * g_Ca_L * d * fg * fCa * (V - 65.0);
    const double i_NaCa = Cm * I_NaCa_max
                          * (std::exp(ncx_gamma * FRT * V) * Na_i * Na_i * Na_i * Ca_o
                             - std::exp((ncx_gamma - 1.0) * FRT * V) * Na_o * Na_o * Na_o * Ca_i)
                          / ((K_mNa * K_mNa * K_mNa + Na_o * Na_o * Na_o) * (K_mCa + Ca_o)
                             * (1.0 + K_sat * std::exp((ncx_gamma - 1.0) * FRT * V)));
    const double E_Ca = std::log(Ca_o / Ca_i) / (2.0 * FRT);
    const double i_B_K = Cm * g_B_K * (V - E_K);
    const double E_Na = std::log(Na_o / Na_i) / FRT;
    const double i_Kr = Cm * g_Kr * xr * (V - E_K) / (1.0 + std::exp((V + 15.0) / 22.4));
    const double i_Ks = Cm * g_Ks * xs * xs * (V - E_K);
    const double Fn = 1000.0 * (1e-15 * V_rel * i_rel - 1e-15 / (2.0 * F) * (0.5 * i_Ca_L - 0.2 * i_NaCa));
    const double i_B_Ca = Cm * g_B_Ca * (V - E_Ca);
    const double i_B_Na = Cm * g_B_Na * (V - E_Na);
    const double i_Na = Cm * g_Na * m * m * m * h * jj * (V - E_Na);

    out[18][j] = (2.0 * i_NaK - (i_K1 + i_to + i_Kur + i_Kr + i_Ks + i_B_K)) / (V_i * F);

    const double u_inf = 1.0 / (1.0 + std::exp(-(Fn - 3.41749999999999983e-13) / 1.367e-15));
    const double tau_v = 1.91 + 2.09 / (1.0 + std::exp(-(Fn - 3.41749999999999983e-13) / 1.367e-15));
    const double v_inf = 1.0 - 1.0 / (1.0 + std::exp(-(Fn - 6.835e-14) / 1.367e-15));
    out[16][j] = (-3.0 * i_NaK - (3.0 * i_NaCa + i_B_Na + i_Na)) / (V_i * F);
    out[0][j] = scale
                * (-(i_Na + i_K1 + i_to + i_Kur + i_Kr + i_Ks + i_B_Na + i_B_Ca + i_NaK + i_CaP + i_NaCa + i_Ca_L))
                / Cm;
    out[13][j] = (u_inf - u) / tau_u;
    out[14][j] = (v_inf - v) / tau_v;

    const double B1 = (2.0 * i_NaCa - (i_CaP + i_Ca_L + i_B_Ca)) / (2.0 * V_i * F)
                      + (V_up * (i_up_leak - i_up) + i_rel * V_rel) / V_i;
    const double B2 = 1.0 + TRPN_max * Km_TRPN / ((Ca_i + Km_TRPN) * (Ca_i + Km_TRPN))
                      + CMDN_max * Km_CMDN / ((Ca_i + Km_CMDN) * (Ca_i + Km_CMDN));
    out[17][j] = B1 / B2;
}

}  // namespace crn

extern "C" {

int courtemanche_size() { return 21; }

void courtemanche_initial_values(double *y0)
{
    const double vals[21] = {-81.18,  0.002908, 0.9649,    0.9775, 0.03043, 0.9992, 0.004966,
                             0.9986,  3.296e-05, 0.01869,  0.0001367, 0.9996, 0.7755, 2.35e-112,
                             1.0,     0.9992,   11.17,     0.0001013, 139.0,  1.488,  1.488};
    for (int i = 0; i < 21; ++i) y0[i] = vals[i];
}

double courtemanche_rho_f_expl() { return 7.5; }

void courtemanche_f(const double *y, double *fy, size_t n, double scale)
{
    double yj[21];
    double *out[21];
    for (int i = 0; i < 21; ++i) out[i] = fy + i * n;
    for (size_t j = 0; j < n; ++j) {
        for (int i = 0; i < 21; ++i) yj[i] = y[i * n + j];
        for (int g = 0; g < 12; ++g) {
            double tau, yinf;
            crn::GATE_FN[g](yj[0], &tau, &yinf);
            out[crn::GATE_IDX[g]][j] = (yinf - yj[crn::GATE_IDX[g]]) / tau;
        }
        crn::nonlin(yj, out, j, n, scale);
    }
}

void courtemanche_f_expl(const double *y, double *fy, size_t n, double scale)
{
    double yj[21];
    double *out[21];
    for (int i = 0; i < 21; ++i) out[i] = fy + i * n;
    for (size_t j = 0; j < n; ++j) {
        for (int i = 0; i < 21; ++i) yj[i] = y[i * n + j];
        crn::nonlin(yj, out, j, n, scale);
    }
}

void courtemanche_lmbda_exp(const double *y, double *lmbda, size_t n)
{
    for (size_t j = 0; j < n; ++j) {
        const double V = y[j];
        for (int g = 0; g < 12; ++g) {
            double tau, yinf;
            crn::GATE_FN[g](V, &tau, &yinf);
            lmbda[crn::GATE_IDX[g] * n + j] = -1.0 / tau;
        }
    }
}

void courtemanche_lmbda_yinf_exp(const double *y, double *lmbda, double *yinf, size_t n)
{
    for (size_t j = 0; j < n; ++j) {
        const double V = y[j];
        for (int g = 0; g < 12; ++g) {
            double tau, yi;
            crn::GATE_FN[g](V, &tau, &yi);
            lmbda[crn::GATE_IDX[g] * n + j] = -1.0 / tau;
            yinf[crn::GATE_IDX[g] * n + j] = yi;
        }
    }
}

}  // extern "C"

// ------------------------------------------------- ten Tusscher 2006 (epi)
// Human ventricular myocyte model (ten Tusscher & Panfilov, Am. J. Physiol.
// 291, 2006; CellML "tentusscher_panfilov_2006_epi").  Counterpart of
// reference tentusscher.h (541 LoC, pybind11).  19 states:
//   0 V, 1 Xr1, 2 Xr2, 3 Xs, 4 m, 5 h, 6 j, 7 d, 8 f, 9 f2, 10 fCass,
//   11 s, 12 r, 13 Ca_i, 14 Ca_SR, 15 Ca_ss, 16 R_prime, 17 Na_i, 18 K_i
// Gates {1..12} relax exponentially (fCass rate depends on Ca_ss, the rest
// on V only); the remainder is the explicit part.

namespace ttp {

const double Cm = 1.0, F = 96.485, R = 8.314, T = 310.0;
const double Ca_o = 2.0, K_o = 5.4, Na_o = 140.0;
const double g_Na = 14.838, g_K1 = 5.405, g_to = 0.294, g_Kr = 0.153, g_Ks = 0.392;
const double g_CaL = 0.0398, g_bna = 0.00029, g_bca = 0.000592, g_pCa = 0.1238, g_pK = 0.0146;
const double K_pCa = 0.0005, P_kna = 0.03;
const double K_NaCa = 1000.0, K_sat = 0.1, Km_Ca = 1.38, Km_Nai = 87.5, ncx_alpha = 2.5, ncx_gamma = 0.35;
const double K_mNa = 40.0, K_mk = 1.0, P_NaK = 2.724;
const double Buf_c = 0.2, Buf_sr = 10.0, Buf_ss = 0.4;
const double K_buf_c = 0.001, K_buf_sr = 0.3, K_buf_ss = 0.00025;
const double K_up = 0.00025, V_leak = 0.00036, V_rel = 0.102, V_xfer = 0.0038, Vmax_up = 0.006375;
const double k1_prime = 0.15, k2_prime = 0.045, k3 = 0.06, k4 = 0.005, max_sr = 2.5, min_sr = 1.0, EC = 1.5;
const double V_c = 16404.0, V_sr = 1094.0, V_ss = 54.68;
const double FRT = F / (R * T);

// (tau, yinf) for the 11 V-only gates ---------------------------------------
static inline void gate_xr1(double V, double *tau, double *yinf)
{
    const double a = 450.0 / (1.0 + std::exp((-45.0 - V) / 10.0));
    const double b = 6.0 / (1.0 + std::exp((V + 30.0) / 11.5));
    *tau = a * b;
    *yinf = 1.0 / (1.0 + std::exp((-26.0 - V) / 7.0));
}

static inline void gate_xr2(double V, double *tau, double *yinf)
{
    const double a = 3.0 / (1.0 + std::exp((-60.0 - V) / 20.0));
    const double b = 1.12 / (1.0 + std::exp((V - 60.0) / 20.0));
    *tau = a * b;
    *yinf = 1.0 / (1.0 + std::exp((V + 88.0) / 24.0));
}

static inline void gate_xs(double V, double *tau, double *yinf)
{
    const double a = 1400.0 / std::sqrt(1.0 + std::exp((5.0 - V) / 6.0));
    const double b = 1.0 / (1.0 + std::exp((V - 35.0) / 15.0));
    *tau = a * b + 80.0;
    *yinf = 1.0 / (1.0 + std::exp((-5.0 - V) / 14.0));
}

static inline void gate_m(double V, double *tau, double *yinf)
{
    const double a = 1.0 / (1.0 + std::exp((-60.0 - V) / 5.0));
    const double b = 0.1 / (1.0 + std::exp((V + 35.0) / 5.0)) + 0.1 / (1.0 + std::exp((V - 50.0) / 200.0));
    *tau = a * b;
    const double e = 1.0 + std::exp((-56.86 - V) / 9.03);
    *yinf = 1.0 / (e * e);
}

static inline void gate_h(double V, double *tau, double *yinf)
{
    const double a = (V < -40.0) ? 0.057 * std::exp(-(V + 80.0) / 6.8) : 0.0;
    const double b = (V < -40.0) ? 2.7 * std::exp(0.079 * V) + 310000.0 * std::exp(0.3485 * V)
                                 : 0.77 / (0.13 * (1.0 + std::exp(-(V + 10.66) / 11.1)));
    *tau = 1.0 / (a + b);
    const double e = 1.0 + std::exp((V + 71.55) / 7.43);
    *yinf = 1.0 / (e * e);
}

static inline void gate_j(double V, double *tau, double *yinf)
{
    const double a = (V < -40.0)
                         ? (-25428.0 * std::exp(0.2444 * V) - 6.948e-06 * std::exp(-0.04391 * V)) * (V + 37.78)
                               / (1.0 + std::exp(0.311 * (V + 79.23)))
                         : 0.0;
    const double b = (V < -40.0)
                         ? 0.02424 * std::exp(-0.01052 * V) / (1.0 + std::exp(-0.1378 * (V + 40.14)))
                         : 0.6 * std::exp(0.057 * V) / (1.0 + std::exp(-0.1 * (V + 32.0)));
    *tau = 1.0 / (a + b);
    const double e = 1.0 + std::exp((V + 71.55) / 7.43);
    *yinf = 1.0 / (e * e);
}

static inline void gate_d(double V, double *tau, double *yinf)
{
    const double a = 1.4 / (1.0 + std::exp((-35.0 - V) / 13.0)) + 0.25;
    const double b = 1.4 / (1.0 + std::exp((V + 5.0) / 5.0));
    const double g = 1.0 / (1.0 + std::exp((50.0 - V) / 20.0));
    *tau = a * b + g;
    *yinf = 1.0 / (1.0 + std::exp((-8.0 - V) / 7.5));
}

static inline void gate_f(double V, double *tau, double *yinf)
{
    *tau = 1102.5 * std::exp(-(V + 27.0) * (V + 27.0) / 225.0) + 200.0 / (1.0 + std::exp((13.0 - V) / 10.0))
           + 180.0 / (1.0 + std::exp((V + 30.0) / 10.0)) + 20.0;
    *yinf = 1.0 / (1.0 + std::exp((V + 20.0) / 7.0));
}

static inline void gate_f2(double V, double *tau, double *yinf)
{
    *tau = 562.0 * std::exp(-(V + 27.0) * (V + 27.0) / 240.0) + 31.0 / (1.0 + std::exp((25.0 - V) / 10.0))
           + 80.0 / (1.0 + std::exp((V + 30.0) / 10.0));
    *yinf = 0.67 / (1.0 + std::exp((V + 35.0) / 7.0)) + 0.33;
}

static inline void gate_s(double V, double *tau, double *yinf)
{
    *tau = 85.0 * std::exp(-(V + 45.0) * (V + 45.0) / 320.0) + 5.0 / (1.0 + std::exp((V - 20.0) / 5.0)) + 3.0;
    *yinf = 1.0 / (1.0 + std::exp((V + 20.0) / 5.0));
}

static inline void gate_r(double V, double *tau, double *yinf)
{
    *tau = 9.5 * std::exp(-(V + 40.0) * (V + 40.0) / 1800.0) + 0.8;
    *yinf = 1.0 / (1.0 + std::exp((20.0 - V) / 6.0));
}

// fCass: rates depend on Ca_ss, not V
static inline void gate_fCass(double Ca_ss, double *tau, double *yinf)
{
    const double q = (Ca_ss / 0.05) * (Ca_ss / 0.05);
    *tau = 80.0 / (1.0 + q) + 2.0;
    *yinf = 0.6 / (1.0 + q) + 0.4;
}

// smooth variants (TenTusscher2006_epi_smooth, reference
// tentusscher_smooth.h): the V < -40 branches of h and j are dropped so the
// RHS is C-infinity -- used for convergence tests of high-order methods.
static inline void gate_h_smooth(double V, double *tau, double *yinf)
{
    const double b = 0.77 / (0.13 * (1.0 + std::exp(-(V + 10.66) / 11.1)));
    *tau = 1.0 / b;
    const double e = 1.0 + std::exp((V + 71.55) / 7.43);
    *yinf = 1.0 / (e * e);
}

static inline void gate_j_smooth(double V, double *tau, double *yinf)
{
    const double b = 0.6 * std::exp(0.057 * V) / (1.0 + std::exp(-0.1 * (V + 32.0)));
    *tau = 1.0 / b;
    const double e = 1.0 + std::exp((V + 71.55) / 7.43);
    *yinf = 1.0 / (e * e);
}

typedef void (*gate_fn)(double, double *, double *);
static const int GATE_IDX[11] = {1, 2, 3, 4, 5, 6, 7, 8, 9, 11, 12};
static const gate_fn GATE_FN[11] = {gate_xr1, gate_xr2, gate_xs, gate_m, gate_h, gate_j,
                                    gate_d, gate_f, gate_f2, gate_s, gate_r};
static const gate_fn GATE_FN_SMOOTH[11] = {gate_xr1, gate_xr2, gate_xs, gate_m, gate_h_smooth, gate_j_smooth,
                                           gate_d, gate_f, gate_f2, gate_s, gate_r};

// nonlinear part: writes indices {0, 13, 14, 15, 16, 17, 18} ---------------
static inline void nonlin(const double *y, double **out, size_t j, double scale)
{
    const double V = y[0], Xr1 = y[1], Xr2 = y[2], Xs = y[3], m = y[4], h = y[5], jg = y[6];
    const double d = y[7], fg = y[8], f2 = y[9], fCass = y[10], s = y[11], r = y[12];
    const double Ca_i = y[13], Ca_SR = y[14], Ca_ss = y[15], Rp = y[16], Na_i = y[17], K_i = y[18];

    const double fJi = 1.0 / (1.0 + Buf_c * K_buf_c / ((Ca_i + K_buf_c) * (Ca_i + K_buf_c)));
    const double fJsr = 1.0 / (1.0 + Buf_sr * K_buf_sr / ((Ca_SR + K_buf_sr) * (Ca_SR + K_buf_sr)));
    const double fJss = 1.0 / (1.0 + Buf_ss * K_buf_ss / ((Ca_ss + K_buf_ss) * (Ca_ss + K_buf_ss)));
    const double i_leak = V_leak * (Ca_SR - Ca_i);
    const double i_up = Vmax_up / (1.0 + K_up * K_up / (Ca_i * Ca_i));
    const double i_xfer = V_xfer * (Ca_ss - Ca_i);
    const double kcasr = max_sr - (max_sr - min_sr) / (1.0 + (EC / Ca_SR) * (EC / Ca_SR));
    const double k1 = k1_prime / kcasr;
    const double k2 = k2_prime * kcasr;
    const double O = k1 * Ca_ss * Ca_ss * Rp / (k3 + k1 * Ca_ss * Ca_ss);
    out[16][j] = -k2 * Ca_ss * Rp + k4 * (1.0 - Rp);
    const double i_rel = V_rel * O * (Ca_SR - Ca_ss);
    out[14][j] = (i_up - (i_rel + i_leak)) * fJsr;

    const double E_Ca = 0.5 * std::log(Ca_o / Ca_i) / FRT;
    const double E_K = std::log(K_o / K_i) / FRT;
    const double i_NaK = P_NaK * K_o / (K_o + K_mk) * Na_i / (Na_i + K_mNa)
                         / (1.0 + 0.1245 * std::exp(-0.1 * V * FRT) + 0.0353 * std::exp(-V * FRT));
    const double i_to = g_to * r * s * (V - E_K);
    const double i_p_Ca = g_pCa * Ca_i / (Ca_i + K_pCa);
    const double e2v = std::exp(2.0 * (V - 15.0) * FRT);
    const double i_CaL = g_CaL * d * fg * f2 * fCass * 4.0 * (V - 15.0) * F * FRT
                         * (0.25 * Ca_ss * e2v - Ca_o) / (e2v - 1.0);
    const double i_b_Ca = g_bca * (V - E_Ca);
    const double aK1 = 0.1 / (1.0 + std::exp(0.06 * (V - E_K - 200.0)));
    const double bK1 = (3.0 * std::exp(0.0002 * (V - E_K + 100.0)) + std::exp(0.1 * (V - E_K - 10.0)))
                       / (1.0 + std::exp(-0.5 * (V - E_K)));
    const double i_p_K = g_pK * (V - E_K) / (1.0 + std::exp((25.0 - V) / 5.98));
    const double i_Kr = g_Kr * std::sqrt(K_o / 5.4) * Xr1 * Xr2 * (V - E_K);
    const double E_Ks = std::log((K_o + P_kna * Na_o) / (K_i + P_kna * Na_i)) / FRT;
    const double E_Na = std::log(Na_o / Na_i) / FRT;
    const double i_NaCa =
        K_NaCa
        * (std::exp(ncx_gamma * V * FRT) * Na_i * Na_i * Na_i * Ca_o
           - std::exp((ncx_gamma - 1.0) * V * FRT) * Na_o * Na_o * Na_o * Ca_i * ncx_alpha)
        / ((Km_Nai * Km_Nai * Km_Nai + Na_o * Na_o * Na_o) * (Km_Ca + Ca_o)
           * (1.0 + K_sat * std::exp((ncx_gamma - 1.0) * V * FRT)));
    const double ddt_Ca_i = -(i_b_Ca + i_p_Ca - 2.0 * i_NaCa) * Cm / (2.0 * V_c * F)
                            + (i_leak - i_up) * V_sr / V_c + i_xfer;
    const double ddt_Ca_ss = -i_CaL * Cm / (2.0 * V_ss * F) + i_rel * V_sr / V_ss - i_xfer * V_c / V_ss;
    const double i_Na = g_Na * m * m * m * h * jg * (V - E_Na);
    const double xK1_inf = aK1 / (aK1 + bK1);
    const double i_Ks = g_Ks * Xs * Xs * (V - E_Ks);
    const double i_b_Na = g_bna * (V - E_Na);
    out[13][j] = ddt_Ca_i * fJi;
    out[15][j] = ddt_Ca_ss * fJss;
    const double i_K1 = g_K1 * xK1_inf * std::sqrt(K_o / 5.4) * (V - E_K);
    out[17][j] = -(i_Na + i_b_Na + 3.0 * i_NaK + 3.0 * i_NaCa) / (V_c * F) * Cm;
    out[0][j] = scale
                * -(i_K1 + i_to + i_Kr + i_Ks + i_CaL + i_NaK + i_Na + i_b_Na + i_NaCa + i_b_Ca + i_p_K + i_p_Ca);
    out[18][j] = -(i_K1 + i_to + i_Kr + i_Ks + i_p_K - 2.0 * i_NaK) / (V_c * F) * Cm;
}

}  // namespace ttp

extern "C" {

int tentusscher_size() { return 19; }

void tentusscher_initial_values(double *y0)
{
    const double vals[19] = {-85.23, 0.00621, 0.4712, 0.0095, 0.00172, 0.7444, 0.7045,
                             3.373e-05, 0.7888, 0.9755, 0.9953, 0.999998, 2.42e-08,
                             0.000126, 3.64, 0.00036, 0.9073, 8.604, 136.89};
    for (int i = 0; i < 19; ++i) y0[i] = vals[i];
}

double tentusscher_rho_f_expl() { return 6.5; }

void tentusscher_f(const double *y, double *fy, size_t n, double scale)
{
    double yj[19];
    double *out[19];
    for (int i = 0; i < 19; ++i) out[i] = fy + i * n;
    for (size_t j = 0; j < n; ++j) {
        for (int i = 0; i < 19; ++i) yj[i] = y[i * n + j];
        for (int g = 0; g < 11; ++g) {
            double tau, yinf;
            ttp::GATE_FN[g](yj[0], &tau, &yinf);
            out[ttp::GATE_IDX[g]][j] = (yinf - yj[ttp::GATE_IDX[g]]) / tau;
        }
        double tau, yinf;
        ttp::gate_fCass(yj[15], &tau, &yinf);
        out[10][j] = (yinf - yj[10]) / tau;
        ttp::nonlin(yj, out, j, scale);
    }
}

void tentusscher_f_expl(const double *y, double *fy, size_t n, double scale)
{
    double yj[19];
    double *out[19];
    for (int i = 0; i < 19; ++i) out[i] = fy + i * n;
    for (size_t j = 0; j < n; ++j) {
        for (int i = 0; i < 19; ++i) yj[i] = y[i * n + j];
        ttp::nonlin(yj, out, j, scale);
    }
}

void tentusscher_lmbda_exp(const double *y, double *lmbda, size_t n)
{
    for (size_t j = 0; j < n; ++j) {
        const double V = y[j];
        for (int g = 0; g < 11; ++g) {
            double tau, yinf;
            ttp::GATE_FN[g](V, &tau, &yinf);
            lmbda[ttp::GATE_IDX[g] * n + j] = -1.0 / tau;
        }
        double tau, yinf;
        ttp::gate_fCass(y[15 * n + j], &tau, &yinf);
        lmbda[10 * n + j] = -1.0 / tau;
    }
}

void tentusscher_lmbda_yinf_exp(const double *y, double *lmbda, double *yinf, size_t n)
{
    for (size_t j = 0; j < n; ++j) {
        const double V = y[j];
        for (int g = 0; g < 11; ++g) {
            double tau, yi;
            ttp::GATE_FN[g](V, &tau, &yi);
            lmbda[ttp::GATE_IDX[g] * n + j] = -1.0 / tau;
            yinf[ttp::GATE_IDX[g] * n + j] = yi;
        }
        double tau, yi;
        ttp::gate_fCass(y[15 * n + j], &tau, &yi);
        lmbda[10 * n + j] = -1.0 / tau;
        yinf[10 * n + j] = yi;
    }
}


int tentusscher_smooth_size() { return 19; }

void tentusscher_smooth_initial_values(double *y0) { tentusscher_initial_values(y0); }

double tentusscher_smooth_rho_f_expl() { return 6.5; }

void tentusscher_smooth_f(const double *y, double *fy, size_t n, double scale)
{
    double yj[19];
    double *out[19];
    for (int i = 0; i < 19; ++i) out[i] = fy + i * n;
    for (size_t j = 0; j < n; ++j) {
        for (int i = 0; i < 19; ++i) yj[i] = y[i * n + j];
        for (int g = 0; g < 11; ++g) {
            double tau, yinf;
            ttp::GATE_FN_SMOOTH[g](yj[0], &tau, &yinf);
            out[ttp::GATE_IDX[g]][j] = (yinf - yj[ttp::GATE_IDX[g]]) / tau;
        }
        double tau, yinf;
        ttp::gate_fCass(yj[15], &tau, &yinf);
        out[10][j] = (yinf - yj[10]) / tau;
        ttp::nonlin(yj, out, j, scale);
    }
}

void tentusscher_smooth_f_expl(const double *y, double *fy, size_t n, double scale)
{
    tentusscher_f_expl(y, fy, n, scale);
}

void tentusscher_smooth_lmbda_exp(const double *y, double *lmbda, size_t n)
{
    for (size_t j = 0; j < n; ++j) {
        const double V = y[j];
        for (int g = 0; g < 11; ++g) {
            double tau, yinf;
            ttp::GATE_FN_SMOOTH[g](V, &tau, &yinf);
            lmbda[ttp::GATE_IDX[g] * n + j] = -1.0 / tau;
        }
        double tau, yinf;
        ttp::gate_fCass(y[15 * n + j], &tau, &yinf);
        lmbda[10 * n + j] = -1.0 / tau;
    }
}

void tentusscher_smooth_lmbda_yinf_exp(const double *y, double *lmbda, double *yinf, size_t n)
{
    for (size_t j = 0; j < n; ++j) {
        const double V = y[j];
        for (int g = 0; g < 11; ++g) {
            double tau, yi;
            ttp::GATE_FN_SMOOTH[g](V, &tau, &yi);
            lmbda[ttp::GATE_IDX[g] * n + j] = -1.0 / tau;
            yinf[ttp::GATE_IDX[g] * n + j] = yi;
        }
        double tau, yi;
        ttp::gate_fCass(y[15 * n + j], &tau, &yi);
        lmbda[10 * n + j] = -1.0 / tau;
        yinf[10 * n + j] = yi;
    }
}

}  // extern "C"
