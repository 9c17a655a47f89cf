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
