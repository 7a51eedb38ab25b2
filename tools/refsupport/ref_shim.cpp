// extern "C" shim over the UNMODIFIED reference TUs, for ctypes bit-pin
// tests (tests/test_vs_reference.py): evaluate the reference's physics
// functions at sampled points and compare against this repo's
// re-implementations.  Built by tools/refbuild.sh into ref_shim.so.
//
// `#define private public` exposes HARMModel's geometry members (gcov_func
// / gcon_func / get_connection / get_bl_coord, harm_model.hpp:235-465) to
// this TU only — the reference sources themselves are compiled unmodified.
#define private public
#include "cuda_grmonty/harm_model.hpp"
#undef private

#include <array>
#include <string>

#include "cuda_grmonty/consts.hpp"
#include "cuda_grmonty/hotcross.hpp"
#include "cuda_grmonty/jnu_mixed.hpp"
#include "cuda_grmonty/ndarray.hpp"
#include "cuda_grmonty/radiation.hpp"
#include "cuda_grmonty/tetrads.hpp"

static harm::HARMModel *g_model = nullptr;
static ndarray::NDArray<double, 2> g_hc;
static bool g_hc_ready = false;
static std::array<double, consts::n_e_samp + 1> g_f{};
static std::array<double, consts::n_e_samp + 1> g_k2{};
static bool g_jnu_ready = false;

extern "C" {

int ref_init(const char *dump_path, double mass_unit, int photon_n) {
    if (g_model) delete g_model;
    g_model = new harm::HARMModel(photon_n, mass_unit);
    g_model->read_file(std::string(dump_path));
    return 0;
}

void ref_gcov(const double *x4, double *out16) {
    double x[consts::n_dim] = {x4[0], x4[1], x4[2], x4[3]};
    ndarray::NDArray<double, 2> g({consts::n_dim, consts::n_dim});
    g_model->gcov_func(x, g);
    for (int i = 0; i < 4; ++i)
        for (int j = 0; j < 4; ++j) out16[i * 4 + j] = g(i, j);
}

void ref_gcon(const double *x4, double *out16) {
    double x[consts::n_dim] = {x4[0], x4[1], x4[2], x4[3]};
    ndarray::NDArray<double, 2> g({consts::n_dim, consts::n_dim});
    g_model->gcon_func(x, g);
    for (int i = 0; i < 4; ++i)
        for (int j = 0; j < 4; ++j) out16[i * 4 + j] = g(i, j);
}

void ref_connection(const double *x4, double *out64) {
    double x[consts::n_dim] = {x4[0], x4[1], x4[2], x4[3]};
    double lconn[consts::n_dim][consts::n_dim][consts::n_dim];
    g_model->get_connection(x, lconn);
    for (int i = 0; i < 4; ++i)
        for (int j = 0; j < 4; ++j)
            for (int k = 0; k < 4; ++k)
                out64[(i * 4 + j) * 4 + k] = lconn[i][j][k];
}

void ref_bl_coord(const double *x4, double *r, double *th) {
    double x[consts::n_dim] = {x4[0], x4[1], x4[2], x4[3]};
    harm::BLCoord bl = g_model->get_bl_coord(x);
    *r = bl.r;
    *th = bl.theta;
}

void ref_hotcross_init(void) {
    if (g_hc_ready) return;
    g_hc = ndarray::NDArray<double, 2>(
        {consts::hotcross::n_w + 1, consts::hotcross::n_t + 1});
    hotcross::init_table(g_hc);
    g_hc_ready = true;
}

double ref_hotcross(double w, double theta_e) {
    return hotcross::total_compton_cross_lkup(w, theta_e, g_hc);
}

void ref_jnu_init(void) {
    if (g_jnu_ready) return;
    jnu_mixed::init_emiss_tables(g_f, g_k2);
    g_jnu_ready = true;
}

double ref_synch(double nu, double n_e, double theta_e, double b,
                 double theta) {
    return jnu_mixed::synch(nu, n_e, theta_e, b, theta, g_k2);
}

double ref_f_eval(double theta_e, double b_mag, double nu) {
    return jnu_mixed::f_eval(theta_e, b_mag, nu, g_f);
}

double ref_k2_eval(double theta_e) { return jnu_mixed::k2_eval(theta_e, g_k2); }

double ref_alpha_inv_scatt(double nu, double theta_e, double n_e) {
    return radiation::alpha_inv_scatt(nu, theta_e, n_e, g_hc);
}

double ref_alpha_inv_abs(double nu, double theta_e, double n_e, double b,
                         double theta) {
    return radiation::alpha_inv_abs(nu, theta_e, n_e, b, theta, g_k2);
}

double ref_fluid_nu(const double *x4, const double *k4, const double *ucov4) {
    double x[4] = {x4[0], x4[1], x4[2], x4[3]};
    double k[4] = {k4[0], k4[1], k4[2], k4[3]};
    double u[4] = {ucov4[0], ucov4[1], ucov4[2], ucov4[3]};
    return radiation::fluid_nu(x, k, u);
}

double ref_bk_angle(const double *x4, const double *k4, const double *ucov4,
                    const double *bcov4, double b, double b_unit) {
    double x[4] = {x4[0], x4[1], x4[2], x4[3]};
    double k[4] = {k4[0], k4[1], k4[2], k4[3]};
    double u[4] = {ucov4[0], ucov4[1], ucov4[2], ucov4[3]};
    double bc[4] = {bcov4[0], bcov4[1], bcov4[2], bcov4[3]};
    return radiation::bk_angle(x, k, u, bc, b, b_unit);
}

void ref_make_tetrad(const double *ucon4, const double *trial4,
                     const double *gcov16, double *econ16, double *ecov16) {
    double u[4] = {ucon4[0], ucon4[1], ucon4[2], ucon4[3]};
    double t[4] = {trial4[0], trial4[1], trial4[2], trial4[3]};
    ndarray::NDArray<double, 2> g({4, 4});
    for (int i = 0; i < 4; ++i)
        for (int j = 0; j < 4; ++j) g(i, j) = gcov16[i * 4 + j];
    double e_con[4][4], e_cov[4][4];
    tetrads::make_tetrad(u, t, g, e_con, e_cov);
    for (int i = 0; i < 4; ++i)
        for (int j = 0; j < 4; ++j) {
            econ16[i * 4 + j] = e_con[i][j];
            ecov16[i * 4 + j] = e_cov[i][j];
        }
}

}  // extern "C"
