// Golden-output generator #3: widens the reference-binary numerical diff
// to the applications + telecom-support layers (Kalman/steady-state gain,
// MUSIC DOA, MLS/Barker codes, streaming Matzner SNR, CIC runtime,
// AM modulator family, Shannon capacity, quaternion/Cardan geometry,
// astronomical date/time, fractional-delay interpolator coefficients).
//
// All inputs are DETERMINISTIC (generator functions or fixed literals,
// no RNG) so the committed .npy goldens are reproducible bit-for-bit.
// Compared in tests/test_golden_ref3.py.
#include "tsd/tsd-all.hpp"
#include "tsd/telecom.hpp"
#include "tsd/apps/kalman.hpp"
#include "tsd/apps/doa.hpp"
#include "tsd/geometrie.hpp"
#include "tsd/temps.hpp"
#include <cstdio>
#include <cstdint>
#include <string>
#include <vector>
#include <complex>

using namespace tsd;
using namespace tsd::filtrage;
using namespace tsd::fourier;
using namespace tsd::telecom;
using namespace tsd::kalman;
using namespace tsd::apps::doa;
using namespace tsd::temps;

static void npy_write_header(FILE *f, const char *descr, size_t n)
{
  std::string hdr = "{'descr': '" + std::string(descr) +
                    "', 'fortran_order': False, 'shape': (" +
                    std::to_string(n) + ",), }";
  size_t total = 10 + hdr.size() + 1;
  size_t pad = (64 - total % 64) % 64;
  hdr += std::string(pad, ' ');
  hdr += '\n';
  uint16_t hlen = (uint16_t) hdr.size();
  fwrite("\x93NUMPY\x01\x00", 1, 8, f);
  fwrite(&hlen, 2, 1, f);
  fwrite(hdr.data(), 1, hdr.size(), f);
}

static void save_f32(const std::string &path, const Vecf &x)
{
  FILE *f = fopen(path.c_str(), "wb");
  if (!f) {
    fprintf(stderr, "cannot open %s for writing\n", path.c_str());
    exit(1);
  }
  npy_write_header(f, "<f4", x.rows());
  for (auto i = 0; i < x.rows(); i++) {
    float v = x(i);
    fwrite(&v, 4, 1, f);
  }
  fclose(f);
  printf("wrote %s (%d f32)\n", path.c_str(), x.rows());
}

static void save_f32v(const std::string &path, const std::vector<float> &x)
{
  FILE *f = fopen(path.c_str(), "wb");
  if (!f) {
    fprintf(stderr, "cannot open %s for writing\n", path.c_str());
    exit(1);
  }
  npy_write_header(f, "<f4", x.size());
  fwrite(x.data(), 4, x.size(), f);
  fclose(f);
  printf("wrote %s (%zu f32)\n", path.c_str(), x.size());
}

static void save_f64v(const std::string &path, const std::vector<double> &x)
{
  FILE *f = fopen(path.c_str(), "wb");
  if (!f) {
    fprintf(stderr, "cannot open %s for writing\n", path.c_str());
    exit(1);
  }
  npy_write_header(f, "<f8", x.size());
  fwrite(x.data(), 8, x.size(), f);
  fclose(f);
  printf("wrote %s (%zu f64)\n", path.c_str(), x.size());
}

static void save_c64(const std::string &path, const Veccf &x)
{
  FILE *f = fopen(path.c_str(), "wb");
  if (!f) {
    fprintf(stderr, "cannot open %s for writing\n", path.c_str());
    exit(1);
  }
  npy_write_header(f, "<c8", x.rows());
  for (auto i = 0; i < x.rows(); i++) {
    std::complex<float> v = x(i);
    fwrite(&v, 8, 1, f);
  }
  fclose(f);
  printf("wrote %s (%d c8)\n", path.c_str(), x.rows());
}

int main(int argc, char **argv)
{
  std::string dir = argc > 1 ? argv[1] : ".";
  auto P = [&](const char *name) { return dir + "/" + name; };

  // ---- MLS + Barker binary codes (telecom/prbs.cc:66, :code_Barker)
  save_f32(P("g3_mls5.npy"), code_mls(5).array());
  save_f32(P("g3_mls7.npy"), code_mls(7).array());
  save_f32(P("g3_barker11.npy"), code_Barker(11).array());
  save_f32(P("g3_barker13.npy"), code_Barker(13).array());

  // ---- Kalman filter on a deterministic scalar random-walk model
  // (kalman.cc:456 FiltreKalman, :571 modele_marche_aleatoire)
  {
    soit Q = Tabf::eye(1) * 0.01f;
    soit R = Tabf::eye(1) * 0.5f;
    soit ssm = modele_marche_aleatoire(1, Q, R);
    Vecf x0(1); x0(0) = 0;
    soit p0 = Tabf::eye(1);
    soit kf = filtre_kalman(ssm, x0, p0);
    soit n = 256;
    soit yobs = sigcos(0.01f, n) + 0.3f * sigsin(0.037f, n);
    Vecf xh(n);
    pour (auto i = 0; i < n; i++) {
      Vecf yi(1); yi(0) = yobs(i);
      soit e = kf->step(yi);
      xh(i) = e(0);
    }
    save_f32(P("g3_kalman_y.npy"), yobs);
    save_f32(P("g3_kalman_xh.npy"), xh);
    soit G = kalman_ssg(ssm);
    save_f32v(P("g3_kalman_ssg.npy"), {G(0, 0)});
  }

  // ---- MUSIC DOA: deterministic covariance + angles via musicdoa_1d
  // (apps/doa.cc:43).  REFERENCE DEFECT: sensorcov_1d (doa.cc:28) uses
  // the elementwise Tab operator* for "A * A.transpose().conjugate()",
  // which throws "dimensions incompatibles (2x8 et 8x2)" for ANY
  // non-square steering matrix (Nr != Ns) — it is untested in the
  // reference's own suite.  Build R = matprod(A, A^H) + p*I here (what
  // the formula in its comment says) and golden-diff musicdoa_1d only.
  // SECOND DEFECT: musicdoa_1d's Ns parameter is dead — it never
  // forwards it to SubSpaceSpectrumConfig.Ns (default -1 = MDL
  // auto-detection, stats.cc:148-174), so the caller cannot fix the
  // source count.  A small noise floor keeps the MDL detector at 2.
  {
    soit Nr = 8;
    Vecf pos(Nr);
    pour (auto i = 0; i < Nr; i++) pos(i) = 2 * π_f * 0.5f * i;
    Vecf angles(2); angles(0) = 1.2f; angles(1) = 2.0f;
    soit A = steervec_1d(pos, angles);
    Tabcf R = A.matprod(A.transpose().conjugate());
    pour (auto i = 0; i < Nr; i++)
      R(i, i) += 0.01f;
    Veccf Rf(Nr * Nr);
    pour (auto i = 0; i < Nr; i++)
      pour (auto j = 0; j < Nr; j++)
        Rf(i * Nr + j) = R(i, j);
    save_c64(P("g3_music_R.npy"), Rf);
    // THIRD DEFECT: with Ns = -1 the MDL criterion takes index_max of a
    // monotonically DECREASING vector (stats.cc:174 — MDL selects the
    // MINIMUM in Williams' formulation), so auto-detection always says
    // 1 source; musicdoa_1d (dead Ns, see above) is inoperative as
    // shipped.  Golden-diff the working explicit-Ns spectrum path.
    tsd::stats::SubSpaceSpectrumConfig sc;
    sc.Ns = 2; sc.Nf = 512;
    soit res = tsd::stats::subspace_spectrum(R, sc);
    save_f32(P("g3_music_spectrum.npy"), res.spectrum);
  }

  // ---- MUSIC line-spectrum composite: covmtx + subspace on a signal
  // (psd_sousesp, stats.cc:226-238)
  {
    soit n = 512;
    soit x = sigexp(0.1f, n) + 0.5f * sigexp(-0.27f, n);
    soit [fr, S] = psd_sousesp(x, 2, 512, 16);
    save_c64(P("g3_psdss_x.npy"), x);
    save_f32(P("g3_psdss.npy"), S);
  }

  // ---- Streaming Matzner SNR estimator trajectory (snr.cc:9-43)
  {
    soit n = 1000;
    soit xc = sigexp(0.05f, n) + 0.2f * sigexp(0.31f, n);
    soit est = snr_Matzner(0.1f);
    Vecf S, N;
    est->step(xc, S, N);
    save_c64(P("g3_matzner_x.npy"), xc);
    save_f32(P("g3_matzner_S.npy"), S);
    save_f32(P("g3_matzner_N.npy"), N);
  }

  // ---- CIC decimator runtime, integer accumulators (cic.cc:12-101).
  // Integer-valued input sidesteps the cast-vs-round ambiguity of
  // Eigen's as<int> (truncation) vs a rounding quantizer.
  {
    soit n = 4096;
    soit x = sigcos(0.003f, n) * 1000.0f + sigsin(0.0007f, n) * 500.0f;
    pour (auto i = 0; i < n; i++) x(i) = std::trunc(x(i));
    CICConfig cfg; cfg.R = 8; cfg.N = 3; cfg.M = 1;
    soit f = filtre_cic<float, entier>(cfg, 'd');
    soit y = f->step(x);
    save_f32(P("g3_cic_x.npy"), x);
    save_f32(P("g3_cic_y.npy"), y);
  }

  // ---- AM modulator family (analogique.cc:78-180): DSB, DSB-SC, USB
  // at fe_sortie == fe_rf (identity resampler), f_rf = 0.1 normalized
  {
    soit n = 2048;
    soit audio = sigcos(0.01f, n) + 0.4f * sigsin(0.0037f, n);
    save_f32(P("g3_am_audio.npy"), audio);
    AMConfig c;
    c.fe_sortie = 1; c.fe_rf = 1; c.f_rf = 0.1f; c.indice = 0.8f;
    c.mode = AMConfig::Mode::DSB;
    soit m1 = modulateurAM(); m1->configure(c);
    save_f32(P("g3_am_dsb.npy"), m1->step(audio));
    c.mode = AMConfig::Mode::DSB_SUPPRESSED_CARRIER;
    soit m2 = modulateurAM(); m2->configure(c);
    save_f32(P("g3_am_dsbsc.npy"), m2->step(audio));
    c.mode = AMConfig::Mode::USB;
    soit m3 = modulateurAM(); m3->configure(c);
    save_f32(P("g3_am_usb.npy"), m3->step(audio));
  }

  // ---- Shannon AWGN capacity (limits.cc:7)
  {
    std::vector<float> caps;
    pour (float snr : {0.1f, 1.0f, 10.0f, 100.0f})
      caps.push_back(capacite_canal_awgn(snr, 1.0f));
    save_f32v(P("g3_capacity.npy"), caps);
  }

  // ---- Geometry: Cardan -> quaternion -> rotation matrix -> Cardan
  // (geometrie.cc)
  {
    tsd::geo::Cardan card(0.3f, -0.5f, 1.2f);
    soit Rm = card.mat_rotation();
    Eigen::Matrix3f Re;
    pour (auto i = 0; i < 3; i++)
      pour (auto j = 0; j < 3; j++)
        Re(i, j) = Rm(i, j);
    tsd::geo::Quaternion q(Re);
    save_f32v(P("g3_quat.npy"), {q.q(0), q.q(1), q.q(2), q.q(3)});
    soit R2 = q.rot_mat();
    std::vector<float> rf;
    pour (auto i = 0; i < 3; i++)
      pour (auto j = 0; j < 3; j++)
        rf.push_back(R2(i, j));
    save_f32v(P("g3_rotmat.npy"), rf);
    tsd::geo::Cardan c2(q);
    save_f32v(P("g3_cardan_rt.npy"), {c2.φ, c2.θ, c2.ψ});
  }

  // ---- Date/time: J2000 epoch offsets + Greenwich sidereal time
  // (temps.cc:66-597)
  {
    DateHeure t1({{2021, 2, 8}, {12, 0, 0}});
    DateHeure t2({{2000, 1, 1}, {18, 30, 15}});
    save_f64v(P("g3_time.npy"),
              {t1.J2000(), t2.J2000(),
               t1.temps_sidéral_Greenwich(),
               t2.temps_sidéral_Greenwich(),
               t1.temps_sidéral_local(2.3488f)});
  }

  // ---- Fractional-delay interpolator coefficients (itrp.cc):
  // cardinal spline, linear, Lagrange-3, windowed-sinc LUT
  {
    soit ics = itrp_cspline<float>();
    soit ili = itrp_lineaire<float>();
    soit ila = itrp_lagrange<float>(3);
    soit isc = itrp_sinc<float>({15, 256, 0.5f, "hn"});
    Vecf all;
    pour (float tau : {0.25f, 0.75f}) {
      all = vconcat(all, ics->coefs(tau));
      all = vconcat(all, ili->coefs(tau));
      all = vconcat(all, ila->coefs(tau));
    }
    save_f32(P("g3_itrp.npy"), all);
    save_f32(P("g3_itrp_sinc.npy"),
             vconcat(isc->coefs(0.25f), isc->coefs(0.75f)));
  }

  retourne 0;
}
