// Golden-output generator #2: widens the reference-binary numerical diff
// beyond the five BASELINE configs to the design/estimation/detection
// layers (windows, FIR/IIR design, equiripple IRLS, Goertzel, CZT,
// xcorr, delay estimation, DWT lifting, LPC/Levinson, pattern detector,
// baseband transposition, frequency estimation).
//
// All inputs are DETERMINISTIC (generator functions or fixed literals,
// no RNG) so the committed .npy goldens are reproducible bit-for-bit.
// Compared in tests/test_golden_ref2.py.
#include "tsd/tsd-all.hpp"
#include "tsd/telecom.hpp"
#include "tsd/fourier/tod.hpp"
#include "tsd/stats.hpp"
#include <cstdio>
#include <cstdint>
#include <string>
#include <vector>
#include <complex>
#include <cstring>

using namespace tsd;
using namespace tsd::filtrage;
using namespace tsd::fourier;
using namespace tsd::telecom;

namespace tsd::stats { Vecf levinson_reel(const Vecf &r); }

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

  // ---- windows: Chebyshev synthesis + Kaiser
  save_f32(P("g2_win_cheb.npy"), fenêtre_chebychev(64, 60, oui));
  save_f32(P("g2_win_kaiser.npy"), fenêtre_kaiser1(64, 6.0f, oui));

  // ---- pulse-shaping / specialty FIR designs
  save_f32(P("g2_fir_rcs.npy"), design_rif_rcs(63, 0.25f, 0.125f));
  save_f32(P("g2_fir_cs.npy"), design_rif_cs(63, 0.25f, 0.125f));
  save_f32(P("g2_fir_gauss.npy"), design_rif_gaussien_telecom(21, 0.3f, 4));
  save_f32(P("g2_fir_hb.npy"), design_rif_demi_bande(31, 0.22f));
  save_f32(P("g2_fir_hilbert.npy"), design_rif_hilbert(63, "hn"));

  // ---- equiripple IRLS from an explicit grid (same D/W formula in the
  // python test): lowpass, pass <= 0.2, stop >= 0.25, 512-point grid
  {
    soit n = 512;
    Vecf D(n), W(n);
    pour (auto i = 0; i < n; i++) {
      float f = 0.5f * i / n;
      si (f <= 0.2f)      { D(i) = 1; W(i) = 1; }
      sinon si (f >= 0.25f) { D(i) = 0; W(i) = 10; }
      sinon               { D(i) = 1 - (f - 0.2f) / 0.05f; W(i) = 1e-3f; }
    }
    save_f32(P("g2_fir_eq.npy"), design_rif_eq(63, D, W));
  }

  // ---- IIR designs exercised through the SOS runtime on a chirp
  {
    soit n = 2048;
    soit x = sigchirp(0.01f, 0.45f, n);
    save_f32(P("g2_iir_x.npy"), x);
    struct Spec { const char *name; entier n; const char *proto;
                  float fc, rp, rs; };
    Spec specs[] = {
      {"g2_iir_butt.npy",  4, "butt",  0.12f, 1.0f, 40.0f},
      {"g2_iir_cheb1.npy", 5, "cheb1", 0.15f, 1.0f, 40.0f},
      {"g2_iir_cheb2.npy", 5, "cheb2", 0.15f, 1.0f, 40.0f},
      {"g2_iir_ellip.npy", 5, "ellip", 0.15f, 0.5f, 50.0f},
    };
    pour (auto &s : specs) {
      soit h = design_riia(s.n, "lp", s.proto, s.fc, s.rp, s.rs);
      soit f = filtre_sois<float>(h);
      soit y = f->step(x);
      save_f32(P(s.name), y);
      // expanded transfer-function coefficients (ascending powers),
      // for direct design-level diffing
      soit nc = h.numer.get_coefs(), dc = h.denom.get_coefs();
      Vecf ncr(nc.rows()), dcr(dc.rows());
      pour (auto i = 0; i < nc.rows(); i++) ncr(i) = real(nc(i));
      pour (auto i = 0; i < dc.rows(); i++) dcr(i) = real(dc(i));
      save_f32(P((std::string(s.name).substr(0, strlen(s.name) - 4)
                  + "_b.npy").c_str()), ncr);
      save_f32(P((std::string(s.name).substr(0, strlen(s.name) - 4)
                  + "_a.npy").c_str()), dcr);
    }
  }

  // ---- biquad coefficients (RBJ lowpass f=0.1, Q=1.2)
  {
    soit h = design_biquad("lp", 0.1f, 1.2f);
    save_f32(P("g2_biquad_b.npy"), h.numer.get_coefs());
    save_f32(P("g2_biquad_a.npy"), h.denom.get_coefs());
  }

  // ---- Goertzel single-bin powers
  {
    soit n = 500;
    soit x = sigcos(0.1f, n) + 0.5f * sigsin(0.17f, n);
    save_f32v(P("g2_goertzel.npy"),
              {goertzel(x, 0.1f), goertzel(x, 0.17f), goertzel(x, 0.3f)});
  }

  // ---- xcorr + fractional-delay estimation
  {
    soit n = 512;
    soit xc = sigexp(0.05f, n) * sigchirp(0.01f, 0.2f, n).as_complex();
    soit yc = délais<cfloat>(xc, 5.5f);
    soit [lags, c] = xcorr(xc, yc, 127);
    save_c64(P("g2_xcorr_x.npy"), xc);
    save_c64(P("g2_xcorr.npy"), c);
    soit [tau, score] = estimation_délais(xc, yc);
    save_f32v(P("g2_delay_est.npy"), {tau, score});
  }

  // ---- CZT along a spiral contour
  {
    soit n = 512;
    soit xc = sigexp(0.05f, n) * sigchirp(0.01f, 0.2f, n).as_complex();
    // |W| = 1: a decaying spiral (|W|<1) underflows float32 at n=512
    // (W^(-n^2/2) spans e^{+-65}) in BOTH implementations -- the
    // unit-modulus contour is the numerically meaningful case.
    cfloat W  = std::polar(1.0f, (float)(-2 * M_PI * 0.0013));
    cfloat z0 = std::polar(1.0f, 0.3f);
    // m == n only: the reference czt sizes its two convolution buffers
    // as m+n-1 and 2m-1 (fourier.cc:1373-1379) which agree only when
    // m == n -- any other m aborts on a dimension mismatch.  Our czt
    // supports arbitrary m; parity is checked at the reference's one
    // working point.
    save_c64(P("g2_czt.npy"), czt(xc, 512, W, z0));
  }

  // ---- DWT (lifting scheme, zero boundary): Haar depth 3, db2 depth 1
  {
    soit x = sigchirp(0.02f, 0.3f, 256);
    soit xh = x.clone();
    tsd::tf::tod::dwt(tsd::tf::tod::ondelette_gen<float>(
        tsd::tf::tod::lift_haar()), xh, 3);
    save_f32(P("g2_dwt_haar.npy"), xh);
    soit xd = x.clone();
    tsd::tf::tod::dwt(tsd::tf::tod::ondelette_gen<float>(
        tsd::tf::tod::lift_db2()), xd, 1);
    save_f32(P("g2_dwt_db2.npy"), xd);
    save_f32(P("g2_dwt_x.npy"), x);
  }

  // ---- LPC on a deterministic "speech-like" mixture + raw Levinson
  {
    soit n = 1024;
    soit x = sigcos(0.07f, n) + 0.6f * sigsin(0.11f, n)
             + 0.3f * sigchirp(0.02f, 0.2f, n);
    soit [a, e] = tsd::stats::lpc(x, 8);
    save_f32(P("g2_lpc_x.npy"), x);
    save_f32(P("g2_lpc_a.npy"), a);
    Vecf r(6);
    r(0) = 1.0f; r(1) = 0.5f; r(2) = 0.2f; r(3) = 0.05f;
    r(4) = -0.01f; r(5) = 0.003f;
    save_f32(P("g2_levinson.npy"), tsd::stats::levinson_reel(r));
  }

  // ---- pattern detector: known motif at a known position/gain/phase
  {
    soit M = 127;
    soit motif = sigexp(0.05f, M) * sigchirp(0.02f, 0.24f, M).as_complex();
    motif /= sqrt(abs2(motif).moyenne());  // unit RMS, as the ref tests do
    soit N = 4096;
    Veccf x(N);
    pour (auto i = 0; i < N; i++)
      x(i) = cfloat(0.01f * cos(0.34f * i), 0.01f * sin(0.47f * i));
    soit g = 0.5f * std::polar(1.0f, 0.3f);
    pour (auto i = 0; i < M; i++)
      x(1000 + i) += g * motif(i);
    std::vector<float> dets;
    DetecteurConfig dc;
    dc.Ne = 1024;
    dc.motif = motif;
    dc.seuil = 0.4f;
    entier cnt = 0;
    dc.gere_detection = [&](const Detection &det) {
      dets.push_back(det.position + cnt);
      dets.push_back(det.position_prec + cnt);
      dets.push_back(det.score);
      dets.push_back(det.gain);
      dets.push_back(det.θ);
      dets.push_back(det.SNR_dB);
    };
    soit det = détecteur_création(dc);
    // feed block by block, as a streaming caller would
    pour (auto blk = 0; blk < N / 1024; blk++) {
      Veccf xb = x.segment(blk * 1024, 1024);
      det->step(xb);
      cnt += 1024;
    }
    save_c64(P("g2_det_x.npy"), x);
    save_c64(P("g2_det_motif.npy"), motif);
    save_f32v(P("g2_det.npy"), dets);
  }

  // ---- baseband transposition (complex input, fi = 0.17)
  {
    soit n = 1024;
    soit xc = sigexp(0.21f, n) + 0.3f * sigexp(0.13f, n);
    TranspoBBConfig tc;
    tc.fi = 0.17f;
    soit t = transpo_bb<cfloat>(tc);
    soit y = t->step(xc);
    save_c64(P("g2_transpo_x.npy"), xc);
    save_c64(P("g2_transpo.npy"), y);
  }

  // ---- single-tone frequency estimation (FFT / Candan / quadratic)
  {
    soit tone = sigexp(0.12347f, 1000);
    save_f32v(P("g2_freqestim.npy"),
              {freqestim(tone, FreqEstimMethode::FFT),
               freqestim(tone, FreqEstimMethode::CANDAN2),
               freqestim(tone, FreqEstimMethode::QUADRATIC)});
  }

  // ---- real FFT (packing + orthonormal scaling on the real path)
  {
    soit x = sigchirp(0.01f, 0.4f, 1024);
    save_c64(P("g2_rfft.npy"), rfft(x));
    save_f32(P("g2_rfft_x.npy"), x);
  }

  return 0;
}
