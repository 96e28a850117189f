// Golden-output generator #6: the streaming constant-Q transform — the
// last major component without a reference-binary diff.  The reference
// CQT (cqt.cc) computes per-bin decimated correlations against
// frequency-domain truncated kernels; its public interpolation()
// resamples them to a uniform time/frequency matrix.  Our cqt_stream is
// a parity implementation with ONE documented deviation: the FFT buffer
// is 2x (static-shape N/2 hops instead of the reference's dynamic
// nb_data_attendu consumption), so kernels are truncated on a finer
// grid — magnitudes agree to the kernel-precision tolerance (~1%), not
// bit-for-bit.  Compared in tests/test_golden_ref6.py on the
// interpolated matrices.
#include "tsd/tsd-all.hpp"
#include "tsd/fourier/cqt.hpp"
#include <cstdio>
#include <cstdint>
#include <string>
#include <vector>

using namespace tsd;
using namespace tsd::fourier;
using namespace tsd::tf::cqt;

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

static void run_case(const std::string &dir, const std::string &tag,
                     const CQTConfig &c, const Vecf &x)
{
  auto P = [&](const std::string &name) { return dir + "/" + name; };
  save_f32(P(tag + "_x.npy"), x);
  CQT cqt;
  cqt.configure(c);
  cqt.step(x);
  soit [t, freqs, A] = cqt.interpolation(1.0f / 256);
  save_f32(P(tag + "_freqs.npy"), freqs);
  save_f32(P(tag + "_t.npy"), t);
  Vecf Af(A.rows() * A.cols());
  pour (auto i = 0; i < A.rows(); i++)
    pour (auto j = 0; j < A.cols(); j++)
      Af(i * A.cols() + j) = A(i, j);
  save_f32(P(tag + "_A.npy"), Af);
  Vecf dims(2);
  dims(0) = (float) A.rows();
  dims(1) = (float) A.cols();
  save_f32(P(tag + "_dims.npy"), dims);
}

int main(int argc, char **argv)
{
  std::string dir = argc > 1 ? argv[1] : ".";
  tsd::vue::stdo.def_dossier_sortie("/tmp/g6figs");

  CQTConfig c;
  c.fs   = 1.0f;
  c.fmin = 0.02f;
  c.fmax = 0.2f;
  c.γ    = powf(2.0f, 0.25f);
  // Q, précision_noyau at defaults (34, 0.99)

  soit n = 16384;

  // case 1 (original): two-tone, quarter-octave bins
  run_case(dir, "g6_cqt", c, sigcos(0.05f, n) + sigcos(0.12f, n) * 0.5f);

  // case 2: linear chirp sweeping the whole analysis band — exercises
  // EVERY bin's kernel (the 1%-tolerance two-tone only hit two)
  run_case(dir, "g6_chirp", c, sigchirp(0.01f, 0.3f, n, 'l'));

  // case 3: impulse mid-signal — time localization across the bin range
  // (each bin's response peaks where its decimated kernel overlaps it)
  {
    Vecf imp = Vecf::zeros(n);
    imp(n / 2) = 1.0f;
    run_case(dir, "g6_imp", c, imp);
  }

  // case 4: DIFFERENT bin geometry (sixth-octave, lower fmin, wider
  // span) on a three-tone signal — exercises the config-dependent
  // kernel synthesis, not just the default grid
  {
    CQTConfig c2 = c;
    c2.fmin = 0.01f;
    c2.fmax = 0.25f;
    c2.γ    = powf(2.0f, 1.0f / 6);
    run_case(dir, "g6_dense", c2,
             sigcos(0.03f, n) + sigcos(0.08f, n) * 0.7f
             + sigcos(0.2f, n) * 0.5f);
  }

  printf("golden_gen6 done\n");
  retourne 0;
}
