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

int main(int argc, char **argv)
{
  std::string dir = argc > 1 ? argv[1] : ".";
  auto P = [&](const char *name) { return dir + "/" + name; };
  tsd::vue::stdo.def_dossier_sortie("/tmp/g6figs");

  CQTConfig c;
  c.fs   = 1.0f;
  c.fmin = 0.02f;
  c.fmax = 0.2f;
  c.γ    = powf(2.0f, 0.25f);
  // Q, précision_noyau at defaults (34, 0.99)

  soit n = 16384;
  soit x = sigcos(0.05f, n) + sigcos(0.12f, n) * 0.5f;
  save_f32(P("g6_cqt_x.npy"), x);

  CQT cqt;
  cqt.configure(c);
  cqt.step(x);
  soit [t, freqs, A] = cqt.interpolation(1.0f / 256);
  save_f32(P("g6_cqt_freqs.npy"), freqs);
  save_f32(P("g6_cqt_t.npy"), t);
  Vecf Af(A.rows() * A.cols());
  pour (auto i = 0; i < A.rows(); i++)
    pour (auto j = 0; j < A.cols(); j++)
      Af(i * A.cols() + j) = A(i, j);
  save_f32(P("g6_cqt_A.npy"), Af);
  Vecf dims(2);
  dims(0) = (float) A.rows();
  dims(1) = (float) A.cols();
  save_f32(P("g6_cqt_dims.npy"), dims);

  printf("golden_gen6 done\n");
  retourne 0;
}
