// Golden-output generator for the five BASELINE.json configs, linked
// against the reference libtsd built in-place (see refbuild/Makefile).
// All inputs are DETERMINISTIC (generator functions, no RNG) so the
// committed .npy goldens are reproducible bit-for-bit.
//
// Outputs (1-D .npy, little-endian):
//   cfg1_h.npy, cfg1_x.npy, cfg1_y.npy      README FIR example
//   cfg2_x.npy, cfg2_X.npy, cfg2_psd.npy,
//   cfg2_welch.npy                          4096-pt FFT + periodogram
//   cfg3_x.npy, cfg3_y.npy                  48k->44.1k resampler
//   cfg4_x.npy, cfg4_y.npy                  FM quadrature discriminator
//   cfg5_bits.npy, cfg5_x.npy               QAM-16 TX (RRC 0.25, osf 4)
#include "tsd/tsd-all.hpp"
#include "tsd/telecom.hpp"
#include <cstdio>
#include <cstdint>
#include <string>
#include <vector>
#include <complex>

using namespace tsd;
using namespace tsd::filtrage;
using namespace tsd::fourier;
using namespace tsd::telecom;

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

static void save_u8(const std::string &path, const std::vector<uint8_t> &x)
{
  FILE *f = fopen(path.c_str(), "wb");
  if (!f) {
    fprintf(stderr, "cannot open %s for writing\n", path.c_str());
    exit(1);
  }
  npy_write_header(f, "|u1", x.size());
  fwrite(x.data(), 1, x.size(), f);
  fclose(f);
  printf("wrote %s (%zu u8)\n", path.c_str(), x.size());
}

int main(int argc, char **argv)
{
  std::string dir = argc > 1 ? argv[1] : ".";
  auto P = [&](const char *name) { return dir + "/" + name; };

  // ---- config 1: README example, deterministic broadband "noise"
  // (a chirp stands in for randn so the golden is reproducible)
  {
    soit h = design_rif_fen(31, "pb", 0.25, "hn");
    soit n = 500;
    soit x = sigcos(0.01f, n) + 0.1f * sigchirp(0.05f, 0.45f, n);
    soit y = filtrer(h, x);
    save_f32(P("cfg1_h.npy"), h);
    save_f32(P("cfg1_x.npy"), x);
    save_f32(P("cfg1_y.npy"), y);
  }

  // ---- config 2: 4096-pt FFT (orthonormal) + correlogram + Welch PSD
  {
    soit n = 4096;
    soit x = sigchirp(0.01f, 0.4f, n);
    soit X = fft(x);
    save_f32(P("cfg2_x.npy"), x);
    save_c64(P("cfg2_X.npy"), X);
    soit [fr, S] = psd(x);
    save_f32(P("cfg2_psd.npy"), S);
    Veccf xc(n);
    pour (auto i = 0; i < n; i++)
      xc(i) = cfloat(x(i), 0.0f);
    soit [fw, Sw] = psd_welch(xc, 512, "hn");
    save_f32(P("cfg2_welch.npy"), Sw);
  }

  // ---- config 3: 48 kHz -> 44.1 kHz arbitrary-ratio resampler
  {
    soit n = 4000;
    soit x = sigcos(0.0123f, n) + 0.5f * sigsin(0.0371f, n);
    soit f = filtre_reechan<float>(44100.0f / 48000.0f);
    soit y = f->step(x);
    save_f32(P("cfg3_x.npy"), x);
    save_f32(P("cfg3_y.npy"), y);
  }

  // ---- config 4: FM quadrature discriminator on a deterministic
  // baseband FM signal (audio = two tones, deviation 0.1 cycles/sample)
  {
    soit n = 8192;
    soit audio = 0.5f * sigcos(0.003f, n) + 0.3f * sigcos(0.001f, n);
    float dev = 0.1f;
    Veccf x(n);
    double ph = 0.0;
    pour (auto i = 0; i < n; i++) {
      ph += 2.0 * M_PI * dev * audio(i);
      x(i) = cfloat((float) cos(ph), (float) sin(ph));
    }
    soit d = discriminateur_fm();
    soit y = d->step(x);
    save_c64(P("cfg4_x.npy"), x);
    save_f32(P("cfg4_y.npy"), y);
  }

  // ---- config 5: QAM-16 TX, RRC beta=0.25, osf=4 (fe=4, fsymb=1)
  {
    soit wf = forme_onde_qam(16, SpecFiltreMiseEnForme::rcs(0.25f));
    ModConfig mc;
    mc.forme_onde = wf;
    mc.fe = 4;
    mc.fsymb = 1;
    mc.sortie_reelle = non;
    soit mod = modulateur_création(mc);
    // deterministic bits: LFSR-free simple pattern mixing all symbols
    soit nbits = 4 * 4096;
    BitStream bs;
    std::vector<uint8_t> bits;
    uint32_t lcg = 12345;
    pour (auto i = 0; i < nbits; i++) {
      lcg = lcg * 1103515245u + 12345u;
      uint8_t b = (lcg >> 16) & 1;
      bits.push_back(b);
      bs.push(b);
    }
    soit x = mod->step(bs);
    soit x2 = mod->flush(0);
    Veccf xt(x.rows() + x2.rows());
    pour (auto i = 0; i < x.rows(); i++) xt(i) = x(i);
    pour (auto i = 0; i < x2.rows(); i++) xt(x.rows() + i) = x2(i);
    save_u8(P("cfg5_bits.npy"), bits);
    save_c64(P("cfg5_x.npy"), xt);
    printf("cfg5 modulator delay: %f\n", mod->delais());
  }

  return 0;
}
