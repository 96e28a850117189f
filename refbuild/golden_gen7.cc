// Golden-output generator #7: WAV file interoperability.  Proves the
// two libraries read/write the SAME bytes, in both directions:
//
//  * the reference WRITES float32 wavs (wav_enregistre/_stereo use
//    PCM_FLOAT, wav.cc:83-95) and a PCM-16 wav (WavEcrivain with
//    WavConfig::PCM_16, wav.cc:446-455 — note the raw (int16_t) cast:
//    the reference's float domain for 16-bit is RAW SAMPLE UNITS, it
//    never normalizes to [-1,1]); our utils/wav.py must load them.
//  * the reference READS two wavs committed in tests/golden that were
//    written by utils/wav.py (g7_ours_i16.wav int16, g7_ours_f32.wav
//    float32; see tests/test_golden_ref7.py for how they were made) and
//    dumps what wav_charge returned.
#include "tsd/tsd-all.hpp"
#include "tsd/wav.hpp"
#include <cstdio>
#include <cstdint>
#include <string>

using namespace tsd;
using namespace tsd::audio;

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

  soit n = 1024;
  // deterministic mono signal in [-1,1] (float32 wav carries it as-is)
  soit xm = sigcos(0.013f, n) * 0.9f + sigsin(0.071f, n) * 0.05f;
  wav_enregistre(P("g7_ref_mono_f32.wav"), 16000, xm);
  save_f32(P("g7_ref_mono.npy"), xm);

  // stereo float32: Veccf carries L=re, R=im interleaved (wav.cc:66-81)
  soit xl = sigcos(0.02f, n) * 0.7f;
  soit xr = sigsin(0.03f, n) * 0.6f;
  Veccf xs(n);
  pour (auto i = 0; i < n; i++)
    xs(i) = cfloat(xl(i), xr(i));
  wav_enregistre_stereo(P("g7_ref_stereo_f32.wav"), 22050, xs);
  save_f32(P("g7_ref_stereo_l.npy"), xl);
  save_f32(P("g7_ref_stereo_r.npy"), xr);

  // PCM-16: raw sample units, truncating (int16_t) cast on write
  soit x16 = sigcos(0.005f, n) * 12000.0f;
  {
    WavEcrivain we;
    WavConfig cfg;
    cfg.ncanaux  = 1;
    cfg.freq_ech = 8000;
    cfg.format   = WavConfig::PCM_16;
    we.init(P("g7_ref_mono_i16.wav"), cfg);
    we.ecris(x16);
    we.ferme();
  }
  // what those raw ints are, via the reference's own reload
  soit [x16b, fe16] = wav_charge(P("g7_ref_mono_i16.wav"));
  save_f32(P("g7_ref_mono_i16.npy"), x16b);

  // read OUR committed files and dump what the reference sees
  {
    soit [y, fe] = wav_charge(P("g7_ours_i16.wav"));
    save_f32(P("g7_ours_i16_readback.npy"), y);
    printf("ours_i16: fe=%f n=%d\n", fe, y.rows());
  }
  {
    soit [y, fe] = wav_charge(P("g7_ours_f32.wav"));
    save_f32(P("g7_ours_f32_readback.npy"), y);
    printf("ours_f32: fe=%f n=%d\n", fe, y.rows());
  }

  printf("golden_gen7 done\n");
  retourne 0;
}
