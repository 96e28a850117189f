// Golden-output generator #5: PSD estimators, Hilbert one-shots, the
// small streaming runtimes (moving average / DC blocker / delay line),
// DSSS spreading, the deterministic ECP impairment path, and binary
// symbol mapping — the remaining simple components without a direct
// binary diff.
//
// REFERENCE DEFECTS found while generating (verified on the source; the
// affected paths are avoided or pinned):
//  * FHSSModulation (canalisation/etalement-spectre.cc:13-66) IGNORES
//    its hop sequence entirely (config.seq is never read) and indexes
//    its oscillator vector by the slot START POSITION (ol[i] with i
//    stepping by duree_slot) — out-of-bounds UB as soon as
//    i >= seq.rows().  No FHSS golden is possible; our fhss_modulate
//    implements the documented semantics (hop_seq-driven).
//  * ECPConfig::phase_noise is dead — ECP::step never reads it
//    (ecp.cc:28-105); the "phase noise (dB/Hz)" feature does not exist
//    in the reference.  Ours implements it (models/channel.py).
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

int main(int argc, char **argv)
{
  std::string dir = argc > 1 ? argv[1] : ".";
  auto P = [&](const char *name) { return dir + "/" + name; };
  tsd::vue::stdo.def_dossier_sortie("/tmp/g5figs");

  // ---- PSD estimators (fourier.hpp:741-777, freqestim.cc:7-20)
  {
    soit n = 512;
    soit xc = sigexp(0.11f, n) + sigexp(-0.23f, n) * 0.4f
            + sigchirp(-0.4f, 0.4f, n, 'l') * 0.05f;
    soit xr = sigcos(0.13f, n) + sigsin(0.031f, n) * 0.3f;
    save_c64(P("g5_psd_xc.npy"), xc);
    save_f32(P("g5_psd_xr.npy"), xr);
    soit [f1, S1] = psd(xc);
    save_f32(P("g5_psd_c.npy"), S1);
    soit [f2, S2] = psd(xr);
    save_f32(P("g5_psd_r.npy"), S2);
    soit xw = sigexp(0.17f, 2048) + sigexp(0.05f, 2048) * 0.2f;
    save_c64(P("g5_welch_x.npy"), xw);
    soit [f3, S3] = psd_welch(xw, 128, "hn");
    save_f32(P("g5_welch.npy"), S3);
  }

  // ---- Hilbert one-shots (hilbert.cc:8-70)
  {
    soit n = 1024;
    soit xr = sigcos(0.05f, n) + 0.5f * sigsin(0.013f, n);
    save_f32(P("g5_hilb_x.npy"), xr);
    save_c64(P("g5_hilb_fir.npy"), hilbert(xr, 127));
    save_c64(P("g5_hilb_tfd.npy"), hilbert_tfd(xr));
  }

  // ---- Small streaming runtimes (filtre-rt.cc:13-46, :605-724)
  {
    soit n = 777;   // non-multiple block to exercise tails
    soit x = sigcos(0.02f, n) * 100.0f + sigsin(0.21f, n) * 10.0f + 3.0f;
    save_f32(P("g5_rt_x.npy"), x);
    soit mg = filtre_mg<float, double>(8);
    save_f32(P("g5_rt_mg.npy"), mg->step(x));
    soit dc = filtre_dc<float>(0.02f);
    save_f32(P("g5_rt_dc.npy"), dc->step(x));
    soit lr = ligne_a_retard<float>(5);
    save_f32(P("g5_rt_delay.npy"), lr->step(x));
  }

  // ---- DSSS spreading at the exact ratio-1 path (etalement-
  // spectre.cc:93-160; AdaptationRythmeArbitraire is identity at
  // ratio 1, ra.cc:160-163, so the chips multiply is exact; the
  // resampled path is covered by the resampler goldens)
  {
    soit mls = code_mls(4);   // 15 chips
    soit nb = mls.lon();
    Vecf chips(nb);
    pour (auto i = 0; i < nb; i++)
      chips(i) = mls[i] ? 1.0f : -1.0f;
    save_f32(P("g5_dsss_chips.npy"), chips);
    soit n = 15 * 20;
    soit x = sigexp(0.03f, n);
    save_c64(P("g5_dsss_x.npy"), x);
    DSSSConfig c;
    c.chips = chips;
    c.osf_in = nb;
    soit m = dsss_modulation(c);
    save_c64(P("g5_dsss_y.npy"), m->step(x));
  }

  // ---- ECP deterministic impairments (ecp.cc:27-105): Eb/N0 = 200 dB
  // makes the mandatory AWGN draw negligible (sigma ~ 1e-10); phase and
  // frequency offsets + unit delay are then directly diffable
  {
    soit n = 2048;
    soit x = sigexp(0.02f, n);
    save_c64(P("g5_ecp_x.npy"), x);
    ECPConfig c;
    c.Eb_N0 = 200.0f;
    c.décalage_phase = 0.7f;
    c.décalage_fréquence = 0.01f;
    c.fe = 1.0f;
    c.fsymb = 0.25f;
    c.fbit = 0.25f;
    c.délais_horloge = 0.0f;
    tsd::generateur_aleatoire.seed(7);
    soit e = ecp_création(c);
    save_c64(P("g5_ecp_y.npy"), e->step(x));
  }

  // ---- binary symbol mapping (telecom.cc:100-176)
  {
    soit bs = code_mls(7);    // 127 bits
    Vecf bits(bs.lon());
    pour (auto i = 0; i < bs.lon(); i++)
      bits(i) = (float) bs[i];
    save_f32(P("g5_map_bits.npy"), bits);
    pour (entier k : {1, 2, 4}) {
      BitStream bp = bs;
      // pad like symmap does internally? pin actual behavior on 127 bits
      soit idx = symmap_binaire(bp, k);
      Vecf fi(idx.rows());
      pour (auto i = 0; i < idx.rows(); i++)
        fi(i) = (float) idx(i);
      save_f32(P(("g5_map_k" + std::to_string(k) + ".npy").c_str()), fi);
      BitStream back;
      symdemap_binaire(back, idx, k);
      Vecf fb(back.lon());
      pour (auto i = 0; i < back.lon(); i++)
        fb(i) = (float) back[i];
      save_f32(P(("g5_demap_k" + std::to_string(k) + ".npy").c_str()), fb);
    }
  }

  printf("golden_gen5 done\n");
  retourne 0;
}
