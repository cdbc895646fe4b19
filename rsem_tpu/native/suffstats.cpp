// Native sufficient-statistics engine for the EM model-update rounds.
//
// The per-(hit, base) scatter-adds into tiny tables (profile 2500 bins,
// noise 500, fragment-length <=1000, RSPD 20) are cache-resident random
// writes -- the one op class where CPUs beat TPUs by ~50x.  This mirrors the
// reference's per-thread model-helper update/collect cycle
// (EM.cpp:177-247, SingleModel.h update, PairedEndQModel.h update) including
// the exact single-end + user-mld remarginalized RSPD update
// (SingleModel.h:178-199).
//
// Build: g++ -O3 -shared -fPIC -std=c++17 -pthread suffstats.cpp -o libsuffstats.so

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr int NCODES = 5;

struct Args {
  // hits
  int64_t n_hits;
  const int32_t* rid;
  const int32_t* sid;
  const int8_t* dir;
  const int32_t* pos;
  const int32_t* insert_len;  // null if single-end
  const float* frac;          // [H]
  // reads (mate1)
  const uint8_t* codes1;  // [N, L]
  const uint8_t* quals1;  // null if no qual
  const int32_t* lens1;
  // mate2 (paired)
  const uint8_t* codes2;
  const uint8_t* quals2;
  const int32_t* lens2;
  int64_t n_reads;
  int64_t max_len;
  const float* frac_noise;  // [N]
  // reference
  const uint8_t* ref_codes;
  const int64_t* ref_offsets;  // [M+2]
  const int32_t* tot_len;      // [M+1]
  const int32_t* full_len;     // [M+1]
  // model static config
  int has_qual;
  int paired;
  int est_rspd;
  int B;
  double probF;
  int pro_len;
  int gld_lb, gld_ub;    // fragment dist window
  int mld_lb, mld_ub;    // mate dist window (single-end user-mld mode)
  int use_mld_single;
  // distributions for the remarginalized RSPD update (single + mld)
  const double* gld_pdf;  // [gspan+1]
  const double* gld_cdf;
  const double* mld_pdf;  // [mspan+1]
  const double* mld_cdf;
  const double* rspd_pdf;  // [B+2]
  const double* rspd_cdf;
};

inline int ref_base(const Args& a, int32_t s, int64_t p, int d) {
  int64_t tl = a.tot_len[s];
  int64_t idx = d ? (a.ref_offsets[s] + tl - 1 - p) : (a.ref_offsets[s] + p);
  int c = a.ref_codes[idx];
  if (d) c = (c < 4) ? 3 - c : c;
  return c;
}

struct Acc {
  std::vector<double> pro;   // [pro_len*25]
  std::vector<double> npro;  // [500] or [5]
  std::vector<double> gld;   // [gspan]
  std::vector<double> rspd;  // [B]
  void init(const Args& a) {
    pro.assign((size_t)a.pro_len * 25, 0.0);
    npro.assign(a.has_qual ? 500 : 5, 0.0);
    gld.assign(a.gld_ub - a.gld_lb, 0.0);
    rspd.assign(a.B, 0.0);
  }
  void merge(const Acc& o) {
    for (size_t i = 0; i < pro.size(); i++) pro[i] += o.pro[i];
    for (size_t i = 0; i < npro.size(); i++) npro[i] += o.npro[i];
    for (size_t i = 0; i < gld.size(); i++) gld[i] += o.gld[i];
    for (size_t i = 0; i < rspd.size(); i++) rspd[i] += o.rspd[i];
  }
};

inline void update_profile(const Args& a, Acc& acc, const uint8_t* codes,
                           const uint8_t* quals, int len, int32_t s,
                           int64_t p, int d, double frac) {
  for (int j = 0; j < len; j++) {
    int rc = ref_base(a, s, p + j, d);
    int key = a.has_qual ? quals[j] : j;
    acc.pro[(size_t)(key * 5 + rc) * 5 + codes[j]] += frac;
  }
}

inline void rspd_update(const Args& a, Acc& acc, int64_t fpos, int64_t fl,
                        double frac) {
  // fractional-bin spreading (RSPD.h:43-59)
  if (fpos >= fl) return;
  int B = a.B;
  double lo = (double)fpos / fl;
  int i = (int)(fpos * (int64_t)B / fl) + 1;
  int last = (int)(((fpos + 1) * (int64_t)B - 1) / fl) + 1;
  double aa = lo;
  for (; i < last; i++) {
    double b = (double)i / B;
    acc.rspd[i - 1] += (b - aa) * fl * frac;
    aa = b;
  }
  double b = (double)(fpos + 1) / fl;
  acc.rspd[i - 1] += (b - aa) * fl * frac;
}

inline double gld_adj(const Args& a, int len, int64_t refL) {
  if (len <= a.gld_lb || len > a.gld_ub || refL <= a.gld_lb) return 0.0;
  int span = a.gld_ub - a.gld_lb;
  int64_t di = std::min<int64_t>(a.gld_ub, refL) - a.gld_lb;
  double denom = a.gld_cdf[di];
  if (denom < 1e-300) return 0.0;
  return a.gld_pdf[len - a.gld_lb] / denom;
}

inline double mld_adj(const Args& a, int len, int64_t refL) {
  if (len <= a.mld_lb || len > a.mld_ub || refL <= a.mld_lb) return 0.0;
  int64_t di = std::min<int64_t>(a.mld_ub, refL) - a.mld_lb;
  double denom = a.mld_cdf[di];
  if (denom < 1e-300) return 0.0;
  return a.mld_pdf[len - a.mld_lb] / denom;
}

inline double rspd_adj(const Args& a, int64_t fpos, int64_t effL, int64_t fl) {
  if (fpos < 0 || fpos >= fl || effL < 1) return 0.0;
  if (!a.est_rspd) return 1.0 / (double)effL;
  auto eval = [&](int64_t p) {
    int i = (int)(p * (int64_t)a.B / fl);
    double val = (double)p / fl * a.B;
    return a.rspd_cdf[i] + (val - i) * a.rspd_pdf[i + 1];
  };
  double denom = eval(std::min(effL, fl));
  if (denom < 1e-300) return 0.0;
  return (eval(fpos + 1) - eval(fpos)) / denom;
}

void worker(const Args& a, int64_t lo, int64_t hi, Acc& acc) {
  acc.init(a);
  const double ORIVALVE = 0.1;
  for (int64_t h = lo; h < hi; h++) {
    double f = a.frac[h];
    if (f < 1e-300) continue;
    int32_t r = a.rid[h];
    int32_t s = a.sid[h];
    int d = a.dir[h];
    int64_t p = a.pos[h];
    int64_t tl = a.tot_len[s];
    int64_t fl = a.full_len[s];
    const uint8_t* c1 = a.codes1 + (size_t)r * a.max_len;
    const uint8_t* q1 = a.has_qual ? a.quals1 + (size_t)r * a.max_len : nullptr;
    int l1 = a.lens1[r];

    if (a.paired) {
      int64_t ins = a.insert_len[h];
      acc.gld[std::min<int64_t>(std::max<int64_t>(ins - a.gld_lb - 1, 0),
                                (int64_t)acc.gld.size() - 1)] += f;
      if (a.est_rspd) {
        int64_t fpos = d ? tl - p - ins : p;
        rspd_update(a, acc, fpos, fl, f);
      }
      update_profile(a, acc, c1, q1, l1, s, p, d, f);
      const uint8_t* c2 = a.codes2 + (size_t)r * a.max_len;
      const uint8_t* q2 = a.has_qual ? a.quals2 + (size_t)r * a.max_len : nullptr;
      int l2 = a.lens2[r];
      update_profile(a, acc, c2, q2, l2, s, tl - p - ins, 1 - d, f);
    } else {
      if (a.est_rspd) {
        if (a.probF >= ORIVALVE && d == 0) {
          rspd_update(a, acc, p, fl, f);
        } else if (a.probF < ORIVALVE && d == 1) {
          if (a.use_mld_single) {
            // remarginalize over fragment lengths (SingleModel.h:178-199)
            int minL = std::max((int64_t)l1, (int64_t)a.gld_lb + 1);
            int maxL = (int)std::min<int64_t>(tl - p, a.gld_ub);
            double sum = 0.0;
            std::vector<double> fv(std::max(maxL - minL + 1, 0), 0.0);
            for (int fragLen = minL; fragLen <= maxL; fragLen++) {
              int64_t pf = tl - p - fragLen;
              int64_t effL = std::min(fl, tl - fragLen + 1);
              fv[fragLen - minL] = gld_adj(a, fragLen, tl) *
                                   rspd_adj(a, pf, effL, fl) *
                                   mld_adj(a, l1, fragLen);
              sum += fv[fragLen - minL];
            }
            if (sum >= 1e-300)
              for (int fragLen = minL; fragLen <= maxL; fragLen++)
                rspd_update(a, acc, tl - p - fragLen, fl,
                            f * (fv[fragLen - minL] / sum));
          } else {
            rspd_update(a, acc, tl - p - l1, fl, f);
          }
        }
      }
      update_profile(a, acc, c1, q1, l1, s, p, d, f);
    }
  }
}

void noise_worker(const Args& a, int64_t lo, int64_t hi, Acc& acc) {
  for (int64_t r = lo; r < hi; r++) {
    double f = a.frac_noise[r];
    if (f < 1e-300) continue;
    const uint8_t* c1 = a.codes1 + (size_t)r * a.max_len;
    int l1 = a.lens1[r];
    if (a.has_qual) {
      const uint8_t* q1 = a.quals1 + (size_t)r * a.max_len;
      for (int j = 0; j < l1; j++) acc.npro[q1[j] * 5 + c1[j]] += f;
      if (a.paired) {
        const uint8_t* c2 = a.codes2 + (size_t)r * a.max_len;
        const uint8_t* q2 = a.quals2 + (size_t)r * a.max_len;
        int l2 = a.lens2[r];
        for (int j = 0; j < l2; j++) acc.npro[q2[j] * 5 + c2[j]] += f;
      }
    } else {
      for (int j = 0; j < l1; j++) acc.npro[c1[j]] += f;
      if (a.paired) {
        const uint8_t* c2 = a.codes2 + (size_t)r * a.max_len;
        int l2 = a.lens2[r];
        for (int j = 0; j < l2; j++) acc.npro[c2[j]] += f;
      }
    }
  }
}

}  // namespace

extern "C" void suffstats(
    int64_t n_hits, const int32_t* rid, const int32_t* sid, const int8_t* dir,
    const int32_t* pos, const int32_t* insert_len, const float* frac,
    const uint8_t* codes1, const uint8_t* quals1, const int32_t* lens1,
    const uint8_t* codes2, const uint8_t* quals2, const int32_t* lens2,
    int64_t n_reads, int64_t max_len, const float* frac_noise,
    const uint8_t* ref_codes, const int64_t* ref_offsets,
    const int32_t* tot_len, const int32_t* full_len, int has_qual, int paired,
    int est_rspd, int B, double probF, int pro_len, int gld_lb, int gld_ub,
    int mld_lb, int mld_ub, int use_mld_single, const double* gld_pdf,
    const double* gld_cdf, const double* mld_pdf, const double* mld_cdf,
    const double* rspd_pdf, const double* rspd_cdf, int n_threads,
    double* out_pro, double* out_npro, double* out_gld, double* out_rspd) {
  Args a{n_hits, rid,   sid,     dir,     pos,     insert_len, frac,
         codes1, quals1, lens1,  codes2,  quals2,  lens2,      n_reads,
         max_len, frac_noise, ref_codes, ref_offsets, tot_len, full_len,
         has_qual, paired, est_rspd, B, probF, pro_len, gld_lb, gld_ub,
         mld_lb, mld_ub, use_mld_single, gld_pdf, gld_cdf, mld_pdf, mld_cdf,
         rspd_pdf, rspd_cdf};

  int nt = std::max(1, n_threads);
  std::vector<Acc> accs(nt);
  std::vector<std::thread> threads;
  int64_t per = (n_hits + nt - 1) / nt;
  for (int t = 0; t < nt; t++) {
    int64_t lo = t * per, hi = std::min<int64_t>(n_hits, lo + per);
    threads.emplace_back([&, t, lo, hi] { worker(a, lo, hi, accs[t]); });
  }
  for (auto& th : threads) th.join();
  threads.clear();
  // noise pass (over reads)
  std::vector<Acc> naccs(nt);
  int64_t perr = (n_reads + nt - 1) / nt;
  for (int t = 0; t < nt; t++) {
    int64_t lo = t * perr, hi = std::min<int64_t>(n_reads, lo + perr);
    naccs[t].init(a);
    threads.emplace_back([&, t, lo, hi] { noise_worker(a, lo, hi, naccs[t]); });
  }
  for (auto& th : threads) th.join();

  for (int t = 1; t < nt; t++) accs[0].merge(accs[t]);
  std::vector<double> npro(a.has_qual ? 500 : 5, 0.0);
  for (int t = 0; t < nt; t++)
    for (size_t i = 0; i < npro.size(); i++) npro[i] += naccs[t].npro[i];

  std::memcpy(out_pro, accs[0].pro.data(), accs[0].pro.size() * sizeof(double));
  std::memcpy(out_npro, npro.data(), npro.size() * sizeof(double));
  std::memcpy(out_gld, accs[0].gld.data(), accs[0].gld.size() * sizeof(double));
  std::memcpy(out_rspd, accs[0].rspd.data(), accs[0].rspd.size() * sizeof(double));
}
