// Native batch-assembly kernels for the visdial-tpu host data loader.
//
// TPU-native replacement for the hot host-side paths of the reference's Lua
// loader (reference: dataloader.lua getTrainBatch + utils.rightAlign): the
// per-dialog Python loops in visdial_tpu/data/loader.py are the behavioral
// spec; these functions must produce byte-identical arrays (tests compare).
//
// Exposed via a plain C ABI consumed with ctypes (no pybind11 in this
// environment).  All token arrays are int32, C-contiguous, 0 = pad.
//
// Build: make -C native   (writes visdial_tpu/data/_libvisdial_native.so)

#include <cstdint>
#include <cstring>
#include <algorithm>

extern "C" {

// Move each row's tokens to the right edge: out[i, L-len:] = seq[i, :len].
// seq/out: (n, L); lens: (n,).  Equivalent of utils.rightAlign.
void vd_right_align(const int32_t* seq, const int32_t* lens, int32_t* out,
                    int64_t n, int64_t L) {
  for (int64_t i = 0; i < n; ++i) {
    const int32_t* src = seq + i * L;
    int32_t* dst = out + i * L;
    int64_t len = std::min<int64_t>(std::max<int64_t>(lens[i], 0), L);
    std::memset(dst, 0, (L - len) * sizeof(int32_t));
    std::memcpy(dst + (L - len), src, len * sizeof(int32_t));
  }
}

// LF concatenated history, right-aligned in place:
// round r of dialog b = caption + Q_0 A_0 + ... + Q_{r-1} A_{r-1}.
// cap (B, Lc), ques/ans (B, R, Lq/La) are LEFT-aligned with lengths.
// out (B, R, Lh) is written RIGHT-aligned (composition of the Python
// _hist_concat + right_align steps).  Lh must be >= Lc + (R-1)*(Lq+La).
void vd_hist_concat(const int32_t* cap, const int32_t* cap_len,
                    const int32_t* ques, const int32_t* ques_len,
                    const int32_t* ans, const int32_t* ans_len,
                    int32_t* out,
                    int64_t B, int64_t R, int64_t Lc, int64_t Lq, int64_t La,
                    int64_t Lh) {
  int32_t* buf = new int32_t[Lh];
  for (int64_t b = 0; b < B; ++b) {
    int64_t used = std::min<int64_t>(cap_len[b], Lc);
    std::memcpy(buf, cap + b * Lc, used * sizeof(int32_t));
    for (int64_t r = 0; r < R; ++r) {
      int32_t* dst = out + (b * R + r) * Lh;
      std::memset(dst, 0, (Lh - used) * sizeof(int32_t));
      std::memcpy(dst + (Lh - used), buf, used * sizeof(int32_t));
      int64_t ql = std::min<int64_t>(ques_len[b * R + r], Lq);
      int64_t al = std::min<int64_t>(ans_len[b * R + r], La);
      ql = std::min(ql, Lh - used);
      std::memcpy(buf + used, ques + (b * R + r) * Lq, ql * sizeof(int32_t));
      used += ql;
      al = std::min(al, Lh - used);
      std::memcpy(buf + used, ans + (b * R + r) * La, al * sizeof(int32_t));
      used += al;
    }
  }
  delete[] buf;
}

// Per-dialog facts, right-aligned: slot 0 = caption, slot j = Q_{j-1} A_{j-1}.
// out (B, R, Lf) right-aligned; out_len (B, R).
void vd_facts(const int32_t* cap, const int32_t* cap_len,
              const int32_t* ques, const int32_t* ques_len,
              const int32_t* ans, const int32_t* ans_len,
              int32_t* out, int32_t* out_len,
              int64_t B, int64_t R, int64_t Lc, int64_t Lq, int64_t La,
              int64_t Lf) {
  for (int64_t b = 0; b < B; ++b) {
    // slot 0: caption
    {
      int32_t* dst = out + (b * R) * Lf;
      int64_t len = std::min<int64_t>(cap_len[b], std::min(Lc, Lf));
      std::memset(dst, 0, (Lf - len) * sizeof(int32_t));
      std::memcpy(dst + (Lf - len), cap + b * Lc, len * sizeof(int32_t));
      out_len[b * R] = static_cast<int32_t>(len);
    }
    for (int64_t r = 0; r + 1 < R; ++r) {  // QA_r -> slot r+1
      int32_t* dst = out + (b * R + r + 1) * Lf;
      int64_t ql = std::min<int64_t>(ques_len[b * R + r], Lq);
      int64_t al = std::min<int64_t>(ans_len[b * R + r], La);
      int64_t len = std::min(ql + al, Lf);
      int64_t q_take = std::min(ql, len);
      int64_t a_take = len - q_take;
      std::memset(dst, 0, (Lf - len) * sizeof(int32_t));
      std::memcpy(dst + (Lf - len), ques + (b * R + r) * Lq,
                  q_take * sizeof(int32_t));
      std::memcpy(dst + (Lf - len) + q_take, ans + (b * R + r) * La,
                  a_take * sizeof(int32_t));
      out_len[b * R + r + 1] = static_cast<int32_t>(len);
    }
  }
}

// Gather candidate option rows: out[n, k, :] = opt_list[opt_inds[n, k], :].
void vd_gather_options(const int32_t* opt_list, const int32_t* opt_inds,
                       int32_t* out, int64_t n, int64_t K, int64_t M,
                       int64_t La) {
  (void)M;
  for (int64_t i = 0; i < n * K; ++i) {
    std::memcpy(out + i * La, opt_list + (int64_t)opt_inds[i] * La,
                La * sizeof(int32_t));
  }
}

}  // extern "C"
