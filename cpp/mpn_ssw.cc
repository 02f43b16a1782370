// mpn_ssw.cc — Affine-gap Smith-Waterman with bit-exact SSW-compatible results.
//
// This is the CPU-side "emit" path of the TPU-native MegaPath-Nano rebuild: the
// Pallas kernels (megapath_nano_tpu/kernels/) score millions of candidate
// (read, target) pairs on-device; this native library produces the final
// base-exact CIGARs for the winning alignments, with results identical to the
// reference's libssw (reference: bin/realignment/realign/ssw.c:733 ssw_init,
// :762 ssw_align) — including score2/ref_end2, whose values depend on striped-
// kernel artifacts (padding lanes and the lazy-F loop leak stale H values into
// the per-column maxima), so the scoring passes here are exact scalar
// emulations of the 8-bit and 16-bit striped kernels (ssw.c:123 sw_sse2_byte,
// :354 sw_sse2_word) rather than textbook DP.
//
// Build: make -C cpp  →  libmpn_native.so (ctypes: megapath_nano_tpu/native).

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>
#include <algorithm>

namespace {

struct KernelResult {
  int32_t score = 0;
  int32_t ref_end = -1;
  int32_t read_end = -1;
  bool overflow = false;
  std::vector<int32_t> max_column;  // per reference position
};

// --- 8-bit striped kernel emulation (ssw.c:123 sw_sse2_byte) ---------------
// Lane layout: 16 lanes, segLen = ceil(readLen/16); element (j, lane) holds
// read position lane*segLen + j. Arithmetic is saturating uint8 with +bias
// profile entries; padding positions carry profile value `bias` (i.e. 0 after
// bias subtraction), which lets stale H values ride the pad lanes into
// max_column — an artifact we reproduce for score2 parity.
static KernelResult sw_byte(const int8_t* read, int32_t read_len,
                            const int8_t* ref, int32_t ref_len, bool ref_dir,
                            int32_t gap_open, int32_t gap_ext,
                            const int8_t* mat, int32_t n, int32_t bias,
                            int32_t terminate_or_neg1, int32_t /*mask_len*/) {
  const int L = 16;
  const int32_t seg_len = (read_len + L - 1) / L;
  const int32_t V = seg_len * L;
  auto adds = [](int32_t a, int32_t b) { return std::min(a + b, 255); };
  auto subs = [](int32_t a, int32_t b) { return std::max(a - b, 0); };
  const uint8_t terminate = (uint8_t)terminate_or_neg1;

  // biased profile (qP_byte, ssw.c:89)
  std::vector<uint8_t> profile((size_t)n * V);
  for (int32_t nt = 0; nt < n; ++nt)
    for (int32_t j = 0; j < seg_len; ++j)
      for (int l = 0; l < L; ++l) {
        int32_t pos = l * seg_len + j;
        profile[(size_t)nt * V + j * L + l] =
            (uint8_t)(pos >= read_len ? bias
                                      : mat[nt * n + read[pos]] + bias);
      }

  std::vector<uint8_t> h_store(V, 0), h_load(V, 0), e_vec(V, 0), h_max(V, 0);
  std::vector<uint8_t> v_max_score(L, 0), v_max_mark(L, 0);
  KernelResult out;
  out.max_column.assign(ref_len, 0);
  int32_t max = 0, end_ref = -1;

  int32_t begin = ref_dir ? ref_len - 1 : 0;
  int32_t step = ref_dir ? -1 : 1;
  for (int32_t ii = 0, i = begin; ii < ref_len; ++ii, i += step) {
    uint8_t vF[16] = {0}, vMaxColumn[16] = {0}, vH[16];
    // vH = HStore[segLen-1] lane-shifted up by one (slli by 1 byte)
    vH[0] = 0;
    for (int l = 1; l < L; ++l) vH[l] = h_store[(seg_len - 1) * L + (l - 1)];
    std::swap(h_store, h_load);
    const uint8_t* vP = profile.data() + (size_t)ref[i] * V;
    for (int32_t j = 0; j < seg_len; ++j) {
      for (int l = 0; l < L; ++l) {
        int32_t h = subs(adds(vH[l], vP[j * L + l]), bias);
        int32_t e = e_vec[j * L + l];
        h = std::max(h, e);
        h = std::max(h, (int32_t)vF[l]);
        vMaxColumn[l] = (uint8_t)std::max((int32_t)vMaxColumn[l], h);
        h_store[j * L + l] = (uint8_t)h;
        int32_t t = subs(h, gap_open);
        e_vec[j * L + l] = (uint8_t)std::max(subs(e, gap_ext), t);
        vF[l] = (uint8_t)std::max(subs(vF[l], gap_ext), t);
        vH[l] = h_load[j * L + l];
      }
    }
    // Lazy-F loop (ssw.c:228-256): propagate F across lane boundaries until
    // it can no longer raise any H; E is deliberately NOT updated.
    {
      int32_t j = 0;
      for (int l = 0; l < L; ++l) vH[l] = h_store[0 * L + l];
      uint8_t fsh[16];
      fsh[0] = 0;
      for (int l = 1; l < L; ++l) fsh[l] = vF[l - 1];
      memcpy(vF, fsh, sizeof(fsh));
      auto need = [&]() {
        for (int l = 0; l < L; ++l)
          if (subs(vF[l], subs(vH[l], gap_open)) != 0) return true;
        return false;
      };
      while (need()) {
        for (int l = 0; l < L; ++l) {
          int32_t h = std::max((int32_t)vH[l], (int32_t)vF[l]);
          vMaxColumn[l] = (uint8_t)std::max((int32_t)vMaxColumn[l], h);
          h_store[j * L + l] = (uint8_t)h;
          vF[l] = (uint8_t)subs(vF[l], gap_ext);
        }
        ++j;
        if (j >= seg_len) {
          j = 0;
          fsh[0] = 0;
          for (int l = 1; l < L; ++l) fsh[l] = vF[l - 1];
          memcpy(vF, fsh, sizeof(fsh));
        }
        for (int l = 0; l < L; ++l) vH[l] = h_store[j * L + l];
      }
    }
    bool changed = false;
    for (int l = 0; l < L; ++l) {
      v_max_score[l] = std::max(v_max_score[l], vMaxColumn[l]);
      if (v_max_score[l] != v_max_mark[l]) changed = true;
    }
    if (changed) {
      memcpy(v_max_mark.data(), v_max_score.data(), L);
      int32_t temp = 0;
      for (int l = 0; l < L; ++l) temp = std::max(temp, (int32_t)v_max_score[l]);
      if (temp > max) {
        max = temp;
        if (max + bias >= 255) {
          out.overflow = true;
          break;
        }
        end_ref = i;
        h_max = h_store;
      }
    }
    int32_t colmax = 0;
    for (int l = 0; l < L; ++l) colmax = std::max(colmax, (int32_t)vMaxColumn[l]);
    out.max_column[i] = colmax;
    if ((uint8_t)colmax == terminate) break;
  }

  // read end: min read position among stored-best-column cells == max
  // (ssw.c:286-293)
  int32_t end_read = read_len - 1;
  for (int32_t fl = 0; fl < V; ++fl) {
    if (h_max[fl] == (uint8_t)max) {
      // flat order: fl = j*16 + lane → reference scan index i maps
      // pos = i/16 + i%16*segLen with i in byte order == our fl
      int32_t pos = fl / 16 + (fl % 16) * seg_len;
      if (pos < end_read) end_read = pos;
    }
  }
  out.score = (max + bias >= 255) ? 255 : max;
  out.ref_end = end_ref;
  out.read_end = end_read;
  return out;
}

// --- 16-bit striped kernel emulation (ssw.c:354 sw_sse2_word) --------------
// 8 lanes of int16; adds are signed-saturating, gap subtractions are
// unsigned-saturating (floor 0); lazy-F is the k<8 bounded variant.
static KernelResult sw_word(const int8_t* read, int32_t read_len,
                            const int8_t* ref, int32_t ref_len, bool ref_dir,
                            int32_t gap_open, int32_t gap_ext,
                            const int8_t* mat, int32_t n,
                            int32_t terminate_or_neg1) {
  const int L = 8;
  const int32_t seg_len = (read_len + L - 1) / L;
  const int32_t V = seg_len * L;
  auto adds16 = [](int32_t a, int32_t b) {
    return std::min(std::max(a + b, -32768), 32767);
  };
  auto subsu16 = [](int32_t a, int32_t b) { return std::max(a - b, 0); };
  const uint16_t terminate = (uint16_t)terminate_or_neg1;

  std::vector<int16_t> profile((size_t)n * V);
  for (int32_t nt = 0; nt < n; ++nt)
    for (int32_t j = 0; j < seg_len; ++j)
      for (int l = 0; l < L; ++l) {
        int32_t pos = l * seg_len + j;
        profile[(size_t)nt * V + j * L + l] =
            (int16_t)(pos >= read_len ? 0 : mat[nt * n + read[pos]]);
      }

  std::vector<int16_t> h_store(V, 0), h_load(V, 0), e_vec(V, 0), h_max(V, 0);
  std::vector<int16_t> v_max_score(L, 0), v_max_mark(L, 0);
  KernelResult out;
  out.max_column.assign(ref_len, 0);
  int32_t max = 0, end_ref = 0;  // note: end_ref init 0 in word kernel

  int32_t begin = ref_dir ? ref_len - 1 : 0;
  int32_t step = ref_dir ? -1 : 1;
  for (int32_t ii = 0, i = begin; ii < ref_len; ++ii, i += step) {
    int16_t vF[8] = {0}, vMaxColumn[8] = {0}, vH[8];
    vH[0] = 0;
    for (int l = 1; l < L; ++l) vH[l] = h_store[(seg_len - 1) * L + (l - 1)];
    std::swap(h_store, h_load);
    const int16_t* vP = profile.data() + (size_t)ref[i] * V;
    for (int32_t j = 0; j < seg_len; ++j) {
      for (int l = 0; l < L; ++l) {
        int32_t h = adds16(vH[l], vP[j * L + l]);
        int32_t e = e_vec[j * L + l];
        h = std::max(h, e);
        h = std::max(h, (int32_t)vF[l]);
        vMaxColumn[l] = (int16_t)std::max((int32_t)vMaxColumn[l], h);
        h_store[j * L + l] = (int16_t)h;
        int32_t t = subsu16(h, gap_open);
        e_vec[j * L + l] = (int16_t)std::max(subsu16(e, gap_ext), t);
        vF[l] = (int16_t)std::max(subsu16(vF[l], gap_ext), t);
        vH[l] = h_load[j * L + l];
      }
    }
    // Lazy-F (ssw.c:452-464): bounded k<8 passes with early exit.
    bool done = false;
    for (int k = 0; k < L && !done; ++k) {
      int16_t fsh[8];
      fsh[0] = 0;
      for (int l = 1; l < L; ++l) fsh[l] = vF[l - 1];
      memcpy(vF, fsh, sizeof(fsh));
      for (int32_t j = 0; j < seg_len; ++j) {
        bool any = false;
        for (int l = 0; l < L; ++l) {
          int32_t h = std::max((int32_t)h_store[j * L + l], (int32_t)vF[l]);
          vMaxColumn[l] = (int16_t)std::max((int32_t)vMaxColumn[l], h);
          h_store[j * L + l] = (int16_t)h;
          int32_t ht = subsu16(h, gap_open);
          vF[l] = (int16_t)subsu16(vF[l], gap_ext);
          if (vF[l] > ht) any = true;
        }
        if (!any) {
          done = true;
          break;
        }
      }
    }
    bool changed = false;
    for (int l = 0; l < L; ++l) {
      v_max_score[l] = std::max(v_max_score[l], vMaxColumn[l]);
      if (v_max_score[l] != v_max_mark[l]) changed = true;
    }
    if (changed) {
      memcpy(v_max_mark.data(), v_max_score.data(), L * sizeof(int16_t));
      int32_t temp = 0;
      for (int l = 0; l < L; ++l)
        temp = std::max(temp, (int32_t)v_max_score[l]);
      if (temp > max) {
        max = temp;
        end_ref = i;
        h_max = h_store;
      }
    }
    int32_t colmax = 0;
    for (int l = 0; l < L; ++l)
      colmax = std::max(colmax, (int32_t)vMaxColumn[l]);
    out.max_column[i] = colmax;
    if ((uint16_t)colmax == terminate) break;
  }

  int32_t end_read = read_len - 1;
  for (int32_t fl = 0; fl < V; ++fl) {
    if (h_max[fl] == (int16_t)max) {
      int32_t pos = fl / 8 + (fl % 8) * seg_len;
      if (pos < end_read) end_read = pos;
    }
  }
  out.score = max;
  out.ref_end = end_ref;
  out.read_end = end_read;
  return out;
}

// --- Banded global alignment for CIGAR (ssw.c:532 banded_sw) ---------------
// Directions: 1=diag(M), 2=E-extend(I), 3=E-open(I), 4=F-extend(D), 5=F-open(D).

static const char kOpChars[] = "MIDNSHP=X";

static uint32_t to_cigar_int(uint32_t len, char op) {
  uint32_t idx = 0;
  for (uint32_t k = 0; k < 9; ++k)
    if (kOpChars[k] == op) { idx = k; break; }
  return (len << 4) | idx;
}

struct CigarResult {
  std::vector<uint32_t> ops;  // BAM encoding: (len << 4) | op
};

static bool banded_cigar(const int8_t* ref, const int8_t* read,
                         int32_t ref_len, int32_t read_len, int32_t score,
                         int32_t gap_open, int32_t gap_ext,
                         int32_t band_width, const int8_t* mat, int32_t n,
                         CigarResult* result) {
  auto set_u = [](int32_t w, int32_t i, int32_t j) {
    int32_t x = i - w;
    x = x > 0 ? x : 0;
    return j - x + 1;
  };
  auto set_d = [](int32_t w, int32_t i, int32_t j, int32_t p) {
    int32_t x = i - w;
    x = x > 0 ? x : 0;
    return (j - x) * 3 + p;
  };

  std::vector<int32_t> h_b, e_b, h_c;
  std::vector<int8_t> direction;
  int32_t max = 0;
  do {
    int32_t width = band_width * 2 + 3;
    int32_t width_d = band_width * 2 + 1;
    h_b.assign(width + 1, 0);
    e_b.assign(width + 1, 0);
    h_c.assign(width + 1, 0);
    direction.assign(static_cast<size_t>(width_d) * read_len * 3, 0);
    max = 0;
    for (int32_t i = 0; i < read_len; ++i) {
      int32_t beg = std::max(0, i - band_width);
      int32_t end = std::min(ref_len - 1, i + band_width);
      int32_t edge = std::min(end + 1, width - 1);
      int32_t f = 0;
      h_b[0] = e_b[0] = h_b[edge] = e_b[edge] = h_c[0] = 0;
      int8_t* dir_line = direction.data() + static_cast<size_t>(width_d) * i * 3;
      int32_t u = 0;
      for (int32_t j = beg; j <= end; ++j) {
        u = set_u(band_width, i, j);
        int32_t e = set_u(band_width, i - 1, j);
        int32_t b = set_u(band_width, i, j - 1);
        int32_t d = set_u(band_width, i - 1, j - 1);
        int32_t de = set_d(band_width, i, j, 0);
        int32_t df = set_d(band_width, i, j, 1);
        int32_t dh = set_d(band_width, i, j, 2);

        int32_t t1 = (i == 0) ? -gap_open : h_b[e] - gap_open;
        int32_t t2 = (i == 0) ? -gap_ext : e_b[e] - gap_ext;
        e_b[u] = t1 > t2 ? t1 : t2;
        dir_line[de] = t1 > t2 ? 3 : 2;

        t1 = h_c[b] - gap_open;
        t2 = f - gap_ext;
        f = t1 > t2 ? t1 : t2;
        dir_line[df] = t1 > t2 ? 5 : 4;

        int32_t e1 = e_b[u] > 0 ? e_b[u] : 0;
        int32_t f1 = f > 0 ? f : 0;
        t1 = e1 > f1 ? e1 : f1;
        t2 = h_b[d] + mat[static_cast<int32_t>(ref[j]) * n + read[i]];
        h_c[u] = t1 > t2 ? t1 : t2;
        if (h_c[u] > max) max = h_c[u];
        if (t1 <= t2) dir_line[dh] = 1;
        else dir_line[dh] = e1 > f1 ? dir_line[de] : dir_line[df];
      }
      for (int32_t j = 1; j <= u; ++j) h_b[j] = h_c[j];
    }
    band_width *= 2;
  } while (max < score);
  band_width /= 2;

  // Traceback (ssw.c:621-697): walk from (read_len-1, ref_len-1) until i==0.
  int32_t width_d = band_width * 2 + 1;
  int32_t i = read_len - 1, j = ref_len - 1;
  int32_t e_count = 0;
  char op = 'M', prev_op = 'M';
  int32_t state = 2;  // 0=E, 1=F, 2=H
  std::vector<uint32_t> c;
  const int8_t* dir_line =
      direction.data() + static_cast<size_t>(width_d) * i * 3;
  while (i > 0) {
    int32_t idx = set_d(band_width, i, j, state);
    switch (dir_line[idx]) {
      case 1: --i; --j; state = 2; dir_line -= width_d * 3; op = 'M'; break;
      case 2: --i; state = 0; dir_line -= width_d * 3; op = 'I'; break;
      case 3: --i; state = 2; dir_line -= width_d * 3; op = 'I'; break;
      case 4: --j; state = 1; op = 'D'; break;
      case 5: --j; state = 2; op = 'D'; break;
      default: return false;
    }
    if (op == prev_op) ++e_count;
    else {
      c.push_back(to_cigar_int(e_count, prev_op));
      prev_op = op;
      e_count = 1;
    }
  }
  if (op == 'M') {
    c.push_back(to_cigar_int(e_count + 1, op));
  } else {
    c.push_back(to_cigar_int(e_count, op));
    c.push_back(to_cigar_int(1, 'M'));
  }
  result->ops.assign(c.rbegin(), c.rend());
  return true;
}

static int32_t matrix_bias(const int8_t* mat, int32_t n) {
  int32_t bias = 0;
  for (int32_t i = 0; i < n * n; ++i)
    if (mat[i] < bias) bias = mat[i];
  return -bias;
}

}  // namespace

extern "C" {

// Result layout shared with the Python ctypes binding.
struct MpnAlignResult {
  int32_t score1;
  int32_t score2;
  int32_t ref_begin1;
  int32_t ref_end1;
  int32_t read_begin1;
  int32_t read_end1;
  int32_t ref_end2;
  int32_t cigar_len;  // number of uint32 ops written to cigar_out
};

// Affine-gap local alignment with SSW-identical observable results
// (equivalent to ssw_init(score_size=2) + ssw_align(flag=2, filters=0)).
//   read/ref: numeric sequences (values in [0, n)), mat: n*n scoring matrix.
//   flag: 0 = scores/ends only; nonzero = also begins + CIGAR.
//   cigar_out: caller buffer of cigar_cap uint32's.
// Returns 0 on success.
int mpn_ssw_align(const int8_t* read, int32_t read_len, const int8_t* ref,
                  int32_t ref_len, const int8_t* mat, int32_t n,
                  int32_t gap_open, int32_t gap_ext, int32_t mask_len,
                  int32_t flag, MpnAlignResult* result, uint32_t* cigar_out,
                  int32_t cigar_cap) {
  memset(result, 0, sizeof(*result));
  result->ref_begin1 = -1;
  result->read_begin1 = -1;
  result->ref_end2 = -1;
  if (read_len <= 0 || ref_len <= 0) return 1;
  int32_t bias = matrix_bias(mat, n);

  bool word = false;
  KernelResult fwd = sw_byte(read, read_len, ref, ref_len, false, gap_open,
                             gap_ext, mat, n, bias, -1, mask_len);
  if (fwd.score == 255) {
    fwd = sw_word(read, read_len, ref, ref_len, false, gap_open, gap_ext, mat,
                  n, -1);
    word = true;
  }
  result->score1 = fwd.score;
  result->ref_end1 = fwd.ref_end;
  result->read_end1 = fwd.read_end;

  // score2: best column max outside the masked window around ref_end1.
  // Loop bounds differ between the byte kernel (second loop from edge+1,
  // ssw.c:317-322) and the word kernel (from edge, ssw.c:514-519).
  if (mask_len >= 15 && fwd.ref_end >= 0) {
    int32_t s2 = 0, r2 = 0;
    int32_t edge = std::max(0, fwd.ref_end - mask_len);
    for (int32_t j = 0; j < edge; ++j)
      if (fwd.max_column[j] > s2) { s2 = fwd.max_column[j]; r2 = j; }
    edge = std::min(ref_len, fwd.ref_end + mask_len);
    for (int32_t j = word ? edge : edge + 1; j < ref_len; ++j)
      if (fwd.max_column[j] > s2) { s2 = fwd.max_column[j]; r2 = j; }
    result->score2 = s2;
    result->ref_end2 = r2;
  }

  if (flag == 0 || fwd.score <= 0) return 0;

  // Begin positions: reversed read prefix vs reference scanned backward from
  // ref_end1, terminating at score1 (ssw.c:818-831).
  int32_t rl = result->read_end1 + 1;
  std::vector<int8_t> read_rev(rl);
  for (int32_t i = 0; i < rl; ++i) read_rev[i] = read[result->read_end1 - i];
  KernelResult rev =
      word ? sw_word(read_rev.data(), rl, ref, result->ref_end1 + 1, true,
                     gap_open, gap_ext, mat, n, fwd.score)
           : sw_byte(read_rev.data(), rl, ref, result->ref_end1 + 1, true,
                     gap_open, gap_ext, mat, n, bias, fwd.score, mask_len);
  result->ref_begin1 = rev.ref_end;
  result->read_begin1 = result->read_end1 - rev.read_end;

  // CIGAR via banded global alignment between begin/end (ssw.c:836-841).
  int32_t seg_ref_len = result->ref_end1 - result->ref_begin1 + 1;
  int32_t seg_read_len = result->read_end1 - result->read_begin1 + 1;
  int32_t band_width = std::abs(seg_ref_len - seg_read_len) + 1;
  CigarResult cig;
  if (!banded_cigar(ref + result->ref_begin1, read + result->read_begin1,
                    seg_ref_len, seg_read_len, fwd.score, gap_open, gap_ext,
                    band_width, mat, n, &cig)) {
    return 2;
  }
  result->cigar_len = static_cast<int32_t>(cig.ops.size());
  int32_t ncopy = std::min<int32_t>(result->cigar_len, cigar_cap);
  for (int32_t k = 0; k < ncopy; ++k) cigar_out[k] = cig.ops[k];
  return 0;
}

// Batch interface: align many (read, ref) pairs stored in flat arrays.
// Offsets arrays have n_pairs+1 entries. CIGARs are concatenated into
// cigar_out with per-pair lengths in results[i].cigar_len.
int mpn_ssw_align_batch(const int8_t* reads, const int64_t* read_offsets,
                        const int8_t* refs, const int64_t* ref_offsets,
                        int32_t n_pairs, const int8_t* mat, int32_t n,
                        int32_t gap_open, int32_t gap_ext, int32_t mask_len,
                        int32_t flag, MpnAlignResult* results,
                        uint32_t* cigar_out, int64_t cigar_cap) {
  int64_t cig_pos = 0;
  for (int32_t p = 0; p < n_pairs; ++p) {
    const int8_t* read = reads + read_offsets[p];
    int32_t read_len = static_cast<int32_t>(read_offsets[p + 1] - read_offsets[p]);
    const int8_t* ref = refs + ref_offsets[p];
    int32_t ref_len = static_cast<int32_t>(ref_offsets[p + 1] - ref_offsets[p]);
    int32_t cap = static_cast<int32_t>(cigar_cap - cig_pos);
    int rc = mpn_ssw_align(read, read_len, ref, ref_len, mat, n, gap_open,
                           gap_ext, mask_len, flag, &results[p],
                           cigar_out + cig_pos, cap);
    if (rc != 0) results[p].cigar_len = 0;
    cig_pos += results[p].cigar_len;
  }
  return 0;
}

}  // extern "C"
