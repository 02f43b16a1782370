// mpn_realigner.cc — haplotype-based read realignment.
//
// Native equivalent of the reference's DeepVariant-derived ReAligner
// (reference: bin/realignment/realign/realigner.cpp:446 BuildIndex 32-mer
// fast path, :170-230 FastAlignReadsToHaplotype exact/<=2-mismatch scan,
// :351 SswAlignReadsToHaplotypes full DP fallback, :653
// CalculateReadToRefAlignment read->hap->ref CIGAR projection; scoring
// match 4 / mismatch 6 / gapO 8 / gapE 2, similarity threshold 0.16934 —
// realigner.cpp:64-74). This implementation keeps the same decision
// structure: exact/substring fast path, banded-DP fallback, best-haplotype
// choice, then CIGAR composition through the haplotype->reference alignment.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

// from mpn_banded.cc
extern "C" {
struct MpnBandedResult {
  int32_t score;
  int32_t read_begin, read_end;
  int32_t ref_begin, ref_end;
  int32_t n_match, n_mismatch, n_ins, n_del;
  int32_t cigar_len;
};
int mpn_banded_align_batch(const int8_t* reads, const int64_t* read_offsets,
                           const int8_t* refs, const int64_t* ref_offsets,
                           int32_t n_pairs, int32_t band, int32_t match,
                           int32_t mismatch, int32_t gap_open,
                           int32_t gap_ext, int32_t n_threads,
                           MpnBandedResult* results, uint32_t* cigar_out,
                           const int64_t* cigar_offsets);
}

namespace {

struct Cig {
  std::vector<std::pair<int32_t, char>> ops;

  void push(char op, int32_t n) {
    if (n <= 0) return;
    if (!ops.empty() && ops.back().second == op)
      ops.back().first += n;
    else
      ops.push_back({n, op});
  }
};

// Align a single (query, target) pair via the banded engine.
static MpnBandedResult banded_one(const int8_t* q, int32_t ql,
                                  const int8_t* t, int32_t tl, int32_t band,
                                  std::vector<uint32_t>* cigar) {
  int64_t qo[2] = {0, ql};
  int64_t to[2] = {0, tl};
  int64_t co[2] = {0, 2 * ql + 8};
  cigar->assign(co[1], 0);
  MpnBandedResult res;
  mpn_banded_align_batch(q, qo, t, to, 1, band, 4, 6, 8, 2, 1, &res,
                         cigar->data(), co);
  cigar->resize(res.cigar_len);
  return res;
}

// exact substring scan (the 32-mer index fast path's effect): find read in
// hap with 0 mismatches; returns position or -1
static int32_t find_exact(const int8_t* read, int32_t rl, const int8_t* hap,
                          int32_t hl) {
  if (rl > hl) return -1;
  for (int32_t s = 0; s + rl <= hl; ++s) {
    if (memcmp(hap + s, read, rl) == 0) return s;
  }
  return -1;
}

// <= max_mm mismatch scan anchored at every offset (FastAlign semantics)
static int32_t find_with_mismatches(const int8_t* read, int32_t rl,
                                    const int8_t* hap, int32_t hl,
                                    int32_t max_mm, int32_t* out_mm) {
  int32_t best = -1, best_mm = max_mm + 1;
  for (int32_t s = 0; s + rl <= hl; ++s) {
    int32_t mm = 0;
    for (int32_t i = 0; i < rl; ++i) {
      if (hap[s + i] != read[i] && ++mm > max_mm) break;
    }
    if (mm <= max_mm && mm < best_mm) {
      best = s;
      best_mm = mm;
      if (mm == 0) break;
    }
  }
  *out_mm = best_mm;
  return best;
}

// Compose read->hap (interval [h_lo, h_hi) matched as all-M with possible
// mismatches, or a full cigar) with hap->ref cigar into read->ref cigar.
// hap_cigar maps hap [hb..] onto ref [rb..].
struct HapRef {
  std::vector<std::pair<int32_t, char>> cigar;  // hap->ref
  int32_t hap_begin, ref_begin;
};

static bool project_interval(const HapRef& hr, int32_t h_from, int32_t h_to,
                             int32_t* ref_pos_out, Cig* out) {
  // walk hap->ref cigar; emit read->ref ops for hap interval [h_from, h_to)
  int32_t h = hr.hap_begin, r = hr.ref_begin;
  bool started = false;
  for (const auto& op : hr.cigar) {
    int32_t len = op.first;
    char c = op.second;
    if (c == 'M') {
      int32_t h2 = h + len;
      int32_t lo = std::max(h, h_from), hi = std::min(h2, h_to);
      if (lo < hi) {
        if (!started) {
          *ref_pos_out = r + (lo - h);
          started = true;
        }
        out->push('M', hi - lo);
      }
      h = h2;
      r += len;
    } else if (c == 'I') {  // hap consumes, ref doesn't
      int32_t h2 = h + len;
      int32_t lo = std::max(h, h_from), hi = std::min(h2, h_to);
      if (lo < hi) {
        if (!started) {
          *ref_pos_out = r;
          started = true;
        }
        out->push('I', hi - lo);
      }
      h = h2;
    } else {  // 'D': ref consumes, hap doesn't
      if (started && h > h_from && h < h_to) out->push('D', len);
      r += len;
    }
    if (h >= h_to) break;
  }
  return started;
}

}  // namespace

extern "C" {

struct MpnRealignResult {
  int32_t hap_index;     // chosen haplotype (-1 = unaligned)
  int32_t ref_pos;       // new 0-based position on the reference window
  int32_t score;
  int32_t cigar_len;
};

// Realign reads against candidate haplotypes, then project to the reference
// window. Mirrors realign_reads (realigner.cpp:854-859).
//   reads/haps: concatenated codes + offsets; ref: window codes.
//   results per read; CIGARs concatenated (BAM uint32 encoding) with
//   per-read slots given by cigar_offsets.
int mpn_realign_reads(const int8_t* reads, const int64_t* read_offsets,
                      int32_t n_reads, const int8_t* ref, int32_t ref_len,
                      const int8_t* haps, const int64_t* hap_offsets,
                      int32_t n_haps, int32_t band,
                      MpnRealignResult* results, uint32_t* cigar_out,
                      const int64_t* cigar_offsets) {
  // 1. align each haplotype to the reference window
  std::vector<HapRef> hap_refs(n_haps);
  for (int32_t h = 0; h < n_haps; ++h) {
    const int8_t* hap = haps + hap_offsets[h];
    int32_t hl = (int32_t)(hap_offsets[h + 1] - hap_offsets[h]);
    std::vector<uint32_t> cig;
    MpnBandedResult r = banded_one(hap, hl, ref, ref_len, band, &cig);
    hap_refs[h].hap_begin = r.read_begin;
    hap_refs[h].ref_begin = r.ref_begin;
    for (uint32_t c : cig)
      hap_refs[h].cigar.push_back(
          {(int32_t)(c >> 4), "MIDNSHP=X"[c & 0xF]});
  }

  // 2. per read: pick the best haplotype
  const double kSimilarityThreshold = 0.16934;  // realigner.cpp:74
  for (int32_t i = 0; i < n_reads; ++i) {
    const int8_t* read = reads + read_offsets[i];
    int32_t rl = (int32_t)(read_offsets[i + 1] - read_offsets[i]);
    MpnRealignResult& out = results[i];
    out.hap_index = -1;
    out.ref_pos = -1;
    out.score = 0;
    out.cigar_len = 0;
    if (rl <= 0) continue;

    int32_t best_h = -1, best_score = -1, best_pos = -1;
    std::vector<uint32_t> best_cig;
    bool best_is_fast = false;
    for (int32_t h = 0; h < n_haps; ++h) {
      const int8_t* hap = haps + hap_offsets[h];
      int32_t hl = (int32_t)(hap_offsets[h + 1] - hap_offsets[h]);
      // fast path: exact, then <=2 mismatches (realigner.cpp:170-230)
      int32_t mm = 0;
      int32_t pos = find_exact(read, rl, hap, hl);
      if (pos < 0) pos = find_with_mismatches(read, rl, hap, hl, 2, &mm);
      if (pos >= 0) {
        int32_t score = 4 * (rl - mm) - 6 * mm;
        if (score > best_score) {
          best_score = score;
          best_h = h;
          best_pos = pos;
          best_is_fast = true;
          best_cig.clear();
        }
        continue;
      }
      // DP fallback. The diagonal band must cover the unknown start offset
      // of the read within the haplotype: widen by the length difference.
      int32_t band_eff = std::max(band, 2 * (hl - rl) + 64);
      std::vector<uint32_t> cig;
      MpnBandedResult r = banded_one(read, rl, hap, hl, band_eff, &cig);
      if (r.score > best_score
          && r.score >= kSimilarityThreshold * 4.0 * rl) {
        best_score = r.score;
        best_h = h;
        best_pos = r.ref_begin;       // position on haplotype
        best_is_fast = false;
        best_cig = cig;
        // remember read span for projection
        out.ref_pos = r.read_begin;   // stash read_begin temporarily
      }
    }
    if (best_h < 0) continue;

    // 3. project read->hap onto hap->ref
    int32_t h_from, h_to;
    Cig read_hap;
    int32_t read_clip_front = 0;
    if (best_is_fast) {
      h_from = best_pos;
      h_to = best_pos + rl;
      read_hap.push('M', rl);
    } else {
      // rebuild read->hap interval from the DP cigar
      h_from = best_pos;
      h_to = best_pos;
      read_clip_front = out.ref_pos;  // stashed read_begin
      for (uint32_t c : best_cig) {
        char op = "MIDNSHP=X"[c & 0xF];
        int32_t len = (int32_t)(c >> 4);
        read_hap.push(op, len);
        if (op == 'M' || op == 'D') h_to += len;
      }
    }
    const HapRef& hr = hap_refs[best_h];
    // walk read->hap ops through hap->ref
    Cig final_cig;
    int32_t ref_pos = -1;
    int32_t h_cursor = h_from;
    bool ok = true;
    for (const auto& op : read_hap.ops) {
      if (op.second == 'M') {
        Cig seg;
        int32_t rp;
        if (project_interval(hr, h_cursor, h_cursor + op.first, &rp, &seg)) {
          if (ref_pos < 0) ref_pos = rp;
          for (auto& o : seg.ops) final_cig.push(o.second, o.first);
        } else {
          ok = false;
          break;
        }
        h_cursor += op.first;
      } else if (op.second == 'I') {
        final_cig.push('I', op.first);
      } else {  // 'D' consumes haplotype
        Cig seg;
        int32_t rp;
        if (project_interval(hr, h_cursor, h_cursor + op.first, &rp, &seg)) {
          // hap bases skipped by the read: whatever they map to on ref is
          // a deletion from the read's perspective
          for (auto& o : seg.ops)
            if (o.second != 'I') final_cig.push('D', o.first);
        }
        h_cursor += op.first;
      }
    }
    if (!ok || ref_pos < 0) {
      out.hap_index = -1;
      out.ref_pos = -1;
      continue;
    }
    out.hap_index = best_h;
    out.ref_pos = ref_pos;
    out.score = best_score;
    int64_t cap = cigar_offsets[i + 1] - cigar_offsets[i];
    int32_t n = 0;
    if (read_clip_front > 0 && n < cap)
      cigar_out[cigar_offsets[i] + n++] =
          ((uint32_t)read_clip_front << 4) | 4;  // S
    for (auto& o : final_cig.ops) {
      if (n >= cap) break;
      uint32_t code = o.second == 'M' ? 0 : o.second == 'I' ? 1 : 2;
      cigar_out[cigar_offsets[i] + n++] = ((uint32_t)o.first << 4) | code;
    }
    out.cigar_len = n;
  }
  return 0;
}

}  // extern "C"
