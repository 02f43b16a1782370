// mpn_banded.cc — fast banded local affine-gap alignment with traceback.
//
// The pipeline's CIGAR emit path: after device-side chaining + banded scoring
// locate a candidate's diagonal, this produces begin/end/CIGAR/match counts in
// O(band * read_len) — the native counterpart of the Pallas scoring kernel
// (megapath_nano_tpu/kernels/sw.py), used only for reported alignments.
// (The full SSW-parity emulation in mpn_ssw.cc stays the oracle-exact path for
// realignment parity; this one is the throughput path.)
//
// Band geometry matches the Pallas kernel: at read row i, band slot k covers
// ref position j = i + k - band/2. Local alignment (clamp 0), affine gaps
// gapO + (L-1)*gapE, E (gap in target, consumes read) clamped at 0 like the
// scoring kernel. Traceback tie-break: diagonal > E > F.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

static const int8_t DIR_STOP = 0, DIR_DIAG = 1, DIR_E = 2, DIR_F = 3;

struct BandedResult {
  int32_t score;
  int32_t read_begin, read_end;  // inclusive
  int32_t ref_begin, ref_end;    // inclusive
  int32_t n_match, n_mismatch, n_ins, n_del;
  std::vector<uint32_t> cigar;   // BAM encoding (len<<4 | op), op 0=M 1=I 2=D
};

// per-cell flags stored as three stride-1 planes per row
// ([i][plane][k], plane 0 = h_dir, 1 = e_ext, 2 = f_ext):
// e_ext: E(i,k) extended from E(i-1,k+1); f_ext: F(i,k) from F(i,k-1).
static void banded_align(const int8_t* read, int32_t qlen, const int8_t* ref,
                         int32_t tlen, int32_t band, int32_t match,
                         int32_t mismatch, int32_t gap_open, int32_t gap_ext,
                         BandedResult* out, std::vector<int8_t>* dir_buf) {
  const int32_t half = band / 2;
  const int32_t NEG = -(1 << 29);
  std::vector<int32_t> h_prev(band + 1, 0), e_prev(band + 1, 0);
  std::vector<int32_t> h_cur(band + 1, 0), e_cur(band + 1, 0);
  // row scratch, separate arrays so -O3 autovectorizes the passes
  std::vector<int32_t> hnod(band), e_row(band), f_row(band), m_row(band);
  // padded target so ref[j] gathers are branch-free: tp[x] = ref[x - band]
  const int64_t padlen = (int64_t)std::max(tlen, qlen) + 2 * band;
  std::vector<int8_t> tpad(padlen, 5);
  memcpy(tpad.data() + band, ref, tlen);
  dir_buf->assign((size_t)qlen * band * 3, 0);

  int32_t best = 0, best_i = -1, best_k = -1;
  for (int32_t i = 0; i < qlen; ++i) {
    int8_t* dirH = dir_buf->data() + (size_t)i * band * 3;
    int8_t* dirE = dirH + band;
    int8_t* dirF = dirE + band;
    const int8_t qc = read[i];
    const int8_t* tp = tpad.data() + band + i - half;   // tp[k] = ref[j(k)]
    const int32_t* hp = h_prev.data();
    const int32_t* ep = e_prev.data();

    // pass 1 (vector): substitution, M, E, Hnod, E-provenance
    for (int32_t k = 0; k < band; ++k) {
      int8_t tc = tp[k];
      bool dead = tc == 5;
      int32_t sub = (qc >= 4 || tc >= 4) ? 0 : (qc == tc ? match : -mismatch);
      int32_t m = hp[k] + sub;
      int32_t eo = hp[k + 1] - gap_open;
      int32_t ee = ep[k + 1] - gap_ext;
      int32_t e = eo > ee ? eo : ee;
      dirE[k] = (ee >= eo) ? 1 : 0;
      int32_t hn = m > e ? m : e;
      hnod[k] = dead ? NEG : hn;
      e_row[k] = e > 0 ? e : 0;
      m_row[k] = m;
    }
    // pass 2 (cheap scalar scan): F from Hnod closed form; provenance for
    // slot k+1 is written directly at dirF[k+1] (stride-1, no shift pass)
    {
      int32_t f = NEG;
      dirF[0] = 0;
      for (int32_t k = 0; k < band; ++k) {
        f_row[k] = f;
        int32_t open = hnod[k] - gap_open;
        int32_t ext = f - gap_ext;
        if (k + 1 < band) dirF[k + 1] = (ext >= open) ? 1 : 0;
        f = ext > open ? ext : open;
      }
    }
    // pass 3 (vector): H, directions, stores
    for (int32_t k = 0; k < band; ++k) {
      int32_t hn = hnod[k];
      int32_t f = f_row[k];
      int32_t h = hn > f ? hn : f;
      h = h > 0 ? h : 0;
      bool dead = hn == NEG;
      h = dead ? 0 : h;          // no paths may end in out-of-range cells
      // branchless direction: 0 stop, 1 diag, 2 E, 3 F
      int8_t d = (h > 0)
                     ? ((h == m_row[k]) ? DIR_DIAG
                                        : ((h == hn) ? DIR_E : DIR_F))
                     : DIR_STOP;
      dirH[k] = d;
      h_cur[k] = h;
      e_cur[k] = dead ? 0 : e_row[k];
    }
    // pass 4 (vector reduction): row max, then index scan only on improvement
    int32_t row_best = 0;
    for (int32_t k = 0; k < band; ++k)
      row_best = h_cur[k] > row_best ? h_cur[k] : row_best;
    if (row_best > best) {
      best = row_best;
      best_i = i;
      for (int32_t k = 0; k < band; ++k)
        if (h_cur[k] == row_best) { best_k = k; break; }
    }
    h_cur[band] = 0;
    e_cur[band] = 0;
    std::swap(h_prev, h_cur);
    std::swap(e_prev, e_cur);
  }

  out->score = best;
  out->n_match = out->n_mismatch = out->n_ins = out->n_del = 0;
  out->cigar.clear();
  if (best <= 0) {
    out->read_begin = out->read_end = out->ref_begin = out->ref_end = -1;
    return;
  }
  int32_t i = best_i, k = best_k;
  out->read_end = best_i;
  out->ref_end = best_i + best_k - half;
  std::vector<uint32_t> rev;
  auto push_op = [&rev](uint8_t op) {
    if (!rev.empty() && (rev.back() & 0xF) == op)
      rev.back() += (1u << 4);
    else
      rev.push_back((1u << 4) | op);
  };
  bool done = false;
  while (!done && i >= 0 && k >= 0 && k < band) {
    const int8_t* dline = dir_buf->data() + (size_t)i * band * 3;
    int8_t d = dline[k];
    switch (d) {
      case DIR_DIAG: {
        int32_t j = i + k - half;
        push_op(0);
        int8_t qc = read[i], tc = (j >= 0 && j < tlen) ? ref[j] : (int8_t)4;
        if (qc < 4 && qc == tc) out->n_match++;
        else out->n_mismatch++;
        i -= 1;
        break;  // k unchanged
      }
      case DIR_E: {
        // walk the E chain: each step consumes one read base
        for (;;) {
          const int8_t* dl = dir_buf->data() + (size_t)i * band * 3;
          int8_t ext = dl[band + k];
          push_op(1);
          out->n_ins++;
          i -= 1;
          k += 1;
          if (!ext || i < 0 || k >= band) break;
        }
        break;
      }
      case DIR_F: {
        for (;;) {
          const int8_t* dl = dir_buf->data() + (size_t)i * band * 3;
          int8_t ext = dl[2 * band + k];
          push_op(2);
          out->n_del++;
          k -= 1;
          if (!ext || k < 0) break;
        }
        break;
      }
      default:
        done = true;
        break;
    }
  }
  out->read_begin = i + 1;
  out->ref_begin = (i + 1) + k - half;
  if (out->ref_begin < 0) out->ref_begin = 0;
  out->cigar.assign(rev.rbegin(), rev.rend());
}

}  // namespace

extern "C" {

struct MpnBandedResult {
  int32_t score;
  int32_t read_begin, read_end;   // inclusive
  int32_t ref_begin, ref_end;     // inclusive
  int32_t n_match, n_mismatch, n_ins, n_del;
  int32_t cigar_len;
};

// Batch banded alignment with host threads. Pairs given as flat arrays with
// offsets; results + per-pair CIGAR slots (cigar_offsets gives each pair's
// slice of cigar_out).
int mpn_banded_align_batch(const int8_t* reads, const int64_t* read_offsets,
                           const int8_t* refs, const int64_t* ref_offsets,
                           int32_t n_pairs, int32_t band, int32_t match,
                           int32_t mismatch, int32_t gap_open,
                           int32_t gap_ext, int32_t n_threads,
                           MpnBandedResult* results, uint32_t* cigar_out,
                           const int64_t* cigar_offsets) {
  if (n_threads < 1) n_threads = 1;
  std::vector<std::thread> threads;
  auto work = [&](int tid) {
    std::vector<int8_t> dir_buf;
    BandedResult r;
    for (int32_t p = tid; p < n_pairs; p += n_threads) {
      const int8_t* read = reads + read_offsets[p];
      int32_t qlen = (int32_t)(read_offsets[p + 1] - read_offsets[p]);
      const int8_t* ref = refs + ref_offsets[p];
      int32_t tlen = (int32_t)(ref_offsets[p + 1] - ref_offsets[p]);
      if (qlen <= 0 || tlen <= 0) {
        memset(&results[p], 0, sizeof(MpnBandedResult));
        continue;
      }
      banded_align(read, qlen, ref, tlen, band, match, mismatch, gap_open,
                   gap_ext, &r, &dir_buf);
      results[p].score = r.score;
      results[p].read_begin = r.read_begin;
      results[p].read_end = r.read_end;
      results[p].ref_begin = r.ref_begin;
      results[p].ref_end = r.ref_end;
      results[p].n_match = r.n_match;
      results[p].n_mismatch = r.n_mismatch;
      results[p].n_ins = r.n_ins;
      results[p].n_del = r.n_del;
      int64_t cap = cigar_offsets[p + 1] - cigar_offsets[p];
      int32_t ncopy = (int32_t)std::min<int64_t>((int64_t)r.cigar.size(), cap);
      results[p].cigar_len = ncopy;
      for (int32_t c = 0; c < ncopy; ++c)
        cigar_out[cigar_offsets[p] + c] = r.cigar[c];
    }
  };
  for (int t = 0; t < n_threads; ++t) threads.emplace_back(work, t);
  for (auto& t : threads) t.join();
  return 0;
}

}  // extern "C"
