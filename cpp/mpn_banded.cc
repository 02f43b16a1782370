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
//
// Performance notes (host emit is on the critical path with a 2-vCPU host):
// - int16 score lanes when qlen*match fits (2x SIMD width vs int32), int32
//   fallback for long reads; all row passes are branchless and autovectorize.
// - The F recurrence (serial within a row in the naive form) is computed by
//   closed form: F_used[k] = max_{k'<k}(Hnod[k'] - go - (k-1-k')*ge)
//                          = Pex[k] - go - (k-1)*ge,
//   where Pex[k] = exclusive prefix max of g[k'] = Hnod[k'] + k'*ge. The
//   prefix max runs as log2(band) vectorizable sweeps. The F-extension
//   provenance bit reduces to f_ext[k+1] = (Pex[k] >= g[k]).
// - Direction state packs into ONE byte per cell (2-bit H dir + E/F extension
//   bits); the buffer is fully overwritten so it is never zeroed.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

static const uint8_t DIR_STOP = 0, DIR_DIAG = 1, DIR_E = 2, DIR_F = 3;
static const uint8_t EXT_E = 4, EXT_F = 8;

struct BandedResult {
  int32_t score;
  int32_t read_begin, read_end;  // inclusive
  int32_t ref_begin, ref_end;    // inclusive
  int32_t n_match, n_mismatch, n_ins, n_del;
  std::vector<uint32_t> cigar;   // BAM encoding (len<<4 | op), op 0=M 1=I 2=D
};

template <typename T>
struct Scratch {
  std::vector<T> h_prev, e_prev, h_cur, e_cur;   // band + 1
  std::vector<T> hnod, m_row, f_row;             // band
  std::vector<uint8_t> ebit, fbit;               // band
  void ensure(int32_t band, int32_t, int32_t) {
    if ((int32_t)hnod.size() == band) return;
    h_prev.assign(band + 1, 0);
    e_prev.assign(band + 1, 0);
    h_cur.assign(band + 1, 0);
    e_cur.assign(band + 1, 0);
    hnod.resize(band);
    m_row.resize(band);
    f_row.resize(band);
    ebit.resize(band);
    fbit.resize(band);
  }
  void reset_rows(int32_t band) {
    std::fill(h_prev.begin(), h_prev.end(), (T)0);
    std::fill(e_prev.begin(), e_prev.end(), (T)0);
  }
};

// Row passes live in standalone functions with __restrict__ params so the
// autovectorizer needs no runtime alias checks (gcc caps those at 10 pointers).
template <typename T>
static void row_pass1(const int8_t* __restrict tp, int8_t qc,
                      const T* __restrict hp, const T* __restrict ep,
                      T* __restrict ec, T* __restrict hnod,
                      T* __restrict m_row, uint8_t* __restrict ebit,
                      int32_t band, T MATCH, T MISM, T GO, T GE, T NEG) {
  for (int32_t k = 0; k < band; ++k) {
    int8_t tc = tp[k];
    T sub = (qc >= 4 || tc >= 4) ? (T)0 : (qc == tc ? MATCH : (T)-MISM);
    T m = (T)(hp[k] + sub);
    T eo = (T)(hp[k + 1] - GO);
    T ee = (T)(ep[k + 1] - GE);
    T e = eo > ee ? eo : ee;
    ebit[k] = (ee >= eo) ? EXT_E : 0;
    T hn = m > e ? m : e;
    hn = (tc == 5) ? NEG : hn;
    hnod[k] = hn;
    ec[k] = (tc == 5 || e < 0) ? (T)0 : e;
    m_row[k] = m;
  }
}

// pass 2: the F recurrence — serial (loop-carried max chain, ~2 cycles/slot)
// but cheap at real band sizes; writes F values and extension bits.
template <typename T>
static void row_pass2(const T* __restrict hnod, T* __restrict f_row,
                      uint8_t* __restrict fbit, int32_t band, T GO, T GE,
                      T NEG) {
  T f = NEG;
  fbit[0] = 0;
  for (int32_t k = 0; k < band; ++k) {
    f_row[k] = f;
    T open = (T)(hnod[k] - GO);
    T ext = (T)(f - GE);
    if (k + 1 < band) fbit[k + 1] = (ext >= open) ? EXT_F : 0;
    f = ext > open ? ext : open;
  }
}

template <typename T>
static T row_pass3(const T* __restrict f_row, const T* __restrict hnod,
                   const T* __restrict m_row, const uint8_t* __restrict ebit,
                   const uint8_t* __restrict fbit, T* __restrict hc,
                   T* __restrict ec, uint8_t* __restrict dir, int32_t band,
                   T NEG) {
  T row_best = 0;
  for (int32_t k = 0; k < band; ++k) {
    T f = f_row[k];
    T hn = hnod[k];
    T h = hn > f ? hn : f;
    h = h > 0 ? h : (T)0;
    bool dead = hn == NEG;
    h = dead ? (T)0 : h;
    uint8_t d = (h > 0) ? ((h == m_row[k]) ? DIR_DIAG
                                           : ((h == hn) ? DIR_E : DIR_F))
                        : DIR_STOP;
    dir[k] = d | ebit[k] | fbit[k];
    hc[k] = h;
    ec[k] = dead ? (T)0 : ec[k];
    row_best = h > row_best ? h : row_best;
  }
  return row_best;
}

template <typename T>
static void banded_align_t(const int8_t* read, int32_t qlen, const int8_t* ref,
                           int32_t tlen, int32_t band, int32_t match,
                           int32_t mismatch, int32_t gap_open, int32_t gap_ext,
                           BandedResult* out, std::vector<uint8_t>* dir_buf,
                           Scratch<T>* scr) {
  const int32_t half = band / 2;
  const T NEG = (T)(sizeof(T) == 2 ? -8000 : -(1 << 29));
  scr->ensure(band, gap_open, gap_ext);
  scr->reset_rows(band);
  T* hp = scr->h_prev.data();
  T* ep = scr->e_prev.data();
  T* hc = scr->h_cur.data();
  T* ec = scr->e_cur.data();
  T* hnod = scr->hnod.data();
  T* m_row = scr->m_row.data();
  T* sa = scr->f_row.data();
  uint8_t* ebit = scr->ebit.data();
  uint8_t* fbit = scr->fbit.data();

  // rows beyond tlen + half are entirely out of band range (all dead)
  const int32_t qeff = std::min(qlen, tlen + half);
  // padded target so ref[j] gathers are branch-free: tp[x] = ref[x - band]
  const int64_t padlen = (int64_t)std::max(tlen, qlen) + 2 * band;
  std::vector<int8_t> tpad(padlen, 5);
  memcpy(tpad.data() + band, ref, tlen);
  if ((int64_t)dir_buf->size() < (int64_t)qeff * band)
    dir_buf->resize((int64_t)qeff * band);  // fully overwritten, never zeroed

  const T MATCH = (T)match, MISM = (T)mismatch;
  const T GO = (T)gap_open, GE = (T)gap_ext;
  int32_t best = 0, best_i = -1, best_k = -1;
  for (int32_t i = 0; i < qeff; ++i) {
    uint8_t* dir = dir_buf->data() + (size_t)i * band;
    const int8_t qc = read[i];
    const int8_t* tp = tpad.data() + band + i - half;  // tp[k] = ref[j(k)]

    // pass 1 (vector): substitution, M, E (+provenance bit), Hnod
    row_pass1(tp, qc, hp, ep, ec, hnod, m_row, ebit, band,
              MATCH, MISM, GO, GE, NEG);
    // pass 2 (serial max chain): F values + extension provenance
    row_pass2(hnod, sa, fbit, band, GO, GE, NEG);
    // pass 3 (vector): H, packed directions, row max
    T row_best = row_pass3(sa, hnod, m_row, ebit, fbit, hc, ec, dir,
                           band, NEG);
    if ((int32_t)row_best > best) {
      best = (int32_t)row_best;
      best_i = i;
      for (int32_t k = 0; k < band; ++k)
        if (hc[k] == row_best) { best_k = k; break; }
    }
    hc[band] = 0;
    ec[band] = 0;
    std::swap(hp, hc);
    std::swap(ep, ec);
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
    uint8_t d = dir_buf->data()[(size_t)i * band + k] & 3;
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
          uint8_t ext = dir_buf->data()[(size_t)i * band + k] & EXT_E;
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
          uint8_t ext = dir_buf->data()[(size_t)i * band + k] & EXT_F;
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
    std::vector<uint8_t> dir_buf;
    Scratch<int16_t> s16;
    Scratch<int32_t> s32;
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
      // int16 lanes when the max possible score fits comfortably
      if ((int64_t)std::min(qlen, tlen) * match < 7500 && band * gap_ext < 4000)
        banded_align_t<int16_t>(read, qlen, ref, tlen, band, match, mismatch,
                                gap_open, gap_ext, &r, &dir_buf, &s16);
      else
        banded_align_t<int32_t>(read, qlen, ref, tlen, band, match, mismatch,
                                gap_open, gap_ext, &r, &dir_buf, &s32);
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
