// mpn_minimizer.cc — (k,w) minimizer extraction and sorted-index construction.
//
// Host-side builder for the TPU-resident minimizer index. The reference's
// alignment stage delegates seeding to minimap2 (reference: bin/lib/aligner.py:206
// runs `minimap2 -x map-ont`); this implements the same published minimizer
// scheme (Li 2016: invertible hash on 2k-bit canonical k-mers, window minimum)
// so the device pipeline can reproduce map-ont seeding (k=15, w=10).
//
// Output layout is designed for XLA-friendly device lookup: the index is a
// pair of sorted flat arrays (hash keys ascending, packed positions), so
// device-side seed lookup is jnp.searchsorted (log N, fully vectorized) rather
// than a pointer-chasing hash table.
//
// Position packing (uint64): [ seq_id : 24 | pos : 39 | strand : 1 ]

#include <algorithm>
#include <atomic>
#include <chrono>
#include <cstdio>
#include <cstdlib>
#include <cstdint>
#include <cstring>
#include <memory>
#include <vector>
#include <thread>

namespace {

// Thomas Wang 64-bit invertible integer hash, as used by minimap2 (public
// algorithm; operates on 2k-bit masked k-mer values).
static inline uint64_t hash64(uint64_t key, uint64_t mask) {
  key = (~key + (key << 21)) & mask;
  key = key ^ (key >> 24);
  key = ((key + (key << 3)) + (key << 8)) & mask;
  key = key ^ (key >> 14);
  key = ((key + (key << 2)) + (key << 4)) & mask;
  key = key ^ (key >> 28);
  key = (key + (key << 31)) & mask;
  return key;
}

struct Minimizer {
  uint64_t hash;
  uint64_t packed;  // seq_id:24 | pos:39 | strand:1  (pos = k-mer END position)
};

// Extract (k,w) minimizers of windows ending in [i_begin, i_end) from one
// numeric sequence (codes 0..3; 4 = N breaks k-mers). Canonical: min(fwd
// kmer, revcomp kmer); strand = which was smaller. Windows whose forward and
// reverse k-mer values tie are skipped (ambiguous strand), matching
// minimap2's published sketch behavior.
//
// Range form enables PARALLEL index builds over chunks of one long
// sequence: the scan warms up (k + w - 1) positions before i_begin to
// reconstruct the rolling k-mer + window deque, and tracks (without
// emitting) the winners of warmup windows so the consecutive-window dedupe
// is seamless across chunk boundaries (a winner's emitting windows form one
// contiguous run, so the first in-range window only emits when its winner
// differs from the previous window's).
template <typename Emit>
static void sketch_range(const int8_t* seq, int64_t len, uint32_t seq_id,
                         int k, int w, int64_t i_begin, int64_t i_end,
                         Emit&& emit_out) {
  const uint64_t shift1 = 2 * (k - 1);
  const uint64_t mask = (k < 32) ? ((1ULL << (2 * k)) - 1) : ~0ULL;
  uint64_t kmer_f = 0, kmer_r = 0;
  int valid = 0;  // consecutive non-ambiguous bases
  if (i_end > len) i_end = len;
  const int64_t start = std::max<int64_t>(0, i_begin - (k + w - 1));

  Minimizer last{~0ULL, ~0ULL};  // last window winner (warmup included)

  // O(len) sliding-window minimum via a monotonic ring deque of the last
  // <= w VALID candidates, nondecreasing by (hash, packed). The front is
  // always the window minimum among valid k-mers (invalid positions are
  // simply not pushed — a window with no valid candidate has an empty
  // deque and emits nothing); ties keep the earliest position (smallest
  // packed). Power-of-two ring (mask indexing) — the modulo arithmetic of
  // the naive ring was ~40% of sketch time.
  int ringsz = 2;
  while (ringsz < w + 2) ringsz <<= 1;
  const int rmask = ringsz - 1;
  std::vector<Minimizer> dq_m((size_t)ringsz);
  std::vector<int64_t> dq_i((size_t)ringsz);
  int head = 0, tail = 0;  // [head, tail) occupied, mod ringsz

  for (int64_t i = start; i < i_end; ++i) {
    int8_t c = seq[i];
    if (c < 4) {
      kmer_f = ((kmer_f << 2) | (uint64_t)c) & mask;
      kmer_r = (kmer_r >> 2) | (((uint64_t)(3 - c)) << shift1);
      ++valid;
    } else {
      valid = 0;
    }
    if (valid >= k && kmer_f != kmer_r) {
      Minimizer m;
      int strand = kmer_r < kmer_f ? 1 : 0;
      uint64_t canon = strand ? kmer_r : kmer_f;
      m.hash = hash64(canon, mask);
      m.packed = ((uint64_t)seq_id << 40) | (((uint64_t)i) << 1) |
                 (uint64_t)strand;
      // pop strictly-greater candidates from the back (equal stay:
      // earliest position wins the window)
      while (tail != head) {
        const Minimizer& b = dq_m[(tail + ringsz - 1) & rmask];
        if (b.hash > m.hash || (b.hash == m.hash && b.packed > m.packed))
          tail = (tail + ringsz - 1) & rmask;
        else
          break;
      }
      dq_m[tail] = m;
      dq_i[tail] = i;
      tail = (tail + 1) & rmask;
    }
    // drop front entries that left the window [i-w+1, i]
    while (head != tail && dq_i[head] < i - w + 1) head = (head + 1) & rmask;
    if (i >= k + w - 2 && head != tail) {
      const Minimizer& m0 = dq_m[head];
      if (!(m0.hash == last.hash && m0.packed == last.packed)) {
        last = m0;                      // track through warmup windows too
        if (i >= i_begin) emit_out(m0);
      }
    }
  }
}

static void sketch_sequence(const int8_t* seq, int64_t len, uint32_t seq_id,
                            int k, int w, std::vector<Minimizer>* out) {
  sketch_range(seq, len, seq_id, k, w, 0, len,
               [out](const Minimizer& m) { out->push_back(m); });
}

struct IndexBuild {
  // raw arrays, NOT zero-initialized: every element is written by the
  // build, and value-initializing ~GBs (vector::resize) costs seconds of
  // page-fault + memset time on this host
  std::unique_ptr<uint64_t[]> keys;
  std::unique_ptr<uint64_t[]> positions;
  int64_t n = 0;
};

}  // namespace

extern "C" {

// Sketch a batch of sequences (concatenated codes + offsets) and build a
// sorted index. Returns an opaque handle.
//
// Fully threaded: sequences are split into ~8 Mbp window-range chunks
// (sketch_range makes chunking exact across boundaries), each thread
// bucket-partitions its minimizers by the hash's top bits, then buckets are
// concatenated and sorted independently in parallel — bucket order IS hash
// order, so the concatenation of sorted buckets is the globally sorted
// table. ~n_threads x faster than the serial sketch + one giant std::sort,
// and the dominant cost of multi-Gbp index construction (the reference's
// analogue is minimap2's -I index batching, bin/megapath_nano.py:4017-4022).
void* mpn_index_build(const int8_t* seqs, const int64_t* offsets,
                      int32_t n_seqs, int k, int w, int32_t n_threads) {
  if (n_threads < 1) n_threads = 1;
  const bool verbose = getenv("MPN_BUILD_VERBOSE") != nullptr;
  auto tick = std::chrono::steady_clock::now();
  auto lap = [&](const char* what) {
    if (!verbose) return;
    auto now = std::chrono::steady_clock::now();
    fprintf(stderr, "[mpn_index_build] %s: %.2fs\n", what,
            std::chrono::duration<double>(now - tick).count());
    tick = now;
  };
  const int BB = 9;  // 512 hash-prefix buckets
  const int B = 1 << BB;
  const int shift = (2 * k > BB) ? (2 * k - BB) : 0;
  const int64_t CHUNK = 8ll << 20;
  struct Task { int32_t seq; int64_t b, e; };
  std::vector<Task> tasks;
  for (int32_t s = 0; s < n_seqs; ++s) {
    int64_t len = offsets[s + 1] - offsets[s];
    for (int64_t b = 0; b < len; b += CHUNK)
      tasks.push_back({s, b, std::min(len, b + CHUNK)});
  }
  std::vector<std::vector<std::vector<Minimizer>>> parts(
      n_threads, std::vector<std::vector<Minimizer>>(B));
  std::atomic<size_t> next{0};
  {
    int64_t total_bp = offsets[n_seqs];
    // expected minimizer density 2/(w+1); reserve with 1.3x headroom so
    // bucket vectors grow without repeated reallocation
    int64_t per_bucket =
        (total_bp * 2 / (w + 1)) / (B * n_threads) * 13 / 10 + 16;
    std::vector<std::thread> ts;
    for (int t = 0; t < n_threads; ++t)
      ts.emplace_back([&, t]() {
        auto& mine = parts[t];
        for (auto& v : mine) v.reserve((size_t)per_bucket);
        for (;;) {
          size_t ti = next.fetch_add(1);
          if (ti >= tasks.size()) break;
          const Task& tk = tasks[ti];
          sketch_range(seqs + offsets[tk.seq],
                       offsets[tk.seq + 1] - offsets[tk.seq],
                       (uint32_t)tk.seq, k, w, tk.b, tk.e,
                       [&](const Minimizer& m) {
                         mine[(size_t)(m.hash >> shift)].push_back(m);
                       });
        }
      });
    for (auto& th : ts) th.join();
  }
  lap("sketch+bucket");
  std::vector<int64_t> boff(B + 1, 0);
  // fine-grained laps below (verbose only)
  for (int b = 0; b < B; ++b) {
    int64_t sz = 0;
    for (int t = 0; t < n_threads; ++t) sz += (int64_t)parts[t][b].size();
    boff[b + 1] = boff[b] + sz;
  }
  const int64_t n = boff[B];
  IndexBuild* idx = new IndexBuild();
  idx->n = n;
  idx->keys.reset(new uint64_t[n]);
  idx->positions.reset(new uint64_t[n]);
  lap("alloc keys/pos");
  std::unique_ptr<Minimizer[]> all(new Minimizer[n]);
  lap("alloc all");
  std::atomic<int> nextb{0};
  {
    std::vector<std::thread> ts;
    for (int t = 0; t < n_threads; ++t)
      ts.emplace_back([&]() {
        for (;;) {
          int b = nextb.fetch_add(1);
          if (b >= B) break;
          int64_t o = boff[b];
          for (int tt = 0; tt < n_threads; ++tt) {
            auto& v = parts[tt][b];
            if (!v.empty())
              memcpy(all.get() + o, v.data(), v.size() * sizeof(Minimizer));
            o += (int64_t)v.size();
            v.clear();
            v.shrink_to_fit();       // release as we go: halves peak RSS
          }
          std::sort(all.get() + boff[b], all.get() + boff[b + 1],
                    [](const Minimizer& a, const Minimizer& c) {
                      return a.hash < c.hash ||
                             (a.hash == c.hash && a.packed < c.packed);
                    });
          for (int64_t i = boff[b]; i < boff[b + 1]; ++i) {
            idx->keys[i] = all[i].hash;
            idx->positions[i] = all[i].packed;
          }
        }
      });
    for (auto& th : ts) th.join();
  }
  lap("concat+sort+split");
  return idx;
}

int64_t mpn_index_size(void* h) { return ((IndexBuild*)h)->n; }
void mpn_index_copy(void* h, uint64_t* keys_out, uint64_t* pos_out) {
  IndexBuild* idx = (IndexBuild*)h;
  memcpy(keys_out, idx->keys.get(), idx->n * sizeof(uint64_t));
  memcpy(pos_out, idx->positions.get(), idx->n * sizeof(uint64_t));
}
void mpn_index_free(void* h) { delete (IndexBuild*)h; }

// Threaded batch binary search: for each query hash, [lo, hi) range of equal
// keys in the sorted table (the seed-lookup hot loop).
void mpn_lookup(const uint64_t* keys, int64_t n_keys, const uint64_t* queries,
                int64_t n_q, int64_t* lo_out, int64_t* hi_out,
                int32_t n_threads) {
  if (n_threads < 1) n_threads = 1;
  std::vector<std::thread> threads;
  auto work = [&](int tid) {
    int64_t chunk = (n_q + n_threads - 1) / n_threads;
    int64_t s = tid * chunk, e = std::min(n_q, s + chunk);
    for (int64_t i = s; i < e; ++i) {
      uint64_t q = queries[i];
      const uint64_t* lo =
          std::lower_bound(keys, keys + n_keys, q);
      const uint64_t* hi = std::upper_bound(lo, keys + n_keys, q);
      lo_out[i] = lo - keys;
      hi_out[i] = hi - keys;
    }
  };
  for (int t = 0; t < n_threads; ++t) threads.emplace_back(work, t);
  for (auto& t : threads) t.join();
}

// LUT-accelerated batch lookup: lut[b] = first index in keys whose top
// lut_bits equal-or-exceed bucket b (host-built via one vectorized
// searchsorted over bucket boundaries; lut has 2^lut_bits + 1 entries).
// Hashes are avalanche-mixed, so buckets are uniform and each binary search
// runs over ~n_keys / 2^lut_bits elements — 2 cache lines instead of ~20.
void mpn_lookup_lut(const uint64_t* keys, int64_t n_keys,
                    const int64_t* lut, int32_t lut_bits,
                    const uint64_t* queries, int64_t n_q, int64_t* lo_out,
                    int64_t* hi_out, int32_t n_threads) {
  if (n_threads < 1) n_threads = 1;
  const int shift = 64 - lut_bits;
  std::vector<std::thread> threads;
  auto work = [&](int tid) {
    int64_t chunk = (n_q + n_threads - 1) / n_threads;
    int64_t s = tid * chunk, e = std::min(n_q, s + chunk);
    for (int64_t i = s; i < e; ++i) {
      uint64_t q = queries[i];
      uint64_t b = q >> shift;
      const uint64_t* first = keys + lut[b];
      const uint64_t* last = keys + lut[b + 1];
      const uint64_t* lo = std::lower_bound(first, last, q);
      const uint64_t* hi = std::upper_bound(lo, last, q);
      lo_out[i] = lo - keys;
      hi_out[i] = hi - keys;
    }
  };
  for (int t = 0; t < n_threads; ++t) threads.emplace_back(work, t);
  for (auto& t : threads) t.join();
}

// Batch sketch: concatenated reads + offsets -> concatenated minimizers with
// per-read offsets. Two-phase: call with hashes_out == NULL to get required
// total size, then with buffers. out_offsets has n_reads+1 entries.
int64_t mpn_sketch_batch(const int8_t* seqs, const int64_t* offsets,
                         int32_t n_reads, int k, int w,
                         uint64_t* hashes_out, int64_t* pos_out,
                         int8_t* strand_out, int64_t* out_offsets,
                         int64_t cap) {
  // threaded sketch with per-read result buffers, then serial layout
  int n_threads = (int)std::min<size_t>(
      std::thread::hardware_concurrency() ? std::thread::hardware_concurrency()
                                          : 1, 8);
  std::vector<std::vector<Minimizer>> per_read(n_reads);
  {
    std::vector<std::thread> ts;
    for (int t = 0; t < n_threads; ++t)
      ts.emplace_back([&, t]() {
        for (int32_t r = t; r < n_reads; r += n_threads)
          sketch_sequence(seqs + offsets[r], offsets[r + 1] - offsets[r], 0,
                          k, w, &per_read[r]);
      });
    for (auto& th : ts) th.join();
  }
  int64_t total = 0;
  for (int32_t r = 0; r < n_reads; ++r) total += (int64_t)per_read[r].size();
  if (!hashes_out) return total;
  int64_t pos = 0;
  for (int32_t r = 0; r < n_reads; ++r) {
    out_offsets[r] = pos;
    const auto& mins = per_read[r];
    int64_t m = std::min<int64_t>((int64_t)mins.size(), cap - pos);
    if (m < 0) m = 0;
    for (int64_t i = 0; i < m; ++i) {
      hashes_out[pos + i] = mins[i].hash;
      pos_out[pos + i] =
          (int64_t)((mins[i].packed >> 1) & ((1ULL << 39) - 1));
      strand_out[pos + i] = (int8_t)(mins[i].packed & 1);
    }
    pos += m;
  }
  out_offsets[n_reads] = pos;
  return pos;
}

// Sketch a single sequence, returning minimizers in order of occurrence
// (for query reads). Caller provides output buffers of capacity `cap`;
// returns the number written (or required size if cap == 0).
int64_t mpn_sketch(const int8_t* seq, int64_t len, int k, int w,
                   uint64_t* hashes_out, int64_t* pos_out, int8_t* strand_out,
                   int64_t cap) {
  std::vector<Minimizer> mins;
  sketch_sequence(seq, len, 0, k, w, &mins);
  int64_t n = (int64_t)mins.size();
  if (cap == 0) return n;
  int64_t ncopy = std::min(n, cap);
  for (int64_t i = 0; i < ncopy; ++i) {
    hashes_out[i] = mins[i].hash;
    pos_out[i] = (int64_t)((mins[i].packed >> 1) & ((1ULL << 39) - 1));
    strand_out[i] = (int8_t)(mins[i].packed & 1);
  }
  return n;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Fused anchor collection: sketch → LUT lookup → hit expansion → per-read
// sort, one call. Anchors come out ordered by (read, seq, strand, t, q) —
// the exact layout the alignment pipeline's grouping step needs — without
// any global sort: anchors are naturally partitioned by read, and each
// read's own anchors (tens to hundreds) sort cache-resident per thread.
// Replaces the former four-step host path (sketch_batch + lookup_ranges +
// numpy hit expansion + 140k-row lexsort) at ~3x lower host cost.

namespace {

struct Anchor {
  uint64_t key;  // seq_id:24 | strand:1 | t_pos:39
  int32_t q;     // strand-adjusted query end position
};

struct AnchorBatch {
  std::vector<Anchor> anchors;       // flat, per-read contiguous
  std::vector<int64_t> offsets;      // n_reads + 1
};

}  // namespace

extern "C" {

void* mpn_anchors_build(const int8_t* seqs, const int64_t* offsets,
                        int32_t n_reads, int k, int w,
                        const uint64_t* keys, int64_t n_keys,
                        const uint64_t* positions,
                        const int64_t* lut, int32_t lut_bits,
                        int32_t max_occ, int32_t n_threads) {
  if (n_threads < 1) n_threads = 1;
  const int shift = 64 - lut_bits;
  const uint64_t mask39 = (1ULL << 39) - 1;
  std::vector<std::vector<Anchor>> per_read(n_reads);
  std::vector<std::thread> ts;
  for (int t = 0; t < n_threads; ++t)
    ts.emplace_back([&, t]() {
      std::vector<Minimizer> mins;
      for (int32_t r = t; r < n_reads; r += n_threads) {
        const int64_t qlen = offsets[r + 1] - offsets[r];
        mins.clear();
        sketch_sequence(seqs + offsets[r], qlen, 0, k, w, &mins);
        std::vector<Anchor>& out = per_read[r];
        for (const Minimizer& m : mins) {
          uint64_t b = m.hash >> shift;
          const uint64_t* first = keys + lut[b];
          const uint64_t* last = keys + lut[b + 1];
          const uint64_t* lo = std::lower_bound(first, last, m.hash);
          const uint64_t* hi = std::upper_bound(lo, last, m.hash);
          int64_t cnt = hi - lo;
          if (cnt <= 0 || cnt > max_occ) continue;
          const uint64_t q_strand = m.packed & 1;
          const int64_t q_pos = (int64_t)((m.packed >> 1) & mask39);
          for (const uint64_t* p = positions + (lo - keys);
               p < positions + (hi - keys); ++p) {
            const uint64_t pos = *p;
            const uint64_t strand = (pos ^ m.packed) & 1;  // q_strand^t_strand
            const uint64_t t_pos = (pos >> 1) & mask39;
            const uint64_t t_seq = pos >> 40;
            const int64_t q =
                strand ? (qlen + k - 2 - q_pos) : q_pos;
            out.push_back(Anchor{(t_seq << 40) | (strand << 39) | t_pos,
                                 (int32_t)q});
          }
        }
        std::sort(out.begin(), out.end(), [](const Anchor& a, const Anchor& b) {
          return a.key < b.key || (a.key == b.key && a.q < b.q);
        });
      }
    });
  for (auto& th : ts) th.join();
  AnchorBatch* ab = new AnchorBatch();
  ab->offsets.resize(n_reads + 1);
  int64_t total = 0;
  for (int32_t r = 0; r < n_reads; ++r) {
    ab->offsets[r] = total;
    total += (int64_t)per_read[r].size();
  }
  ab->offsets[n_reads] = total;
  ab->anchors.resize(total);
  for (int32_t r = 0; r < n_reads; ++r)
    std::copy(per_read[r].begin(), per_read[r].end(),
              ab->anchors.begin() + ab->offsets[r]);
  return ab;
}

int64_t mpn_anchors_total(void* h) {
  return (int64_t)((AnchorBatch*)h)->anchors.size();
}

void mpn_anchors_export(void* h, int32_t* q_out, int64_t* t_out,
                        int32_t* seq_out, int8_t* strand_out,
                        int64_t* offsets_out) {
  AnchorBatch* ab = (AnchorBatch*)h;
  const uint64_t mask39 = (1ULL << 39) - 1;
  const int64_t n = (int64_t)ab->anchors.size();
  for (int64_t i = 0; i < n; ++i) {
    const Anchor& a = ab->anchors[i];
    q_out[i] = a.q;
    t_out[i] = (int64_t)(a.key & mask39);
    seq_out[i] = (int32_t)(a.key >> 40);
    strand_out[i] = (int8_t)((a.key >> 39) & 1);
  }
  std::copy(ab->offsets.begin(), ab->offsets.end(), offsets_out);
  delete ab;
}

}  // extern "C"
