// mpn_debruijn.cc — de Bruijn graph candidate-haplotype builder.
//
// Native equivalent of the reference's Boost.Graph consensus builder
// (reference: bin/realignment/realign/debruijn_graph.cpp:208 Build with
// increasing k until acyclic, :265 AddEdgesForRead quality-gated, :353 Prune
// of low-weight non-reference edges, :289 CandidatePaths enumerating <= 256
// source->sink paths; C ABI :387 get_consensus). Hash-map adjacency instead
// of Boost; same algorithmic contract.

#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <unordered_set>
#include <vector>

namespace {

struct Graph {
  // node = k-mer encoded as string of codes; edges node -> {next_base: info}
  struct Edge {
    int32_t weight = 0;
    bool on_ref = false;
  };
  std::unordered_map<std::string, std::unordered_map<int8_t, Edge>> adj;
  std::string source, sink;

  void add_edge(const std::string& from, int8_t base, bool ref) {
    Edge& e = adj[from][base];
    e.weight += 1;
    if (ref) e.on_ref = true;
  }
};

static bool build_graph(const int8_t* ref, int32_t ref_len,
                        const int8_t* reads, const int64_t* offsets,
                        const int8_t* quals, int32_t n_reads, int32_t k,
                        int32_t min_qual, Graph* g) {
  if (ref_len < k + 1) return false;
  auto kmer_ok = [](const int8_t* s, int32_t k) {
    for (int32_t i = 0; i < k; ++i)
      if (s[i] < 0 || s[i] > 3) return false;
    return true;
  };
  // reference path edges
  for (int32_t i = 0; i + k < ref_len; ++i) {
    if (!kmer_ok(ref + i, k + 1)) continue;
    g->add_edge(std::string((const char*)ref + i, k), ref[i + k], true);
  }
  g->source = std::string((const char*)ref, k);
  g->sink = std::string((const char*)ref + ref_len - k, k);
  // read edges, gated on base quality (AddEdgesForRead semantics)
  for (int32_t r = 0; r < n_reads; ++r) {
    const int8_t* seq = reads + offsets[r];
    const int8_t* q = quals ? quals + offsets[r] : nullptr;
    int64_t len = offsets[r + 1] - offsets[r];
    for (int64_t i = 0; i + k < len; ++i) {
      if (!kmer_ok(seq + i, k + 1)) continue;
      if (q) {
        bool ok = true;
        for (int32_t j = 0; j <= k; ++j)
          if (q[i + j] < min_qual) { ok = false; break; }
        if (!ok) continue;
      }
      g->add_edge(std::string((const char*)seq + i, k), seq[i + k], false);
    }
  }
  return true;
}

// cycle detection via iterative DFS coloring
static bool has_cycle(const Graph& g) {
  std::unordered_map<std::string, int> color;  // 0 white 1 gray 2 black
  std::vector<std::pair<std::string, int>> stack;
  for (const auto& kv : g.adj) {
    if (color[kv.first] != 0) continue;
    stack.push_back({kv.first, 0});
    while (!stack.empty()) {
      auto& top = stack.back();
      const std::string& node = top.first;
      if (top.second == 0) color[node] = 1;
      auto it = g.adj.find(node);
      bool descended = false;
      if (it != g.adj.end()) {
        int idx = 0;
        for (const auto& e : it->second) {
          if (idx++ < top.second) continue;
          top.second = idx;
          std::string nxt = node.substr(1) + (char)e.first;
          int c = color[nxt];
          if (c == 1) return true;
          if (c == 0) {
            stack.push_back({nxt, 0});
            descended = true;
          }
          break;
        }
      }
      if (!descended && (it == g.adj.end()
                         || top.second >= (int)it->second.size())) {
        color[node] = 2;
        stack.pop_back();
      }
    }
  }
  return false;
}

static void prune(Graph* g, int32_t min_weight) {
  for (auto& kv : g->adj) {
    for (auto it = kv.second.begin(); it != kv.second.end();) {
      if (!it->second.on_ref && it->second.weight < min_weight)
        it = kv.second.erase(it);
      else
        ++it;
    }
  }
}

static void candidate_paths(const Graph& g, int32_t max_paths,
                            int32_t max_len,
                            std::vector<std::string>* out) {
  // DFS from source to sink enumerating paths (CandidatePaths, cap 256)
  struct Frame {
    std::string node;
    std::vector<int8_t> nexts;
    size_t idx = 0;
  };
  std::vector<Frame> stack;
  std::string path = g.source;
  auto push = [&](const std::string& node) {
    Frame f;
    f.node = node;
    auto it = g.adj.find(node);
    if (it != g.adj.end())
      for (const auto& e : it->second) f.nexts.push_back(e.first);
    stack.push_back(std::move(f));
  };
  push(g.source);
  while (!stack.empty() && (int32_t)out->size() < max_paths) {
    Frame& f = stack.back();
    if (f.node == g.sink && stack.size() > 1) {
      out->push_back(path);
      path.resize(path.size() - 1);
      stack.pop_back();
      continue;
    }
    if (f.idx >= f.nexts.size() || (int32_t)path.size() >= max_len) {
      if (stack.size() > 1) path.resize(path.size() - 1);
      stack.pop_back();
      continue;
    }
    int8_t base = f.nexts[f.idx++];
    std::string nxt = f.node.substr(1) + (char)base;
    path.push_back((char)base);
    push(nxt);
  }
}

}  // namespace

extern "C" {

// Build candidate haplotypes from a reference window + reads.
// Tries k = min_k, min_k+2, ... up to max_k until the pruned graph is
// acyclic (Build's increasing-k loop). Outputs concatenated haplotype codes
// + offsets. Returns number of haplotypes (0 if none/failed), -1 on error.
int32_t mpn_dbg_haplotypes(const int8_t* ref, int32_t ref_len,
                           const int8_t* reads, const int64_t* read_offsets,
                           const int8_t* quals /* nullable */,
                           int32_t n_reads, int32_t min_k, int32_t max_k,
                           int32_t min_qual, int32_t min_edge_weight,
                           int32_t max_paths, int8_t* hap_out,
                           int64_t* hap_offsets, int64_t hap_cap) {
  for (int32_t k = min_k; k <= max_k; k += 2) {
    Graph g;
    if (!build_graph(ref, ref_len, reads, read_offsets, quals, n_reads, k,
                     min_qual, &g))
      return 0;
    prune(&g, min_edge_weight);
    if (has_cycle(g)) continue;
    std::vector<std::string> paths;
    candidate_paths(g, max_paths, ref_len * 2 + 100, &paths);
    int64_t pos = 0;
    int32_t n = 0;
    hap_offsets[0] = 0;
    for (const auto& p : paths) {
      if (pos + (int64_t)p.size() > hap_cap) break;
      memcpy(hap_out + pos, p.data(), p.size());
      pos += p.size();
      hap_offsets[++n] = pos;
    }
    return n;
  }
  return 0;  // cyclic at every k
}

}  // extern "C"
