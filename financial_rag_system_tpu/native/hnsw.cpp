// Host-side HNSW graph builder — native counterpart of index/hnsw.py.
//
// The reference delegates graph-index construction to Qdrant's server
// (Rust HNSW; reached via upsert, reference ingest.py:171-175).  Graph
// *construction* is sequential pointer-chasing — a host workload — while
// the *query* walk is batched on the TPU (index/hnsw.py).  This library
// owns construction: standard HNSW insertion (Malkov & Yashunin 2016,
// public algorithm) with geometric level sampling, efConstruction beam
// search per layer, and heuristic neighbor selection, specialized to
// inner-product similarity over L2-normalized vectors (cosine).
//
// The device consumes two flat exports: the level-0 fixed-degree
// adjacency (n, 2M) int32 (pad = -1) and the >=1-level entry nodes
// (descending by level) that seed the batched beam walk.
//
// C ABI for ctypes; no external dependencies.
//
// Build: g++ -O3 -shared -fPIC -o libfrs_hnsw.so hnsw.cpp

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <queue>
#include <random>
#include <utility>
#include <vector>

namespace {

struct Hnsw {
  int n = 0, d = 0, m = 0, efc = 0;
  int max_level = -1;
  int entry = -1;
  const float* vecs = nullptr;           // borrowed, valid during build only
  std::vector<float> owned;              // copy so handle outlives caller buf
  std::vector<int> levels;               // node -> top level
  // adjacency[level][node] -> neighbor list (level 0 cap 2M, else M)
  std::vector<std::vector<std::vector<int>>> adj;

  float sim(int a, int b) const {
    const float* x = owned.data() + (size_t)a * d;
    const float* y = owned.data() + (size_t)b * d;
    float s = 0.f;
    for (int i = 0; i < d; i++) s += x[i] * y[i];
    return s;
  }

  int cap(int level) const { return level == 0 ? 2 * m : m; }
};

// max-heap on similarity = best-first expansion queue
using SimNode = std::pair<float, int>;

// Greedy single-path descent on one layer (ef = 1).
int greedy_step(const Hnsw& h, int start, int q, int level) {
  int cur = start;
  float cur_s = h.sim(cur, q);
  bool improved = true;
  while (improved) {
    improved = false;
    for (int nb : h.adj[level][cur]) {
      float s = h.sim(nb, q);
      if (s > cur_s) {
        cur_s = s;
        cur = nb;
        improved = true;
      }
    }
  }
  return cur;
}

// Beam search on one layer; returns up to ef (sim, node) results,
// unsorted.
std::vector<SimNode> search_layer(
    const Hnsw& h, int q, int start, int ef, int level,
    std::vector<int>& visit_mark, int stamp) {
  std::priority_queue<SimNode> cand;                 // best first
  std::priority_queue<SimNode, std::vector<SimNode>,
                      std::greater<SimNode>> best;   // worst on top
  float s0 = h.sim(start, q);
  cand.push({s0, start});
  best.push({s0, start});
  visit_mark[start] = stamp;
  while (!cand.empty()) {
    auto [cs, c] = cand.top();
    cand.pop();
    if (cs < best.top().first && (int)best.size() >= ef) break;
    for (int nb : h.adj[level][c]) {
      if (visit_mark[nb] == stamp) continue;
      visit_mark[nb] = stamp;
      float s = h.sim(nb, q);
      if ((int)best.size() < ef || s > best.top().first) {
        cand.push({s, nb});
        best.push({s, nb});
        if ((int)best.size() > ef) best.pop();
      }
    }
  }
  std::vector<SimNode> out;
  out.reserve(best.size());
  while (!best.empty()) {
    out.push_back(best.top());
    best.pop();
  }
  return out;
}

// Heuristic neighbor selection (keep a candidate only if it is closer
// to the query than to every already-kept neighbor) — preserves graph
// navigability versus plain top-M.
std::vector<int> select_heuristic(const Hnsw& h, std::vector<SimNode> cand,
                                  int m_out) {
  std::sort(cand.begin(), cand.end(),
            [](const SimNode& a, const SimNode& b) { return a.first > b.first; });
  std::vector<int> kept;
  for (const auto& [s, node] : cand) {
    if ((int)kept.size() >= m_out) break;
    bool ok = true;
    for (int kn : kept) {
      if (h.sim(node, kn) > s) {  // closer to a kept neighbor than to q
        ok = false;
        break;
      }
    }
    if (ok) kept.push_back(node);
  }
  // backfill with nearest rejects so degree stays full
  for (const auto& [s, node] : cand) {
    if ((int)kept.size() >= m_out) break;
    if (std::find(kept.begin(), kept.end(), node) == kept.end())
      kept.push_back(node);
  }
  return kept;
}

void shrink_if_overfull(Hnsw& h, int node, int level) {
  auto& nbrs = h.adj[level][node];
  int c = h.cap(level);
  if ((int)nbrs.size() <= c) return;
  std::vector<SimNode> cand;
  cand.reserve(nbrs.size());
  for (int nb : nbrs) cand.push_back({h.sim(node, nb), nb});
  nbrs = select_heuristic(h, std::move(cand), c);
}

void insert(Hnsw& h, int q, std::vector<int>& visit_mark, int& stamp,
            std::mt19937& rng) {
  std::uniform_real_distribution<double> unif(0.0, 1.0);
  double ml = 1.0 / std::log(std::max(2, h.m));
  int level = (int)(-std::log(std::max(1e-12, unif(rng))) * ml);
  level = std::min(level, (int)h.adj.size() - 1);
  h.levels[q] = level;
  for (int l = 0; l <= level; l++) h.adj[l][q] = {};

  if (h.entry < 0) {
    h.entry = q;
    h.max_level = level;
    return;
  }

  int cur = h.entry;
  for (int l = h.max_level; l > level; l--) cur = greedy_step(h, cur, q, l);

  for (int l = std::min(level, h.max_level); l >= 0; l--) {
    ++stamp;
    auto found = search_layer(h, q, cur, h.efc, l, visit_mark, stamp);
    auto nbrs = select_heuristic(h, found, h.m);
    h.adj[l][q] = nbrs;
    for (int nb : nbrs) {
      h.adj[l][nb].push_back(q);
      shrink_if_overfull(h, nb, l);
    }
    // best found seeds the next (lower) layer
    float bs = -1e30f;
    for (const auto& [s, node] : found)
      if (s > bs) {
        bs = s;
        cur = node;
      }
  }

  if (level > h.max_level) {
    h.max_level = level;
    h.entry = q;
  }
}

}  // namespace

extern "C" {

void* frs_hnsw_build(const float* vecs, int n, int d, int m,
                     int ef_construction, unsigned seed) {
  if (n <= 0 || d <= 0 || m < 2) return nullptr;
  auto* h = new Hnsw();
  h->n = n;
  h->d = d;
  h->m = m;
  h->efc = ef_construction;
  h->owned.assign(vecs, vecs + (size_t)n * d);
  h->levels.assign(n, 0);
  // generous level bound; vectors beyond max observed level stay empty
  int lmax = (int)(std::log((double)n) / std::log(std::max(2, m))) + 2;
  h->adj.assign(lmax + 1, std::vector<std::vector<int>>(n));
  std::mt19937 rng(seed);
  std::vector<int> visit_mark(n, -1);
  int stamp = 0;
  for (int q = 0; q < n; q++) insert(*h, q, visit_mark, stamp, rng);
  return h;
}

int frs_hnsw_max_level(void* hp) { return ((Hnsw*)hp)->max_level; }

// out: (n, 2m) int32, row-major, -1 padded. Returns 2m.
int frs_hnsw_adjacency0(void* hp, int32_t* out) {
  auto* h = (Hnsw*)hp;
  int w = 2 * h->m;
  for (int i = 0; i < h->n; i++) {
    const auto& nb = h->adj[0][i];
    int j = 0;
    for (; j < (int)nb.size() && j < w; j++) out[(size_t)i * w + j] = nb[j];
    for (; j < w; j++) out[(size_t)i * w + j] = -1;
  }
  return w;
}

// Entry nodes for the device walk: all nodes with level >= 1, sorted by
// level descending (global entry first).  Returns count written (<= cap).
int frs_hnsw_entries(void* hp, int32_t* out, int cap) {
  auto* h = (Hnsw*)hp;
  std::vector<SimNode> hi;  // (level, node)
  for (int i = 0; i < h->n; i++)
    if (h->levels[i] >= 1) hi.push_back({(float)h->levels[i], i});
  std::sort(hi.begin(), hi.end(),
            [](const SimNode& a, const SimNode& b) { return a.first > b.first; });
  int cnt = 0;
  for (const auto& [lvl, node] : hi) {
    if (cnt >= cap) break;
    out[cnt++] = node;
  }
  if (cnt == 0 && h->n > 0 && cap > 0) out[cnt++] = h->entry >= 0 ? h->entry : 0;
  return cnt;
}

void frs_hnsw_destroy(void* hp) { delete (Hnsw*)hp; }

}  // extern "C"
