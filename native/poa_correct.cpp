// Native host batch engine for ONT/HiFi read correction: per-read anchor
// chaining, minimizer-POA graph consensus, and overlap-trim — the complete
// `correctRead` hot path at C++ speed, OpenMP across reads.
//
// This is the HOST production twin of the pure-Python oracle in
// metamdbg_tpu/correction/{chainer,poa,aligner}.py. Outputs are
// bit-identical to the Python path (asserted by tests/test_parity_correction
// and the native-vs-oracle A/B in tests/test_poa_native.py); the Python
// modules remain the readable specification and the fallback.
//
// Reference semantics re-expressed here (cited):
// - density re-threshold: double(MurmurHash3(value,8,seed=42).low64) <
//   double(float(density)) * double(2^64-1)  (src/utils/kmer/Kmer.hpp:1421).
// - anchor collection per (reference, query) pair in (query index asc,
//   reference occurrence asc) order (src/readSelection/ReadCorrection.hpp:
//   5006-5069), then stable (refPos, queryPos) sort.
// - banded float32 chaining DP, descending-j strict-> tie-break, first-wins
//   argmax (src/readSelection/MinimizerChainer.hpp:735-961).
// - chain -> match/mismatch/indel transcript + gap normalization
//   (MinimizerChainer.hpp:114-705, 1015-1095).
// - POA graph addAlignment2/addNode2/addEdge2
//   (src/readSelection/ReadCorrection.hpp:640-1461).
// - greedy heaviest-path walk with BFS successor-completion scores; walk
//   start ties follow std::unordered_map iteration order — we use a REAL
//   libstdc++ unordered_map for that, so the order is exact by construction
//   (ReadCorrection.hpp:5730-5980; the Python model is utils/stdmap.py).
// - overlap alignment trim, match=3/mismatch=-1/gap=-1, last-row-then-
//   last-column >= max scans, diag>up>left backtrack
//   (src/readSelection/MinimizerAligner.hpp:14-408,
//   ReadCorrection.hpp:5983-6096 trimCorrectedPath).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <unordered_set>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

inline uint64_t Rotl64(uint64_t x, int8_t r) {
  return (x << r) | (x >> (64 - r));
}

inline uint64_t Fmix64(uint64_t k) {
  k ^= k >> 33;
  k *= 0xff51afd7ed558ccdULL;
  k ^= k >> 33;
  k *= 0xc4ceb9fe1a85ec53ULL;
  k ^= k >> 33;
  return k;
}

inline uint64_t Murmur64U64Key(uint64_t key, uint32_t seed) {
  uint64_t h1 = seed, h2 = seed;
  uint64_t k1 = key;
  k1 *= 0x87c37b91114253d5ULL;
  k1 = Rotl64(k1, 31);
  k1 *= 0x4cf5ad432745937fULL;
  h1 ^= k1;
  h1 ^= 8;
  h2 ^= 8;
  h1 += h2;
  h2 += h1;
  h1 = Fmix64(h1);
  h2 = Fmix64(h2);
  h1 += h2;
  return h1;
}

// ---------------------------------------------------------------------------
// Read views

struct ReadView {
  const uint32_t* mins;
  const uint32_t* pos;
  const uint8_t* dirs;
  const uint8_t* quals;
  int64_t n;
  int64_t read_length;
};

// An owned density-filtered (and possibly reverse-complemented) read.
struct LowRead {
  std::vector<uint32_t> mins;
  std::vector<int64_t> pos;
  std::vector<uint8_t> dirs;
  std::vector<uint8_t> quals;
  int64_t read_length = 0;
};

// Utils::applyDensityThreshold (src/Commons.hpp:2507-2545).
void ApplyDensity(const ReadView& r, double bound, LowRead* out) {
  out->mins.clear();
  out->pos.clear();
  out->dirs.clear();
  out->quals.clear();
  out->read_length = r.read_length;
  for (int64_t i = 0; i < r.n; ++i) {
    uint64_t h = Murmur64U64Key((uint64_t)r.mins[i], 42);
    if ((double)h < bound) {
      out->mins.push_back(r.mins[i]);
      out->pos.push_back((int64_t)r.pos[i]);
      out->dirs.push_back(r.dirs[i]);
      out->quals.push_back(r.quals[i]);
    }
  }
}

// MinimizerRead::toReverseComplement (src/Commons.hpp:1042-1079): positions
// flip through u32 exactly like the numpy cast chain in correction/stage.py.
void ReverseComplement(LowRead* r) {
  int64_t n = (int64_t)r->mins.size();
  std::reverse(r->mins.begin(), r->mins.end());
  std::reverse(r->quals.begin(), r->quals.end());
  std::vector<int64_t> pos(n);
  std::vector<uint8_t> dirs(n);
  for (int64_t i = 0; i < n; ++i) {
    pos[i] = (int64_t)(uint32_t)(r->read_length - r->pos[n - 1 - i]);
    dirs[i] = (uint8_t)(1 - r->dirs[n - 1 - i]);
  }
  r->pos.swap(pos);
  r->dirs.swap(dirs);
}

// ---------------------------------------------------------------------------
// Anchors + chaining (correction/chainer.py twin)

struct Anchors {
  std::vector<int64_t> ref_pos, q_pos;
  std::vector<uint8_t> is_rev;
  std::vector<int64_t> ref_idx, q_idx;
  size_t size() const { return ref_pos.size(); }
};

// Sorted (minimizer, reference index) occurrence table, built once per
// reference read (plays the reference's hash-map-of-occurrence-lists).
struct RefIndex {
  std::vector<std::pair<uint32_t, int64_t>> sorted;  // (minimizer, ref idx)
  template <typename Mins>
  void Build(const Mins& mins, int64_t n) {
    sorted.resize(n);
    for (int64_t i = 0; i < n; ++i) sorted[i] = {(uint32_t)mins[i], i};
    std::sort(sorted.begin(), sorted.end());
  }
};

// collect_anchors (ReadCorrection.hpp:5006-5069): one anchor per
// (query minimizer, reference occurrence), query-major, ref-occurrence asc.
template <typename QMins, typename QPos, typename QDirs,
          typename RPos, typename RDirs>
void CollectAnchors(const RefIndex& ridx, const RPos& ref_pos_arr,
                    const RDirs& ref_dirs, const QMins& q_mins,
                    const QPos& q_pos_arr, const QDirs& q_dirs, int64_t qn,
                    Anchors* out) {
  out->ref_pos.clear();
  out->q_pos.clear();
  out->is_rev.clear();
  out->ref_idx.clear();
  out->q_idx.clear();
  for (int64_t q = 0; q < qn; ++q) {
    uint32_t m = (uint32_t)q_mins[q];
    auto lo = std::lower_bound(
        ridx.sorted.begin(), ridx.sorted.end(),
        std::make_pair(m, (int64_t)INT64_MIN));
    for (auto it = lo; it != ridx.sorted.end() && it->first == m; ++it) {
      int64_t ri = it->second;
      out->ref_pos.push_back((int64_t)ref_pos_arr[ri]);
      out->q_pos.push_back((int64_t)q_pos_arr[q]);
      out->is_rev.push_back((uint8_t)(((ref_dirs[ri] != 0) !=
                                       (q_dirs[q] != 0)) ? 1 : 0));
      out->ref_idx.push_back(ri);
      out->q_idx.push_back(q);
    }
  }
}

// Stable (refPos, queryPos) sort of the gathered anchors
// (MinimizerChainer.hpp:154-159 via chainer.compute_chaining_alignment).
void SortAnchors(Anchors* a) {
  int64_t n = (int64_t)a->size();
  std::vector<int64_t> order(n);
  for (int64_t i = 0; i < n; ++i) order[i] = i;
  std::stable_sort(order.begin(), order.end(), [&](int64_t x, int64_t y) {
    if (a->ref_pos[x] != a->ref_pos[y]) return a->ref_pos[x] < a->ref_pos[y];
    return a->q_pos[x] < a->q_pos[y];
  });
  Anchors s;
  s.ref_pos.resize(n);
  s.q_pos.resize(n);
  s.is_rev.resize(n);
  s.ref_idx.resize(n);
  s.q_idx.resize(n);
  for (int64_t i = 0; i < n; ++i) {
    int64_t o = order[i];
    s.ref_pos[i] = a->ref_pos[o];
    s.q_pos[i] = a->q_pos[o];
    s.is_rev[i] = a->is_rev[o];
    s.ref_idx[i] = a->ref_idx[o];
    s.q_idx[i] = a->q_idx[o];
  }
  *a = std::move(s);
}

// chainAnchors + argmaxPosition (MinimizerChainer.hpp:735-961); identical
// loop to chain_corr_batch in native/sketch.cpp.
int64_t ChainDp(const Anchors& a, int32_t band, float w, int64_t max_dist,
                int64_t max_gap, std::vector<float>* scores,
                std::vector<int32_t>* parents) {
  int64_t n = (int64_t)a.size();
  scores->assign(n, 0.0f);
  parents->assign(n, -1);
  const int64_t* rp = a.ref_pos.data();
  const int64_t* qp = a.q_pos.data();
  const uint8_t* rv = a.is_rev.data();
  for (int64_t i = 0; i < n; ++i) {
    float best_score = 0.0f;
    int64_t best_prev = i;
    for (int64_t j = i - 1; j >= 0; --j) {
      if (i - j > band) break;
      if (rv[i] != rv[j]) continue;
      if (rp[i] == rp[j] || qp[i] == qp[j]) continue;
      int64_t d_r = rp[i] - rp[j];
      int64_t d_q = rv[i] ? (qp[j] - qp[i]) : (qp[i] - qp[j]);
      if (d_q > max_dist || d_r > max_dist) continue;
      if (d_r <= 0) continue;
      int64_t gap = d_r - d_q;
      if (gap < 0) gap = -gap;
      if (gap > max_gap) continue;
      if (rv[i]) {
        if (qp[i] > qp[j]) continue;
      } else {
        if (qp[i] < qp[j]) continue;
      }
      float cand = (*scores)[j] + (w - (float)gap);
      if (cand > best_score) {
        best_score = cand;
        best_prev = j;
      }
    }
    if (best_prev != i) {
      (*scores)[i] = best_score;
      (*parents)[i] = (int32_t)best_prev;
    } else {
      (*scores)[i] = w;
      (*parents)[i] = -1;
    }
  }
  int64_t bi = -1;
  float ms = 0.0f;
  for (int64_t i = 0; i < n; ++i) {
    if ((*scores)[i] > ms) {
      ms = (*scores)[i];
      bi = i;
    }
  }
  return bi;
}

constexpr int32_t kNone = -1;  // (u_int32_t)-1 gap markers in the reference

struct ChainResult {
  bool is_query_reversed = false;
  int64_t nb_matches = 0, nb_missmatches = 0, nb_deletions = 0,
          nb_insertions = 0;
  float identity = 0.0f;
  int64_t overhang_start = 0, overhang_end = 0, align_length = 0;
  bool has_alignments = false;
  std::vector<std::pair<int32_t, int32_t>> alignments;  // (ref|-1, query|-1)
};

// the reference indexes vectors with possibly -1 (UB read); clamp to 0 like
// chainer._pos
template <typename Arr>
inline int64_t PosAt(const Arr& arr, int64_t i) {
  return (int64_t)arr[i < 0 ? 0 : i];
}

inline void FinishIdentity(ChainResult* r, int32_t minimizer_size) {
  int64_t reference_size = r->nb_matches + r->nb_missmatches + r->nb_deletions;
  int64_t query_size = r->nb_matches + r->nb_missmatches + r->nb_insertions;
  int64_t nb_seeds = std::min(reference_size, query_size);
  double divergence;
  if (r->nb_matches == nb_seeds) {
    divergence = 0.0;
  } else if (r->nb_matches == 0) {
    divergence = 1.0;
  } else {
    divergence = 1.0 - std::pow((double)r->nb_matches / (double)nb_seeds,
                                1.0 / (double)minimizer_size);
  }
  r->identity = (float)(1.0 - divergence);
}

// compute_chaining_alignment (MinimizerChainer.hpp:114-705). RefArrs/QArrs
// expose .minimizers/.positions accessors through the lambdas below.
struct SeqView {
  const uint32_t* mins32 = nullptr;      // either u32 minimizers...
  const std::vector<uint32_t>* minsv = nullptr;  // ...or an owned vector
  const uint32_t* pos32 = nullptr;
  const std::vector<int64_t>* posv = nullptr;
  int64_t n = 0;
  int64_t read_length = 0;
  uint32_t Min(int64_t i) const { return minsv ? (*minsv)[i] : mins32[i]; }
  int64_t Pos(int64_t i) const {
    return posv ? (*posv)[i < 0 ? 0 : i] : (int64_t)pos32[i < 0 ? 0 : i];
  }
};

void NormalizeAlignment(std::vector<std::pair<int32_t, int32_t>>* aln,
                        const SeqView& ref, const SeqView& query) {
  // MinimizerChainer.hpp:1015-1095 with the exact index-skipping erase
  auto next_with_ref = [&](size_t i) -> int64_t {
    for (size_t j = i; j < aln->size(); ++j)
      if ((*aln)[j].first != kNone) return (int64_t)j;
    return -1;
  };
  auto next_with_query = [&](size_t i) -> int64_t {
    for (size_t j = i; j < aln->size(); ++j)
      if ((*aln)[j].second != kNone) return (int64_t)j;
    return -1;
  };
  size_t i = 0;
  while (i < aln->size()) {
    int32_t r = (*aln)[i].first;
    int32_t q = (*aln)[i].second;
    if (r == kNone) {
      int64_t j = next_with_ref(i);
      if (j != -1) {
        int32_t rp = (*aln)[j].first;
        if (ref.Min(rp) == query.Min(q)) {
          (*aln)[i] = {rp, q};
          (*aln)[j].first = kNone;
        }
        if ((*aln)[j].first == kNone && (*aln)[j].second == kNone)
          aln->erase(aln->begin() + j);
      }
    } else if (q == kNone) {
      int64_t j = next_with_query(i);
      if (j != -1) {
        int32_t qp = (*aln)[j].second;
        if (ref.Min(r) == query.Min(qp)) {
          (*aln)[i] = {r, qp};
          (*aln)[j].second = kNone;
        }
        if ((*aln)[j].first == kNone && (*aln)[j].second == kNone)
          aln->erase(aln->begin() + j);
      }
    }
    ++i;
  }
}

void ComputeChainingAlignment(Anchors* anchors, const SeqView& ref,
                              const SeqView& query, int32_t band,
                              int32_t minimizer_size, bool need_alignments,
                              float chain_w, int64_t chain_max_dist,
                              int64_t chain_max_gap, ChainResult* result) {
  *result = ChainResult();
  int64_t n = (int64_t)anchors->size();
  if (n < 3) return;
  SortAnchors(anchors);

  std::vector<float> scores;
  std::vector<int32_t> parents;
  int64_t best_index =
      ChainDp(*anchors, band, chain_w, chain_max_dist, chain_max_gap,
              &scores, &parents);
  if (best_index < 0) return;
  std::vector<int64_t> interval;
  for (int64_t idx = best_index; idx != -1; idx = parents[idx])
    interval.push_back(idx);
  std::reverse(interval.begin(), interval.end());
  if ((int64_t)interval.size() <= 3) return;  // hpp:268 (needs >= 4 anchors)

  const auto& ref_idx = anchors->ref_idx;
  const auto& q_idx = anchors->q_idx;
  const auto& ref_pos = anchors->ref_pos;

  int64_t first = interval.front();
  int64_t last = interval.back();
  int64_t f_ri = ref_idx[first], f_qi = q_idx[first];
  int64_t l_ri = ref_idx[last], l_qi = q_idx[last];
  bool is_query_reversed = f_qi > l_qi;

  int64_t overhang_start, nb_start_mm, overhang_end, nb_end_mm;
  if (is_query_reversed) {
    overhang_start = std::min(ref.Pos(f_ri),
                              query.read_length - query.Pos(f_qi - 1));
    nb_start_mm = std::min(f_ri, query.n - f_qi - 1);
    overhang_end = std::min(ref.read_length - ref.Pos(l_ri - 1),
                            query.Pos(l_qi));
    nb_end_mm = std::min(ref.n - l_ri - 1, l_qi);
  } else {
    overhang_start = std::min(ref.Pos(f_ri), query.Pos(f_qi));
    nb_start_mm = std::min(f_ri, f_qi);
    overhang_end = std::min(ref.read_length - ref.Pos(l_ri - 1),
                            query.read_length - query.Pos(l_qi - 1));
    nb_end_mm = std::min(ref.n - l_ri - 1, query.n - l_qi - 1);
  }

  result->is_query_reversed = is_query_reversed;
  result->overhang_start = overhang_start;
  result->overhang_end = overhang_end;

  if (!need_alignments) {
    int64_t mm_sum = 0, del_sum = 0, ins_sum = 0;
    for (size_t t = 0; t + 1 < interval.size(); ++t) {
      int64_t cur = interval[t], nxt = interval[t + 1];
      int64_t ref_gap = ref_idx[nxt] - ref_idx[cur] - 1;
      int64_t q_gap = is_query_reversed ? (q_idx[cur] - q_idx[nxt] - 1)
                                        : (q_idx[nxt] - q_idx[cur] - 1);
      int64_t mm = std::min(ref_gap, q_gap);
      mm_sum += mm;
      if (ref_gap > q_gap)
        del_sum += ref_gap - mm;
      else
        ins_sum += q_gap - mm;
    }
    result->nb_matches = (int64_t)interval.size();
    result->nb_missmatches = nb_start_mm + nb_end_mm + mm_sum;
    result->nb_deletions = del_sum;
    result->nb_insertions = ins_sum;
    result->align_length = ref_pos[interval.back()] - ref_pos[interval.front()];
    result->has_alignments = true;  // see chainer.py: final match never erased
    FinishIdentity(result, minimizer_size);
    return;
  }

  auto& aln = result->alignments;
  int64_t nb_matches = 0, nb_missmatches = 0, nb_insertions = 0,
          nb_deletions = 0;
  int32_t qstep = is_query_reversed ? -1 : 1;
  int32_t rpos = (int32_t)(f_ri - nb_start_mm);
  int32_t qpos =
      (int32_t)(f_qi + (is_query_reversed ? nb_start_mm : -nb_start_mm));
  for (int64_t t = 0; t < nb_start_mm; ++t) {
    aln.push_back({rpos, qpos});
    ++nb_missmatches;
    ++rpos;
    qpos += qstep;
  }
  int64_t align_start = -1, align_end = -1;
  for (size_t t = 0; t + 1 < interval.size(); ++t) {
    int64_t cur = interval[t], nxt = interval[t + 1];
    int64_t ref_gap = ref_idx[nxt] - ref_idx[cur] - 1;
    int64_t q_gap = is_query_reversed ? (q_idx[cur] - q_idx[nxt] - 1)
                                      : (q_idx[nxt] - q_idx[cur] - 1);
    int64_t mm = std::min(ref_gap, q_gap);
    int64_t ins = 0, dele = 0;
    if (ref_gap > q_gap)
      dele = ref_gap - mm;
    else
      ins = q_gap - mm;

    aln.push_back({rpos, qpos});
    ++rpos;
    qpos += qstep;
    ++nb_matches;
    if (align_start == -1) align_start = ref_pos[cur];
    align_end = ref_pos[nxt];

    nb_missmatches += mm;
    nb_deletions += dele;
    nb_insertions += ins;
    for (int64_t s = 0; s < mm; ++s) aln.push_back({rpos++, kNone});
    for (int64_t s = 0; s < dele; ++s) aln.push_back({rpos++, kNone});
    for (int64_t s = 0; s < mm; ++s) {
      aln.push_back({kNone, qpos});
      qpos += qstep;
    }
    for (int64_t s = 0; s < ins; ++s) {
      aln.push_back({kNone, qpos});
      qpos += qstep;
    }
  }
  aln.push_back({rpos, qpos});
  ++rpos;
  qpos += qstep;
  ++nb_matches;
  for (int64_t t = 0; t < nb_end_mm; ++t) {
    aln.push_back({rpos, qpos});
    ++rpos;
    qpos += qstep;
    ++nb_missmatches;
  }

  result->nb_matches = nb_matches;
  result->nb_missmatches = nb_missmatches;
  result->nb_deletions = nb_deletions;
  result->nb_insertions = nb_insertions;
  result->align_length = (align_start != -1) ? (align_end - align_start) : 0;
  FinishIdentity(result, minimizer_size);
  NormalizeAlignment(&aln, ref, query);
  result->has_alignments = !aln.empty();
}

// ---------------------------------------------------------------------------
// POA graph (correction/poa.py twin; ReadCorrection.hpp:640-1461)

struct PoaGraph {
  struct Node {
    uint32_t minimizer;
    int64_t quality = 0;
    int64_t max_quality = 0;
    std::vector<int32_t> succ;  // edge ids
    std::vector<int32_t> pred;  // edge ids
  };
  struct Edge {
    int32_t tail, head;
    int64_t weight;
  };
  std::vector<Node> nodes;
  std::vector<Edge> edges;

  void Init(const LowRead& r) {
    int64_t n = (int64_t)r.mins.size();
    nodes.reserve(n * 2);
    for (int64_t i = 0; i < n; ++i) {
      Node nd;
      nd.minimizer = r.mins[i];
      nd.quality = (int64_t)r.quals[i];
      nd.max_quality = (int64_t)r.quals[i];
      nodes.push_back(std::move(nd));
    }
    for (int64_t i = 0; i + 1 < n; ++i) {
      int64_t q = std::min((int64_t)r.quals[i], (int64_t)r.quals[i + 1]);
      AddEdge((int32_t)i, (int32_t)(i + 1), q);
    }
  }

  // addEdge2 (hpp:1375-1400): merge into existing edge
  void AddEdge(int32_t tail, int32_t head, int64_t weight) {
    if (tail < 0) return;
    for (int32_t eid : nodes[tail].succ) {
      if (edges[eid].head == head) {
        edges[eid].weight += weight;
        return;
      }
    }
    int32_t eid = (int32_t)edges.size();
    edges.push_back({tail, head, weight});
    nodes[tail].succ.push_back(eid);
    nodes[head].pred.push_back(eid);
  }

  // addNode2 (hpp:1343-1372)
  int32_t AddNode2(int32_t prev, uint32_t minimizer) {
    if (prev >= 0) {
      for (int32_t eid : nodes[prev].succ) {
        if (nodes[edges[eid].head].minimizer == minimizer)
          return edges[eid].head;
      }
    }
    Node nd;
    nd.minimizer = minimizer;
    nodes.push_back(std::move(nd));
    return (int32_t)nodes.size() - 1;
  }

  void Bump(int32_t node, int64_t q) {
    nodes[node].quality += q;
    nodes[node].max_quality = std::max(nodes[node].max_quality, q);
  }

  // addAlignment2 (hpp:1179-1271)
  void AddAlignment(const std::vector<std::pair<int32_t, int32_t>>& aln,
                    const SeqView& ref, const SeqView& query,
                    const std::vector<uint8_t>& q_quals) {
    int32_t prev = -1;
    for (const auto& p : aln) {
      int32_t rpos = p.first, qpos = p.second;
      if (rpos == kNone) {  // insertion
        int32_t cur = AddNode2(prev, query.Min(qpos));
        Bump(cur, (int64_t)q_quals[qpos]);
        if (prev >= 0) AddEdge(prev, cur, (int64_t)q_quals[qpos]);
        prev = cur;
      } else if (qpos == kNone) {  // deletion: skipped entirely
      } else if (ref.Min(rpos) == query.Min(qpos)) {  // match
        int32_t cur = rpos;
        Bump(cur, (int64_t)q_quals[qpos]);
        if (prev >= 0) AddEdge(prev, cur, (int64_t)q_quals[qpos]);
        prev = cur;
      } else {  // mismatch: branch node
        int32_t cur = AddNode2(prev, query.Min(qpos));
        Bump(cur, (int64_t)q_quals[qpos]);
        if (prev >= 0) AddEdge(prev, cur, (int64_t)q_quals[qpos]);
        prev = cur;
      }
    }
  }
};

// computeSuccessorCompletion (hpp:5948-5980): completion(e) = e.weight +
// sum over nodes reachable from e.head (inclusive) of that node's out-edge
// weights whose head minimizer occurs in the reference read. Integer sums
// are order-free, so one memoized BFS per distinct head matches the
// reference's per-edge BFS exactly.
struct CompletionScorer {
  const PoaGraph* g;
  std::vector<int64_t> contrib;      // per node
  std::vector<int64_t> memo;         // per node, -1 = unset
  std::vector<int32_t> mark;         // BFS visited stamps
  int32_t stamp = 0;
  std::vector<int32_t> queue;

  void Build(const PoaGraph& graph,
             const std::unordered_set<uint32_t>& ref_set) {
    g = &graph;
    int64_t n = (int64_t)graph.nodes.size();
    contrib.assign(n, 0);
    memo.assign(n, -1);
    mark.assign(n, 0);
    for (int64_t v = 0; v < n; ++v) {
      for (int32_t eid : graph.nodes[v].succ) {
        const auto& e = graph.edges[eid];
        if (ref_set.count(graph.nodes[e.head].minimizer))
          contrib[v] += e.weight;
      }
    }
  }

  int64_t ReachSum(int32_t start) {
    if (memo[start] >= 0) return memo[start];
    ++stamp;
    queue.clear();
    queue.push_back(start);
    mark[start] = stamp;
    int64_t total = 0;
    for (size_t h = 0; h < queue.size(); ++h) {
      int32_t v = queue[h];
      total += contrib[v];
      for (int32_t eid : g->nodes[v].succ) {
        int32_t w = g->edges[eid].head;
        if (mark[w] != stamp) {
          mark[w] = stamp;
          queue.push_back(w);
        }
      }
    }
    memo[start] = total;
    return total;
  }

  int64_t Completion(int32_t eid) {
    const auto& e = g->edges[eid];
    return e.weight + ReachSum(e.head);
  }
};

// computePath2 greedy walk (hpp:5730-5928). Returns false when no source
// qualifies (caller falls back to the input read).
bool ComputePath(const PoaGraph& g, const std::unordered_set<uint32_t>& ref_set,
                 std::vector<uint32_t>* path_mins,
                 std::vector<int64_t>* path_quals) {
  CompletionScorer scorer;
  scorer.Build(g, ref_set);

  // the reference scans unordered_map<u32, Node*>; completion ties keep the
  // first-iterated source. Using a real libstdc++ unordered_map with the
  // node-index keys inserted in creation order gives the exact order the
  // Python model (utils/stdmap.py) replicates.
  std::unordered_map<uint32_t, uint32_t> order_map;
  int64_t n = (int64_t)g.nodes.size();
  for (int64_t i = 0; i < n; ++i)
    order_map.emplace((uint32_t)i, (uint32_t)i);

  int32_t start = -1;
  int64_t max_completion = 0;
  for (const auto& kv : order_map) {
    int32_t idx = (int32_t)kv.first;
    const auto& node = g.nodes[idx];
    if (!node.pred.empty()) continue;
    for (int32_t eid : node.succ) {
      int64_t completion = scorer.Completion(eid);
      if (completion > max_completion) {
        max_completion = completion;
        start = idx;
      }
    }
  }
  if (start < 0) return false;

  std::vector<char> visited(g.nodes.size(), 0);
  visited[start] = 1;
  path_mins->clear();
  path_quals->clear();
  path_mins->push_back(g.nodes[start].minimizer);
  path_quals->push_back(g.nodes[start].max_quality);
  int32_t current = start;
  while (true) {
    int64_t max_weight = 0;
    for (int32_t eid : g.nodes[current].succ) {
      const auto& e = g.edges[eid];
      if (e.head == current) continue;
      if (e.weight > max_weight) max_weight = e.weight;
    }
    float min_weight = (float)((double)max_weight * 0.75);

    // solid successors; single solid short-circuits the completion compare
    int32_t single = -1;
    int32_t n_solid = 0;
    int32_t best = -1;
    int64_t best_completion = 0;
    for (int32_t eid : g.nodes[current].succ) {
      const auto& e = g.edges[eid];
      if (e.head == current) continue;
      if (!((float)e.weight >= min_weight)) continue;
      ++n_solid;
      single = eid;
    }
    if (n_solid == 0) break;
    if (n_solid == 1) {
      best = single;
    } else {
      for (int32_t eid : g.nodes[current].succ) {
        const auto& e = g.edges[eid];
        if (e.head == current) continue;
        if (!((float)e.weight >= min_weight)) continue;
        int64_t completion = scorer.Completion(eid);
        if (completion > best_completion) {
          best_completion = completion;
          best = eid;
        }
      }
      if (best < 0) break;
    }
    current = g.edges[best].head;
    if (visited[current]) break;
    visited[current] = 1;
    path_mins->push_back(g.nodes[current].minimizer);
    path_quals->push_back(g.nodes[current].max_quality);
  }
  return true;
}

// ---------------------------------------------------------------------------
// Overlap-trim (correction/aligner.py + poa.trim_corrected_path twin)

constexpr int32_t kMatch = 3;
constexpr int32_t kMismatch = -1;
constexpr int32_t kGap = -1;

// MinimizerAligner overlap DP (hpp:14-408) + trimCorrectedPath
// (ReadCorrection.hpp:5983-6096): returns [start, end) over `corrected`.
void TrimCorrectedPath(const std::vector<uint32_t>& corrected,
                       const std::vector<uint32_t>& original,
                       int64_t* out_start, int64_t* out_end) {
  *out_start = -1;
  *out_end = -1;
  int64_t R = (int64_t)corrected.size();
  int64_t Q = (int64_t)original.size();
  if (R == 0 || Q == 0) return;

  std::vector<int32_t> M((R + 1) * (Q + 1), 0);
  auto at = [&](int64_t i, int64_t j) -> int32_t& {
    return M[i * (Q + 1) + j];
  };
  for (int64_t i = 1; i <= R; ++i) {
    for (int64_t j = 1; j <= Q; ++j) {
      int32_t p = (corrected[i - 1] == original[j - 1]) ? kMatch : kMismatch;
      int32_t best = at(i - 1, j - 1) + p;
      best = std::max(best, at(i - 1, j) + kGap);
      best = std::max(best, at(i, j - 1) + kGap);
      at(i, j) = best;
    }
  }

  // explicit max scans (MinimizerAligner.hpp:250-289): last row keeps the
  // largest j on ties, then last column keeps the largest i on ties
  int64_t max_i = 0, max_j = 0;
  int64_t max_score = INT64_MIN;
  for (int64_t j = 1; j <= Q; ++j) {
    if ((int64_t)at(R, j) >= max_score) {
      max_score = (int64_t)at(R, j);
      max_i = R;
      max_j = j;
    }
  }
  for (int64_t i = 1; i <= R; ++i) {
    if ((int64_t)at(i, Q) >= max_score) {
      max_score = (int64_t)at(i, Q);
      max_i = i;
      max_j = Q;
    }
  }
  if (max_i == 0 && max_j == 0) return;

  // backtrack diag > up > left; record matches directly (the Python builds
  // the pair list then scans it — first/last equal-minimizer matches)
  int64_t start = -1, end = -1;
  int64_t i = max_i, j = max_j;
  while (i != 0 && j != 0) {
    int32_t h = at(i, j);
    int32_t p = (corrected[i - 1] == original[j - 1]) ? kMatch : kMismatch;
    int64_t pi, pj;
    bool pair_match = false;
    if (h == at(i - 1, j - 1) + p) {
      pi = i - 1;
      pj = j - 1;
      pair_match = (corrected[i - 1] == original[j - 1]);
    } else if (h == at(i - 1, j) + kGap) {
      pi = i - 1;
      pj = j;
    } else if (h == at(i, j - 1) + kGap) {
      pi = i;
      pj = j - 1;
    } else {  // unreachable by construction
      pi = i - 1;
      pj = j - 1;
      pair_match = (corrected[i - 1] == original[j - 1]);
    }
    if (pair_match) {
      // walking backwards: the LAST match seen becomes `start`, the first
      // becomes `end`
      if (end == -1) end = i;  // i-1 + 1
      start = i - 1;
    }
    i = pi;
    j = pj;
  }
  if (start == -1 || start == end) {
    *out_start = -1;
    *out_end = -1;
    return;
  }
  *out_start = start;
  *out_end = end;
}

// ---------------------------------------------------------------------------
// Per-read driver (correction/stage.py correct_read twin)

struct Params {
  double density_bound;   // double(float32(density)) * double(2^64-1)
  int32_t min_read_minimizers;
  float min_identity;
  int64_t min_overlap_length;
  int32_t band;
  int32_t minimizer_size;
  float chain_w;
  int64_t chain_max_dist;
  int64_t chain_max_gap;
};

struct Workspace {
  LowRead q_low;
  Anchors anchors;
  ChainResult result;
};

// correctRead (ReadCorrection.hpp:4958-5002) + filterAlignments (5006-5117)
// + performPoaCorrection4 (5151-5581). Returns the corrected minimizers (or
// the input read's when correction is not possible).
void CorrectOne(const ReadView* reads, int64_t read_index,
                const uint32_t* aligned, int64_t n_aligned, const Params& P,
                Workspace* ws, std::vector<uint32_t>* out) {
  const ReadView& read = reads[read_index];
  out->assign(read.mins, read.mins + read.n);

  // _pool_correct_one's low-density gate
  LowRead ref_low;
  ApplyDensity(read, P.density_bound, &ref_low);
  if ((int64_t)ref_low.mins.size() < P.min_read_minimizers) return;
  if (n_aligned == 0) return;

  // ---- filterAlignments: chain at correction density, keep passers ----
  RefIndex ref_high_idx;
  ref_high_idx.Build(read.mins, read.n);
  SeqView ref_high;
  ref_high.mins32 = read.mins;
  ref_high.pos32 = read.pos;
  ref_high.n = read.n;
  ref_high.read_length = read.read_length;

  std::vector<std::pair<uint32_t, uint8_t>> best;  // (query, is_rev)
  for (int64_t a = 0; a < n_aligned; ++a) {
    uint32_t q_index = aligned[a];
    const ReadView& query = reads[q_index];
    CollectAnchors(ref_high_idx, read.pos, read.dirs, query.mins, query.pos,
                   query.dirs, query.n, &ws->anchors);
    if (ws->anchors.size() == 0) continue;
    SeqView qv;
    qv.mins32 = query.mins;
    qv.pos32 = query.pos;
    qv.n = query.n;
    qv.read_length = query.read_length;
    ComputeChainingAlignment(&ws->anchors, ref_high, qv, P.band,
                             P.minimizer_size, /*need_alignments=*/false,
                             P.chain_w, P.chain_max_dist, P.chain_max_gap,
                             &ws->result);
    const ChainResult& r = ws->result;
    if (r.overhang_start > 1000 || r.overhang_end > 1000) continue;
    if (r.align_length < P.min_overlap_length) continue;
    if (r.identity < P.min_identity) continue;
    if (!r.has_alignments) continue;
    best.push_back({q_index, (uint8_t)(r.is_query_reversed ? 1 : 0)});
  }
  if (best.empty()) return;

  // ---- performPoaCorrection4 ----
  PoaGraph graph;
  graph.Init(ref_low);
  std::unordered_set<uint32_t> ref_set(ref_low.mins.begin(),
                                       ref_low.mins.end());

  RefIndex ref_low_idx;
  ref_low_idx.Build(ref_low.mins, (int64_t)ref_low.mins.size());
  SeqView ref_lv;
  ref_lv.minsv = &ref_low.mins;
  ref_lv.posv = &ref_low.pos;
  ref_lv.n = (int64_t)ref_low.mins.size();
  ref_lv.read_length = ref_low.read_length;

  for (const auto& qb : best) {
    const ReadView& query = reads[qb.first];
    ApplyDensity(query, P.density_bound, &ws->q_low);
    if ((int64_t)ws->q_low.mins.size() < P.min_read_minimizers) continue;
    if (qb.second) ReverseComplement(&ws->q_low);
    CollectAnchors(ref_low_idx, ref_low.pos, ref_low.dirs, ws->q_low.mins,
                   ws->q_low.pos, ws->q_low.dirs,
                   (int64_t)ws->q_low.mins.size(), &ws->anchors);
    SeqView qv;
    qv.minsv = &ws->q_low.mins;
    qv.posv = &ws->q_low.pos;
    qv.n = (int64_t)ws->q_low.mins.size();
    qv.read_length = ws->q_low.read_length;
    ComputeChainingAlignment(&ws->anchors, ref_lv, qv, P.band,
                             P.minimizer_size, /*need_alignments=*/true,
                             P.chain_w, P.chain_max_dist, P.chain_max_gap,
                             &ws->result);
    graph.AddAlignment(ws->result.alignments, ref_lv, qv, ws->q_low.quals);
  }

  std::vector<uint32_t> path_mins;
  std::vector<int64_t> path_quals;
  if (!ComputePath(graph, ref_set, &path_mins, &path_quals)) {
    path_mins = ref_low.mins;
  }
  int64_t s, e;
  TrimCorrectedPath(path_mins, ref_low.mins, &s, &e);
  if (s < 0) {
    out->clear();
    return;
  }
  out->assign(path_mins.begin() + s, path_mins.begin() + e);
}

}  // namespace

extern "C" {

// Batch read correction over a work list. The full high-density read set is
// passed as concatenated arrays (read_offs[n_reads_total+1] delimits).
// aligned_cat/aligned_offs give each work item's candidate read indexes.
// Outputs are compacted in work order; returns total minimizers written, or
// -(needed) when out_cap is too small (retry with the reported capacity;
// out_offs is filled either way).
int64_t correct_reads_batch(
    const uint32_t* mins_cat, const uint32_t* pos_cat, const uint8_t* dirs_cat,
    const uint8_t* quals_cat, const int64_t* read_offs,
    const int64_t* read_lens, int32_t n_reads_total, const int32_t* work,
    int32_t n_work, const uint32_t* aligned_cat, const int64_t* aligned_offs,
    double density_bound, int32_t min_read_minimizers, float min_identity,
    int64_t min_overlap_length, int32_t band, int32_t minimizer_size,
    float chain_w, int64_t chain_max_dist, int64_t chain_max_gap,
    uint32_t* out_mins, int64_t* out_offs, int64_t out_cap,
    int32_t n_threads) {
  std::vector<ReadView> reads(n_reads_total);
  for (int32_t r = 0; r < n_reads_total; ++r) {
    int64_t a = read_offs[r];
    reads[r] = {mins_cat + a, pos_cat + a, dirs_cat + a, quals_cat + a,
                read_offs[r + 1] - a, read_lens[r]};
  }
  Params P{density_bound, min_read_minimizers, min_identity,
           min_overlap_length, band, minimizer_size,
           chain_w, chain_max_dist, chain_max_gap};

  std::vector<std::vector<uint32_t>> results(n_work);
#ifdef _OPENMP
#pragma omp parallel num_threads(n_threads)
#endif
  {
    Workspace ws;
#ifdef _OPENMP
#pragma omp for schedule(dynamic, 4)
#endif
    for (int32_t i = 0; i < n_work; ++i) {
      int64_t a = aligned_offs[i];
      CorrectOne(reads.data(), (int64_t)work[i], aligned_cat + a,
                 aligned_offs[i + 1] - a, P, &ws, &results[i]);
    }
  }

  int64_t total = 0;
  out_offs[0] = 0;
  for (int32_t i = 0; i < n_work; ++i) {
    total += (int64_t)results[i].size();
    out_offs[i + 1] = total;
  }
  if (total > out_cap) return -total;
  int64_t o = 0;
  for (int32_t i = 0; i < n_work; ++i) {
    std::copy(results[i].begin(), results[i].end(), out_mins + o);
    o += (int64_t)results[i].size();
  }
  return total;
}

}  // extern "C"
