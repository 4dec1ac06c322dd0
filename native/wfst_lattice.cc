// Lattice-generating first-pass CTC decoding over an arbitrary WFST —
// completing the semantics of the reference's Kaldi *lattice*-faster
// decoder binding (SURVEY.md section 2.1 latgen row / 3.4): beyond the
// Viterbi best path (native/wfst_decode.cc), this pass records every
// surviving token transition as a lattice link, prunes the link graph
// with a lattice beam (Kaldi's --lattice-beam), and supports
//   * exact n-best extraction (A* with the Viterbi backward cost as the
//     admissible+consistent heuristic -> complete paths pop in true
//     score order),
//   * word posteriors (log-semiring forward-backward over the pruned
//     lattice; each best-path word gets the posterior mass of its link),
//   * a full pruned-lattice dump (nodes + links with split
//     graph/acoustic costs) that the Python side serializes to
//     Kaldi-style text lattices.
//
// Token passing is identical to wfst_decode.cc (EESEN-style implicit CTC
// topology: tokens on (fst_state, last_frame_symbol), blank/repeat
// collapse in the decoder, best-first input-epsilon closure, beam +
// max-active pruning). The difference: every relaxation appends a Link
// {src, dst, word, frame, graph_cost, ac_cost} to an arena instead of
// only threading one backpointer, and destination nodes keep ALL
// incoming links within the lattice beam, not just the best.
//
// DAG invariant (what makes the backward passes well-defined): a node's
// outgoing links are created only when it is EXPANDED (popped from the
// epsilon-closure queue, or read out of the frontier during the next
// frame's relaxation); incoming links only attach BEFORE expansion. If a
// closure improvement lands on an already-expanded node (possible only
// via negative pushed epsilon weights), the improved token FORKS to a
// fresh node, so no link can close a cycle. Topological order is
// recovered at the end by Kahn's algorithm rather than trusting
// creation order (closure links may point id-high -> id-low).
//
// Exposed with a plain C ABI for ctypes (no pybind11 in this
// environment); wrapper + Python mirror: tpuasr/decode/fst_decode.py.
// Build: native/Makefile (g++ -O3 -shared -fPIC, -lpthread).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <queue>
#include <thread>
#include <unordered_map>
#include <unordered_set>
#include <vector>

namespace {

constexpr float kInf = 1e30f;

struct Node {
  float alpha;      // Viterbi forward cost
  int32_t state;    // fst state (sink: -1)
  int32_t frame;    // frame on which the node's frontier lives
  bool expanded;    // has outgoing links -> improvements must fork
};

struct Link {
  int32_t src, dst;
  int32_t word;     // olabel, 0 = epsilon
  int32_t frame;    // frame stamp for word timing (-1: initial closure)
  float graph_w;    // graph (FST arc / final) part of the cost
  float ac_w;       // acoustic part (-asc * logp), 0 on eps/final links
};

struct Lattice {
  std::vector<Node> nodes;
  std::vector<Link> links;

  int32_t add_node(float alpha, int32_t state, int32_t frame) {
    nodes.push_back({alpha, state, frame, false});
    return static_cast<int32_t>(nodes.size()) - 1;
  }
  void add_link(int32_t src, int32_t dst, int32_t word, int32_t frame,
                float gw, float aw) {
    links.push_back({src, dst, word, frame, gw, aw});
  }
};

inline uint64_t key_of(int32_t state, int32_t last) {
  return (static_cast<uint64_t>(static_cast<uint32_t>(state)) << 32) |
         static_cast<uint32_t>(last);
}
inline int32_t state_of(uint64_t k) { return static_cast<int32_t>(k >> 32); }

// Frontier: (state, last_symbol) -> node id.
using Frontier = std::unordered_map<uint64_t, int32_t>;

// Relax helper shared by frame expansion and epsilon closure: route cost
// into the frontier's node for `key`, appending the link when it is
// within `lat_beam` of the node's best (a link with local slack
// > lat_beam can never satisfy the final alpha+cost+beta cutoff).
struct Relaxer {
  Lattice& lat;
  Frontier& frontier;
  int32_t frame;
  float lat_beam;

  int32_t operator()(uint64_t key, int32_t state, float cost, int32_t src,
                     int32_t word, float gw, float aw) {
    auto it = frontier.find(key);
    if (it == frontier.end()) {
      const int32_t id = lat.add_node(cost, state, frame);
      lat.add_link(src, id, word, frame, gw, aw);
      frontier.emplace(key, id);
      return id;
    }
    Node& n = lat.nodes[it->second];
    if (cost < n.alpha) {
      if (n.expanded) {  // negative-eps improvement after expansion: fork
        const int32_t id = lat.add_node(cost, state, frame);
        lat.add_link(src, id, word, frame, gw, aw);
        it->second = id;
        return id;
      }
      n.alpha = cost;
      lat.add_link(src, it->second, word, frame, gw, aw);
      return it->second;
    }
    if (cost <= n.alpha + lat_beam)
      lat.add_link(src, it->second, word, frame, gw, aw);
    return it->second;
  }
};

void eps_closure(Lattice& lat, Frontier& frontier, const int32_t* arc_off,
                 const int32_t* arc_ilabel, const int32_t* arc_olabel,
                 const int32_t* arc_dst, const float* arc_weight,
                 int32_t frame, float lat_beam) {
  using QE = std::pair<float, uint64_t>;
  std::priority_queue<QE, std::vector<QE>, std::greater<QE>> pq;
  for (const auto& kv : frontier)
    pq.push({lat.nodes[kv.second].alpha, kv.first});
  Relaxer relax{lat, frontier, frame, lat_beam};
  while (!pq.empty()) {
    auto [c, k] = pq.top();
    pq.pop();
    auto it = frontier.find(k);
    if (it == frontier.end()) continue;
    const int32_t id = it->second;
    if (lat.nodes[id].alpha < c) continue;  // stale queue entry
    lat.nodes[id].expanded = true;
    const int32_t s = state_of(k);
    const uint64_t last_bits = k & 0xffffffffull;
    for (int32_t a = arc_off[s]; a < arc_off[s + 1]; ++a) {
      if (arc_ilabel[a] != 0) continue;
      const float nc = c + arc_weight[a];
      const uint64_t nk =
          (static_cast<uint64_t>(static_cast<uint32_t>(arc_dst[a])) << 32) |
          last_bits;
      auto fit = frontier.find(nk);
      const bool improves = fit == frontier.end() ||
                            nc < lat.nodes[fit->second].alpha;
      relax(nk, arc_dst[a], nc, id, arc_olabel[a], arc_weight[a], 0.0f);
      if (improves) pq.push({nc, nk});
    }
  }
}

void prune_frontier(Lattice& lat, Frontier& frontier, float beam,
                    int max_active) {
  if (frontier.empty()) return;
  float best = kInf;
  for (const auto& kv : frontier)
    best = std::min(best, lat.nodes[kv.second].alpha);
  float cutoff = best + beam;
  if (max_active > 0 && static_cast<int>(frontier.size()) > max_active) {
    std::vector<float> costs;
    costs.reserve(frontier.size());
    for (const auto& kv : frontier) {
      const float c = lat.nodes[kv.second].alpha;
      if (c <= cutoff) costs.push_back(c);
    }
    if (static_cast<int>(costs.size()) > max_active) {
      std::nth_element(costs.begin(), costs.begin() + max_active - 1,
                       costs.end());
      cutoff = std::min(cutoff, costs[max_active - 1]);
    }
  }
  for (auto it = frontier.begin(); it != frontier.end();)
    it = lat.nodes[it->second].alpha > cutoff ? frontier.erase(it)
                                              : std::next(it);
}

// ---- backward passes over the link DAG --------------------------------

// Kahn topological order over links restricted to nodes reachable...
// (all nodes; unreachable ones simply keep beta = +inf and prune away).
std::vector<int32_t> topo_order(const Lattice& lat) {
  const size_t N = lat.nodes.size();
  std::vector<int32_t> indeg(N, 0), order;
  order.reserve(N);
  for (const auto& l : lat.links) ++indeg[l.dst];
  std::vector<std::vector<int32_t>> out(N);
  for (size_t i = 0; i < lat.links.size(); ++i)
    out[lat.links[i].src].push_back(static_cast<int32_t>(i));
  std::vector<int32_t> stack;
  for (size_t n = 0; n < N; ++n)
    if (indeg[n] == 0) stack.push_back(static_cast<int32_t>(n));
  while (!stack.empty()) {
    const int32_t n = stack.back();
    stack.pop_back();
    order.push_back(n);
    for (const int32_t li : out[n])
      if (--indeg[lat.links[li].dst] == 0)
        stack.push_back(lat.links[li].dst);
  }
  return order;  // size < N would mean a cycle; by construction impossible
}

inline float logaddf(float a, float b) {
  if (a > b) std::swap(a, b);
  if (a <= -kInf) return b;
  return b + std::log1p(std::exp(a - b));
}

struct DecodedLattice {
  Lattice lat;
  int32_t sink = -1;
  float best_cost = kInf;  // Viterbi cost of the best complete path
  bool reached_final = false;
  std::vector<float> beta_v;   // Viterbi backward cost to sink
  std::vector<float> alpha_l;  // log-semiring forward (negated cost sums)
  std::vector<float> beta_l;
  std::vector<int32_t> kept;   // indices of links surviving lat_beam
  std::vector<float> post;     // posterior per kept link (parallel array)
};

// Run token passing and build the pruned lattice for one utterance.
void build_lattice(const float* lp, int T, int C, int start,
                   const int32_t* arc_off, const int32_t* arc_ilabel,
                   const int32_t* arc_olabel, const int32_t* arc_dst,
                   const float* arc_weight, const float* final_w, int blank,
                   float beam, int max_active, float lat_beam, float asc,
                   DecodedLattice& out) {
  Lattice& lat = out.lat;
  Frontier frontier;
  const int32_t root =
      lat.add_node(0.0f, start, -1);  // single lattice source, id 0
  frontier.emplace(key_of(start, blank), root);
  eps_closure(lat, frontier, arc_off, arc_ilabel, arc_olabel, arc_dst,
              arc_weight, -1, lat_beam);
  for (int t = 0; t < T; ++t) {
    const float* p = lp + static_cast<size_t>(t) * C;
    Frontier nxt;
    nxt.reserve(frontier.size() * 2);
    Relaxer relax{lat, nxt, t, lat_beam};
    for (const auto& kv : frontier) {
      const int32_t s = state_of(kv.first);
      const int32_t u = static_cast<int32_t>(kv.first & 0xffffffffull);
      const int32_t id = kv.second;
      const float c = lat.nodes[id].alpha;
      lat.nodes[id].expanded = true;
      const float blank_ac = -asc * p[blank];
      relax(key_of(s, blank), s, c + blank_ac, id, 0, 0.0f, blank_ac);
      if (u != blank) {  // CTC repeat: stay, no graph advance
        const float stay_ac = -asc * p[u];
        relax(kv.first, s, c + stay_ac, id, 0, 0.0f, stay_ac);
      }
      for (int32_t a = arc_off[s]; a < arc_off[s + 1]; ++a) {
        const int32_t k = arc_ilabel[a];
        if (k == 0 || k == u || k >= C) continue;
        const float aw = -asc * p[k];
        relax(key_of(arc_dst[a], k), arc_dst[a], c + arc_weight[a] + aw, id,
              arc_olabel[a], arc_weight[a], aw);
      }
    }
    frontier.swap(nxt);
    eps_closure(lat, frontier, arc_off, arc_ilabel, arc_olabel, arc_dst,
                arc_weight, t, lat_beam);
    prune_frontier(lat, frontier, beam, max_active);
  }
  // Sink: final-state tokens connect with their final weight; if none is
  // final, fall back to ALL surviving tokens at zero cost (latgen-faster
  // partial-hypothesis semantics, reached_final=false).
  float best_f = kInf;
  for (const auto& kv : frontier) {
    const float fw = final_w[state_of(kv.first)];
    if (fw < kInf)
      best_f = std::min(best_f, lat.nodes[kv.second].alpha + fw);
  }
  out.reached_final = best_f < kInf;
  const int32_t sink = lat.add_node(kInf, -1, T);
  out.sink = sink;
  for (const auto& kv : frontier) {
    const float fw = final_w[state_of(kv.first)];
    if (out.reached_final) {
      if (fw < kInf)
        lat.add_link(kv.second, sink, 0, T, fw, 0.0f);
    } else {
      lat.add_link(kv.second, sink, 0, T, 0.0f, 0.0f);
    }
  }
}

// Backward costs, lattice-beam pruning, and link posteriors.
void finish_lattice(DecodedLattice& dl, float lat_beam) {
  Lattice& lat = dl.lat;
  const size_t N = lat.nodes.size();
  const std::vector<int32_t> order = topo_order(lat);
  dl.beta_v.assign(N, kInf);
  dl.beta_v[dl.sink] = 0.0f;
  std::vector<std::vector<int32_t>> out(N);
  for (size_t i = 0; i < lat.links.size(); ++i)
    out[lat.links[i].src].push_back(static_cast<int32_t>(i));
  for (auto it = order.rbegin(); it != order.rend(); ++it) {
    const int32_t n = *it;
    for (const int32_t li : out[n]) {
      const Link& l = lat.links[li];
      const float via = l.graph_w + l.ac_w + dl.beta_v[l.dst];
      dl.beta_v[n] = std::min(dl.beta_v[n], via);
    }
  }
  dl.best_cost = dl.beta_v[0];  // root alpha is 0
  // keep links within the lattice beam of the best complete path
  const float cutoff =
      dl.best_cost < kInf ? dl.best_cost + lat_beam : kInf;
  dl.kept.clear();
  for (size_t i = 0; i < lat.links.size(); ++i) {
    const Link& l = lat.links[i];
    const float through =
        lat.nodes[l.src].alpha + l.graph_w + l.ac_w + dl.beta_v[l.dst];
    if (through <= cutoff) dl.kept.push_back(static_cast<int32_t>(i));
  }
  // log-semiring forward-backward over KEPT links for posteriors
  dl.alpha_l.assign(N, -kInf);
  dl.beta_l.assign(N, -kInf);
  dl.alpha_l[0] = 0.0f;
  dl.beta_l[dl.sink] = 0.0f;
  std::vector<std::vector<int32_t>> kout(N), kin(N);
  for (const int32_t li : dl.kept) {
    kout[lat.links[li].src].push_back(li);
    kin[lat.links[li].dst].push_back(li);
  }
  for (const int32_t n : order)
    for (const int32_t li : kin[n]) {
      const Link& l = lat.links[li];
      dl.alpha_l[n] =
          logaddf(dl.alpha_l[n], dl.alpha_l[l.src] - l.graph_w - l.ac_w);
    }
  for (auto it = order.rbegin(); it != order.rend(); ++it)
    for (const int32_t li : kout[*it]) {
      const Link& l = lat.links[li];
      dl.beta_l[*it] =
          logaddf(dl.beta_l[*it], dl.beta_l[l.dst] - l.graph_w - l.ac_w);
    }
  const float total = dl.alpha_l[dl.sink];
  dl.post.assign(dl.kept.size(), 0.0f);
  for (size_t j = 0; j < dl.kept.size(); ++j) {
    const Link& l = lat.links[dl.kept[j]];
    const float lg =
        dl.alpha_l[l.src] - l.graph_w - l.ac_w + dl.beta_l[l.dst] - total;
    dl.post[j] = std::exp(std::min(lg, 0.0f));
  }
}

// Exact n-best over the pruned lattice: A* whose heuristic is the exact
// Viterbi completion cost beta_v (admissible AND consistent), so paths
// reach the sink in nondecreasing total-cost order. Hypotheses are
// deduplicated on their word sequence; distinct alignments of the same
// words merge into the best-scoring one (first popped).
struct PathNode {
  int32_t parent;
  int32_t link;  // link taken to get here, -1 at root
};

void nbest_from_lattice(const DecodedLattice& dl, int nbest, int max_words,
                        int pop_budget, int32_t* words, int32_t* frames,
                        int32_t* lens, float* scores, int32_t* nhyp) {
  const Lattice& lat = dl.lat;
  const size_t N = lat.nodes.size();
  std::vector<std::vector<int32_t>> kout(N);
  for (size_t j = 0; j < dl.kept.size(); ++j)
    kout[lat.links[dl.kept[j]].src].push_back(dl.kept[j]);
  std::vector<PathNode> arena;
  using QE = std::pair<float, std::pair<int32_t, float>>;
  // (f = g + beta_v, (arena idx, g)); tie-break on arena order (FIFO-ish)
  std::priority_queue<QE, std::vector<QE>, std::greater<QE>> pq;
  arena.push_back({-1, -1});
  if (dl.beta_v[0] < kInf) pq.push({dl.beta_v[0], {0, 0.0f}});
  std::unordered_set<uint64_t> seen;  // FNV-1a over word sequences
  int found = 0, pops = 0;
  while (!pq.empty() && found < nbest && pops < pop_budget) {
    auto [f, top] = pq.top();
    pq.pop();
    ++pops;
    const auto [pi, g] = top;
    // locate the lattice node this path node sits on
    int32_t node = 0;
    if (arena[pi].link >= 0) node = lat.links[arena[pi].link].dst;
    if (node == dl.sink) {
      // reconstruct words (reverse), dedup, emit
      std::vector<int32_t> ws, fs;
      for (int32_t i = pi; arena[i].link >= 0; i = arena[i].parent) {
        const Link& l = lat.links[arena[i].link];
        if (l.word != 0) {
          ws.push_back(l.word);
          fs.push_back(l.frame);
        }
      }
      std::reverse(ws.begin(), ws.end());
      std::reverse(fs.begin(), fs.end());
      uint64_t h = 1469598103934665603ull;
      for (const int32_t w : ws) {
        h ^= static_cast<uint64_t>(static_cast<uint32_t>(w));
        h *= 1099511628211ull;
      }
      if (!seen.insert(h).second) continue;
      const int n = std::min<int>(ws.size(), max_words);
      int32_t* wrow = words + static_cast<size_t>(found) * max_words;
      int32_t* frow = frames + static_cast<size_t>(found) * max_words;
      for (int i = 0; i < n; ++i) {
        wrow[i] = ws[i];
        frow[i] = fs[i];
      }
      lens[found] = n;
      scores[found] = -g;
      ++found;
      continue;
    }
    for (const int32_t li : kout[node]) {
      const Link& l = lat.links[li];
      const float ng = g + l.graph_w + l.ac_w;
      const float nf = ng + dl.beta_v[l.dst];
      if (nf >= kInf) continue;
      arena.push_back({pi, li});
      pq.push({nf, {static_cast<int32_t>(arena.size()) - 1, ng}});
    }
  }
  *nhyp = found;
}

void decode_one(const float* lp, int T, int C, int start,
                const int32_t* arc_off, const int32_t* arc_ilabel,
                const int32_t* arc_olabel, const int32_t* arc_dst,
                const float* arc_weight, const float* final_w, int blank,
                float beam, int max_active, float lat_beam, float asc,
                int nbest, int max_words, int32_t* words, int32_t* frames,
                float* conf, int32_t* lens, float* scores, int32_t* nhyp,
                int32_t* reached_final) {
  DecodedLattice dl;
  build_lattice(lp, T, C, start, arc_off, arc_ilabel, arc_olabel, arc_dst,
                arc_weight, final_w, blank, beam, max_active, lat_beam, asc,
                dl);
  finish_lattice(dl, lat_beam);
  *reached_final = dl.reached_final ? 1 : 0;
  // pop budget: generous multiple of what an n-best needs on real
  // lattices, bounded so adversarial dense lattices cannot spin forever
  const int budget = std::max(10000, nbest * 200);
  nbest_from_lattice(dl, nbest, max_words, budget, words, frames, lens,
                     scores, nhyp);
  // Time-anchored word posteriors for the best hypothesis: a raw-lattice
  // link posterior fragments one word occurrence across its alignments
  // (same word, different emission frame -> different links), so the
  // word's confidence is the posterior MASS of all kept same-word links
  // inside the best path's word time window (midpoints between adjacent
  // best-path word frames — CTM-style confidence).
  if (conf != nullptr && *nhyp > 0) {
    const int n = lens[0];
    if (n > 0) {
      std::vector<float> lo(n, -2.0f), hi(n, static_cast<float>(T) + 1.0f);
      for (int i = 0; i + 1 < n; ++i) {
        const float mid = 0.5f * (frames[i] + frames[i + 1]);
        hi[i] = mid;
        lo[i + 1] = mid;
      }
      std::fill(conf, conf + n, 0.0f);
      for (size_t j = 0; j < dl.kept.size(); ++j) {
        const Link& l = dl.lat.links[dl.kept[j]];
        if (l.word == 0) continue;
        const float f = static_cast<float>(l.frame);
        for (int i = 0; i < n; ++i)
          if (l.word == words[i] && f > lo[i] && f <= hi[i]) {
            conf[i] += dl.post[j];
            break;
          }
      }
      for (int i = 0; i < n; ++i) conf[i] = std::min(conf[i], 1.0f);
    }
  }
}

}  // namespace

extern "C" {

// Batched n-best lattice decode. Inputs match wfst_ctc_decode (see
// wfst_decode.cc); additions: lat_beam (Kaldi --lattice-beam), nbest,
// num_threads (<=0: hardware concurrency). Outputs, per utterance b:
//   out_words/out_frames: (B, nbest, max_words) int32, pad -1
//   out_conf:             (B, max_words) float posterior of each word of
//                         the BEST hypothesis (lattice link posterior)
//   out_lens:             (B, nbest) int32 word counts
//   out_scores:           (B, nbest) float = -(path cost incl. final)
//   out_nhyp:             (B,) int32 hypotheses actually found
//   out_final:            (B,) int32 1 iff a final state was reached
void wfst_ctc_decode_nbest(
    const float* log_probs, const int32_t* lengths, int B, int T, int C,
    int S, int A, int start, const int32_t* arc_off,
    const int32_t* arc_ilabel, const int32_t* arc_olabel,
    const int32_t* arc_dst, const float* arc_weight, const float* final_w,
    int blank, float beam, int max_active, float lat_beam,
    float acoustic_scale, int nbest, int max_words, int num_threads,
    int32_t* out_words, int32_t* out_frames, float* out_conf,
    int32_t* out_lens, float* out_scores, int32_t* out_nhyp,
    int32_t* out_final) {
  (void)S;
  (void)A;
  const size_t row_w = static_cast<size_t>(nbest) * max_words;
  std::fill(out_words, out_words + static_cast<size_t>(B) * row_w, -1);
  std::fill(out_frames, out_frames + static_cast<size_t>(B) * row_w, -1);
  std::fill(out_conf, out_conf + static_cast<size_t>(B) * max_words, 0.0f);
  std::fill(out_lens, out_lens + static_cast<size_t>(B) * nbest, 0);
  std::fill(out_scores, out_scores + static_cast<size_t>(B) * nbest, -kInf);
  auto run = [&](int b) {
    decode_one(log_probs + static_cast<size_t>(b) * T * C,
               std::min(lengths[b], T), C, start, arc_off, arc_ilabel,
               arc_olabel, arc_dst, arc_weight, final_w, blank, beam,
               max_active, lat_beam, acoustic_scale, nbest, max_words,
               out_words + static_cast<size_t>(b) * row_w,
               out_frames + static_cast<size_t>(b) * row_w,
               out_conf + static_cast<size_t>(b) * max_words,
               out_lens + static_cast<size_t>(b) * nbest,
               out_scores + static_cast<size_t>(b) * nbest, out_nhyp + b,
               out_final + b);
  };
  int nthr = num_threads > 0
                 ? num_threads
                 : static_cast<int>(std::thread::hardware_concurrency());
  nthr = std::max(1, std::min(nthr, B));
  if (nthr == 1) {
    for (int b = 0; b < B; ++b) run(b);
    return;
  }
  std::vector<std::thread> pool;
  pool.reserve(nthr);
  for (int t = 0; t < nthr; ++t)
    pool.emplace_back([&, t]() {
      for (int b = t; b < B; b += nthr) run(b);
    });
  for (auto& th : pool) th.join();
}

// Single-utterance pruned-lattice dump (for --write-lattice /
// Kaldi-style text export). Caller passes caps; returns 0 on success,
// -1 when a cap is too small (counts then hold the required sizes).
// Nodes: id 0 = source (before frame 0), last id = sink. Links carry
// split graph/acoustic costs and the link posterior.
int32_t wfst_ctc_lattice(
    const float* log_probs, int T, int C, int S, int A, int start,
    const int32_t* arc_off, const int32_t* arc_ilabel,
    const int32_t* arc_olabel, const int32_t* arc_dst,
    const float* arc_weight, const float* final_w, int blank, float beam,
    int max_active, float lat_beam, float acoustic_scale, int max_nodes,
    int max_links, int32_t* node_frame, int32_t* node_state,
    int32_t* link_src, int32_t* link_dst, int32_t* link_word,
    int32_t* link_frame, float* link_graph_w, float* link_ac_w,
    float* link_post, int32_t* counts, float* best_cost,
    int32_t* reached_final) {
  (void)S;
  (void)A;
  DecodedLattice dl;
  build_lattice(log_probs, T, C, start, arc_off, arc_ilabel, arc_olabel,
                arc_dst, arc_weight, final_w, blank, beam, max_active,
                lat_beam, acoustic_scale, dl);
  finish_lattice(dl, lat_beam);
  *reached_final = dl.reached_final ? 1 : 0;
  *best_cost = dl.best_cost;
  // Re-index: emit only nodes touched by kept links (plus source/sink).
  const size_t N = dl.lat.nodes.size();
  std::vector<int32_t> remap(N, -1);
  int32_t nn = 0;
  remap[0] = nn++;
  for (const int32_t li : dl.kept) {
    const Link& l = dl.lat.links[li];
    if (remap[l.src] < 0) remap[l.src] = nn++;
    if (remap[l.dst] < 0) remap[l.dst] = nn++;
  }
  if (remap[dl.sink] < 0) remap[dl.sink] = nn++;
  counts[0] = nn;
  counts[1] = static_cast<int32_t>(dl.kept.size());
  if (nn > max_nodes || counts[1] > max_links) return -1;
  for (size_t n = 0; n < N; ++n) {
    if (remap[n] < 0) continue;
    node_frame[remap[n]] = dl.lat.nodes[n].frame;
    node_state[remap[n]] = dl.lat.nodes[n].state;
  }
  for (size_t j = 0; j < dl.kept.size(); ++j) {
    const Link& l = dl.lat.links[dl.kept[j]];
    link_src[j] = remap[l.src];
    link_dst[j] = remap[l.dst];
    link_word[j] = l.word;
    link_frame[j] = l.frame;
    link_graph_w[j] = l.graph_w;
    link_ac_w[j] = l.ac_w;
    link_post[j] = dl.post[j];
  }
  return 0;
}

}  // extern "C"
