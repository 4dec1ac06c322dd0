// Host-native first-pass CTC decoding over an arbitrary WFST — the
// rebuild's analogue of the reference's Kaldi latgen-faster binding
// (SURVEY.md section 2.1 latgen row / 3.4): the decoder that walks a
// user-supplied decoding graph (e.g. a Kaldi-built TLG.fst, loaded by
// tpuasr.decode.fst.WFST) directly against AM posteriors, instead of
// rescoring an already-pruned CTC n-best.
//
// Algorithm: tropical-semiring Viterbi token passing with the CTC
// topology applied implicitly (EESEN-style). A token lives on a pair
// (fst_state, last_frame_symbol); per frame each token can
//   * emit blank          -> (s, blank)            cost += -asc*lp[blank]
//   * re-emit last symbol -> (s, u), u != blank    cost += -asc*lp[u]
//     (CTC collapses repeats: no graph advance)
//   * emit a NEW symbol k != u via every arc (s -k:o/w-> d)
//                         -> (d, k)                cost += w - asc*lp[k]
// followed by an input-epsilon closure (best-first relaxation; epsilon
// arcs consume no frame, may carry weight and output labels), then
// beam + max-active pruning. Word outputs are recovered through a
// backpointer arena written only when an arc with olabel != 0 is
// traversed, so memory scales with emitted words, not frames.
//
// Exposed with a plain C ABI for ctypes (no pybind11 in this
// environment); the Python wrapper (tpuasr/decode/fst_decode.py)
// flattens the WFST to the CSR arrays consumed here and carries a
// line-for-line Python oracle used by the tests.
//
// Build: see native/Makefile (g++ -O3 -shared -fPIC).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <queue>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

constexpr float kInf = 1e30f;

struct Tok {
  float cost;
  int32_t trace;  // index into the traceback arena, -1 = none
};

struct Trace {
  int32_t parent;
  int32_t olabel;
  int32_t frame;
};

inline uint64_t key_of(int32_t state, int32_t last) {
  return (static_cast<uint64_t>(static_cast<uint32_t>(state)) << 32) |
         static_cast<uint32_t>(last);
}
inline int32_t state_of(uint64_t k) { return static_cast<int32_t>(k >> 32); }

using TokMap = std::unordered_map<uint64_t, Tok>;

// Input-epsilon closure: best-first relaxation over ilabel==0 arcs.
// Exact for non-negative epsilon weights (Dijkstra); re-insertion on
// improvement also handles the occasional negative pushed weight as
// long as no negative epsilon cycle exists (OpenFst graphs never have
// one — it would make shortest distances undefined).
void eps_closure(TokMap& toks, const int32_t* arc_off,
                 const int32_t* arc_ilabel, const int32_t* arc_olabel,
                 const int32_t* arc_dst, const float* arc_weight,
                 std::vector<Trace>& arena, int32_t frame) {
  using QE = std::pair<float, uint64_t>;
  std::priority_queue<QE, std::vector<QE>, std::greater<QE>> pq;
  for (const auto& kv : toks) pq.push({kv.second.cost, kv.first});
  while (!pq.empty()) {
    auto [c, k] = pq.top();
    pq.pop();
    auto it = toks.find(k);
    if (it == toks.end() || it->second.cost < c) continue;  // stale entry
    const int32_t s = state_of(k);
    const uint64_t last_bits = k & 0xffffffffull;
    const int32_t tr = it->second.trace;
    for (int32_t a = arc_off[s]; a < arc_off[s + 1]; ++a) {
      if (arc_ilabel[a] != 0) continue;
      const float nc = c + arc_weight[a];
      const uint64_t nk =
          (static_cast<uint64_t>(static_cast<uint32_t>(arc_dst[a])) << 32) |
          last_bits;  // epsilon moves the graph, not the frame symbol
      auto ins = toks.emplace(nk, Tok{nc, -1});
      if (!ins.second && ins.first->second.cost <= nc) continue;
      int32_t ntr = tr;
      if (arc_olabel[a] != 0) {
        ntr = static_cast<int32_t>(arena.size());
        arena.push_back({tr, arc_olabel[a], frame});
      }
      ins.first->second = Tok{nc, ntr};
      pq.push({nc, nk});
    }
  }
}

void prune(TokMap& toks, float beam, int max_active) {
  if (toks.empty()) return;
  float best = kInf;
  for (const auto& kv : toks) best = std::min(best, kv.second.cost);
  float cutoff = best + beam;
  if (max_active > 0 && static_cast<int>(toks.size()) > max_active) {
    std::vector<float> costs;
    costs.reserve(toks.size());
    for (const auto& kv : toks)
      if (kv.second.cost <= cutoff) costs.push_back(kv.second.cost);
    if (static_cast<int>(costs.size()) > max_active) {
      std::nth_element(costs.begin(), costs.begin() + max_active - 1,
                       costs.end());
      cutoff = std::min(cutoff, costs[max_active - 1]);
    }
  }
  for (auto it = toks.begin(); it != toks.end();)
    it = it->second.cost > cutoff ? toks.erase(it) : std::next(it);
}

void decode_single(const float* lp, int T, int C, int S, int start,
                   const int32_t* arc_off, const int32_t* arc_ilabel,
                   const int32_t* arc_olabel, const int32_t* arc_dst,
                   const float* arc_weight, const float* final_w, int blank,
                   float beam, int max_active, float asc, int max_words,
                   int32_t* out_words, int32_t* out_frames, int32_t* out_len,
                   float* out_score, int32_t* out_final) {
  (void)S;
  std::vector<Trace> arena;
  TokMap toks;
  toks.emplace(key_of(start, blank), Tok{0.0f, -1});
  eps_closure(toks, arc_off, arc_ilabel, arc_olabel, arc_dst, arc_weight,
              arena, -1);
  for (int t = 0; t < T; ++t) {
    const float* p = lp + static_cast<size_t>(t) * C;
    TokMap nxt;
    nxt.reserve(toks.size() * 2);
    auto relax = [&nxt](uint64_t k, float c, int32_t tr) {
      auto ins = nxt.emplace(k, Tok{c, tr});
      if (!ins.second && c < ins.first->second.cost)
        ins.first->second = Tok{c, tr};
    };
    for (const auto& kv : toks) {
      const int32_t s = state_of(kv.first);
      const int32_t u = static_cast<int32_t>(kv.first & 0xffffffffull);
      const float c = kv.second.cost;
      const int32_t tr = kv.second.trace;
      relax(key_of(s, blank), c - asc * p[blank], tr);  // emit blank
      if (u != blank)                                   // CTC repeat: stay
        relax(kv.first, c - asc * p[u], tr);
      for (int32_t a = arc_off[s]; a < arc_off[s + 1]; ++a) {
        const int32_t k = arc_ilabel[a];
        if (k == 0 || k == u || k >= C) continue;  // eps handled in closure
        const float nc = c + arc_weight[a] - asc * p[k];
        int32_t ntr = tr;
        if (arc_olabel[a] != 0) {
          ntr = static_cast<int32_t>(arena.size());
          arena.push_back({tr, arc_olabel[a], t});
        }
        relax(key_of(arc_dst[a], k), nc, ntr);
      }
    }
    toks.swap(nxt);
    eps_closure(toks, arc_off, arc_ilabel, arc_olabel, arc_dst, arc_weight,
                arena, t);
    prune(toks, beam, max_active);
  }
  // Best final token; fall back to the best live token (partial
  // hypothesis, reached_final=0) when nothing survives on a final state
  // — the latgen-faster "no final state reached" behavior.
  float best_f = kInf, best_any = kInf;
  int32_t tr_f = -1, tr_any = -1;
  for (const auto& kv : toks) {
    const float fw = final_w[state_of(kv.first)];
    if (kv.second.cost < best_any) {
      best_any = kv.second.cost;
      tr_any = kv.second.trace;
    }
    if (fw < kInf && kv.second.cost + fw < best_f) {
      best_f = kv.second.cost + fw;
      tr_f = kv.second.trace;
    }
  }
  const bool final_ok = best_f < kInf;
  *out_final = final_ok ? 1 : 0;
  *out_score = (final_ok || best_any < kInf)
                   ? -(final_ok ? best_f : best_any)
                   : -kInf;
  std::vector<int32_t> words, frames;
  for (int32_t i = final_ok ? tr_f : tr_any; i >= 0; i = arena[i].parent) {
    words.push_back(arena[i].olabel);
    frames.push_back(arena[i].frame);
  }
  std::reverse(words.begin(), words.end());
  std::reverse(frames.begin(), frames.end());
  const int n = std::min<int>(words.size(), max_words);
  *out_len = n;
  for (int i = 0; i < n; ++i) {
    out_words[i] = words[i];
    out_frames[i] = frames[i];
  }
}

}  // namespace

extern "C" {

// log_probs: (B, T, C) row-major log-softmax AM outputs; lengths: (B)
// valid frame counts. FST in CSR form: arc_off (S+1; arcs of state s are
// [arc_off[s], arc_off[s+1])), arc_{ilabel,olabel,dst} (A) int32,
// arc_weight (A) float tropical costs, final_w (S) final costs (>=1e30
// for non-final states). ilabel convention matches tpuasr.decode.fst:
// 0 = epsilon, k>0 = CTC class k (blank never appears as an ilabel);
// olabel 0 = epsilon. Outputs: out_words/out_frames (B, max_words)
// pad -1, out_lens (B), out_scores (B) = -(best path cost, final weight
// included when reached), out_final (B) 1 iff a final state was reached.
void wfst_ctc_decode(const float* log_probs, const int32_t* lengths, int B,
                     int T, int C, int S, int A, int start,
                     const int32_t* arc_off, const int32_t* arc_ilabel,
                     const int32_t* arc_olabel, const int32_t* arc_dst,
                     const float* arc_weight, const float* final_w, int blank,
                     float beam, int max_active, float acoustic_scale,
                     int max_words, int num_threads, int32_t* out_words,
                     int32_t* out_frames, int32_t* out_lens,
                     float* out_scores, int32_t* out_final) {
  (void)A;
  auto run = [&](int b) {
    std::fill(out_words + static_cast<size_t>(b) * max_words,
              out_words + static_cast<size_t>(b + 1) * max_words, -1);
    std::fill(out_frames + static_cast<size_t>(b) * max_words,
              out_frames + static_cast<size_t>(b + 1) * max_words, -1);
    decode_single(log_probs + static_cast<size_t>(b) * T * C,
                  std::min(lengths[b], T), C, S, start, arc_off, arc_ilabel,
                  arc_olabel, arc_dst, arc_weight, final_w, blank, beam,
                  max_active, acoustic_scale, max_words,
                  out_words + static_cast<size_t>(b) * max_words,
                  out_frames + static_cast<size_t>(b) * max_words,
                  out_lens + b, out_scores + b, out_final + b);
  };
  // Utterances are independent: thread the batch (the reference's latgen
  // walked the graph single-threaded per process; host threads are the
  // natural batch axis here).
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

}  // extern "C"
