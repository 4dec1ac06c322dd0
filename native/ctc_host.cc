// Host-native CTC decode + scoring library (C++), the rebuild's analogue of
// the reference's native components (warp-ctc loss and the asr/kaldi latgen
// decoder binding — SURVEY.md section 2.2). The TPU path decodes on device
// (tpuasr.decode.prefix_beam); this library provides:
//   * ctc_beam_search  — exact prefix beam search on host posteriors
//                        (CPU fallback + cross-check oracle for the device
//                        kernel; unordered-map prefix merge, no hashing
//                        approximation)
//   * ctc_greedy      — argmax/collapse decode
//   * edit_distance   — Levenshtein, for fast corpus WER
// Exposed with a plain C ABI for ctypes (no pybind11 in this environment).
//
// Build: see native/Makefile (g++ -O3 -shared -fPIC).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

constexpr float kNegInf = -1e30f;

inline float logaddexp(float a, float b) {
  if (a < b) std::swap(a, b);
  if (b <= kNegInf * 0.5f) return a;
  return a + std::log1p(std::exp(b - a));
}

struct PrefixState {
  float p_b = kNegInf;   // log prob of prefix ending in blank
  float p_nb = kNegInf;  // log prob of prefix ending in non-blank
  float total() const { return logaddexp(p_b, p_nb); }
};

struct VecHash {
  size_t operator()(const std::vector<int32_t>& v) const {
    size_t h = 1469598103934665603ull;
    for (int32_t x : v) {
      h ^= static_cast<size_t>(x) + 0x9e3779b97f4a7c15ull;
      h *= 1099511628211ull;
    }
    return h;
  }
};

using BeamMap =
    std::unordered_map<std::vector<int32_t>, PrefixState, VecHash>;

}  // namespace

extern "C" {

// log_probs: (T, C) row-major for ONE utterance; returns tokens in
// out_tokens (<= max_len, pad -1), length in *out_len, score in *out_score.
void ctc_beam_search_single(const float* log_probs, int T, int C, int beam,
                            int topk, int blank, int max_len,
                            int32_t* out_tokens, int32_t* out_len,
                            float* out_score) {
  BeamMap beams;
  beams[{}] = PrefixState{0.0f, kNegInf};
  std::vector<int> cls(C);

  for (int t = 0; t < T; ++t) {
    const float* lp = log_probs + static_cast<size_t>(t) * C;
    // Top-k non-blank classes this frame.
    cls.clear();
    for (int c = 0; c < C; ++c)
      if (c != blank) cls.push_back(c);
    int keep = std::min<int>(topk, static_cast<int>(cls.size()));
    std::partial_sort(cls.begin(), cls.begin() + keep, cls.end(),
                      [&](int a, int b) { return lp[a] > lp[b]; });
    cls.resize(keep);

    BeamMap next;
    next.reserve(beams.size() * (keep + 1));
    for (const auto& [prefix, st] : beams) {
      const float p_tot = st.total();
      // Stay: emit blank.
      {
        PrefixState& ns = next[prefix];
        ns.p_b = logaddexp(ns.p_b, p_tot + lp[blank]);
        // Stay: repeat last non-blank.
        if (!prefix.empty())
          ns.p_nb = logaddexp(ns.p_nb, st.p_nb + lp[prefix.back()]);
      }
      // Extend with c.
      for (int c : cls) {
        float base = (!prefix.empty() && prefix.back() == c) ? st.p_b : p_tot;
        if (base <= kNegInf * 0.5f) continue;
        if (static_cast<int>(prefix.size()) >= max_len) continue;
        std::vector<int32_t> ext = prefix;
        ext.push_back(c);
        PrefixState& ns = next[ext];
        ns.p_nb = logaddexp(ns.p_nb, base + lp[c]);
      }
    }
    // Prune to beam.
    if (static_cast<int>(next.size()) > beam) {
      std::vector<std::pair<float, const std::vector<int32_t>*>> scored;
      scored.reserve(next.size());
      for (const auto& [prefix, st] : next)
        scored.emplace_back(st.total(), &prefix);
      std::nth_element(
          scored.begin(), scored.begin() + beam - 1, scored.end(),
          [](const auto& a, const auto& b) { return a.first > b.first; });
      float cutoff = scored[beam - 1].first;
      BeamMap pruned;
      pruned.reserve(beam);
      int taken = 0;
      for (const auto& [prefix, st] : next) {
        if (st.total() >= cutoff && taken < beam) {
          pruned.emplace(prefix, st);
          ++taken;
        }
      }
      next.swap(pruned);
    }
    beams.swap(next);
  }

  const std::vector<int32_t>* best = nullptr;
  float best_score = kNegInf;
  for (const auto& [prefix, st] : beams) {
    float s = st.total();
    if (s > best_score) {
      best_score = s;
      best = &prefix;
    }
  }
  std::fill(out_tokens, out_tokens + max_len, -1);
  *out_len = 0;
  *out_score = best_score;
  if (best != nullptr) {
    *out_len = static_cast<int32_t>(best->size());
    std::copy(best->begin(), best->end(), out_tokens);
  }
}

// Batched wrapper: log_probs (B, T, C), lengths (B,).
void ctc_beam_search(const float* log_probs, const int32_t* lengths, int B,
                     int T, int C, int beam, int topk, int blank, int max_len,
                     int32_t* out_tokens, int32_t* out_lens,
                     float* out_scores) {
  for (int b = 0; b < B; ++b) {
    ctc_beam_search_single(log_probs + static_cast<size_t>(b) * T * C,
                           lengths[b], C, beam, topk, blank, max_len,
                           out_tokens + static_cast<size_t>(b) * max_len,
                           out_lens + b, out_scores + b);
  }
}

void ctc_greedy(const float* log_probs, const int32_t* lengths, int B, int T,
                int C, int blank, int32_t* out_tokens, int32_t* out_lens) {
  for (int b = 0; b < B; ++b) {
    const float* lp = log_probs + static_cast<size_t>(b) * T * C;
    int32_t* out = out_tokens + static_cast<size_t>(b) * T;
    std::fill(out, out + T, -1);
    int n = 0;
    int prev = blank;
    for (int t = 0; t < lengths[b]; ++t) {
      const float* row = lp + static_cast<size_t>(t) * C;
      int arg = static_cast<int>(
          std::max_element(row, row + C) - row);
      if (arg != blank && arg != prev) out[n++] = arg;
      prev = arg;
    }
    out_lens[b] = n;
  }
}

int32_t edit_distance(const int32_t* a, int na, const int32_t* b, int nb) {
  std::vector<int32_t> prev(nb + 1), cur(nb + 1);
  for (int j = 0; j <= nb; ++j) prev[j] = j;
  for (int i = 1; i <= na; ++i) {
    cur[0] = i;
    for (int j = 1; j <= nb; ++j) {
      int sub = prev[j - 1] + (a[i - 1] != b[j - 1]);
      cur[j] = std::min({prev[j] + 1, cur[j - 1] + 1, sub});
    }
    std::swap(prev, cur);
  }
  return prev[nb];
}

}  // extern "C"
