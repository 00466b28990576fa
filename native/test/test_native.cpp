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
                                 V, B, T, U, costs.data(), nullptr, opt);
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
                                 V, B, T, U, costs.data(), nullptr, opt);
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
                    costs_d.data(), nullptr, opt) != WTT_STATUS_SUCCESS)
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

// Caller-workspace path must be bit-identical to internal allocation and
// honor the zero-allocation contract (reference rnnt.h:139-143).
static bool workspace_test() {
  const int B = 2, T = 9, U = 5, V = 7;
  std::mt19937 gen(3);
  std::uniform_real_distribution<float> dist(-1.f, 1.f);
  std::vector<float> acts(static_cast<size_t>(B) * T * U * V);
  for (auto& x : acts) x = dist(gen);
  std::vector<int> labels(B * (U - 1));
  std::uniform_int_distribution<int> ldist(1, V - 1);
  for (auto& l : labels) l = ldist(gen);
  std::vector<int> label_lengths = {4, 2};
  std::vector<int> input_lengths = {9, 6};
  wttOptions opt{};

  std::vector<float> c0(B), g0(acts.size()), c1(B), g1(acts.size());
  if (wtt_rnnt_loss(acts.data(), g0.data(), labels.data(),
                    label_lengths.data(), input_lengths.data(), V, B, T, U,
                    c0.data(), nullptr, opt) != WTT_STATUS_SUCCESS)
    return false;

  size_t ws_bytes = 0;
  if (wtt_get_workspace_size(T, U, B, 0, &ws_bytes) != WTT_STATUS_SUCCESS)
    return false;
  std::vector<unsigned char> ws(ws_bytes, 0xCD);
  if (wtt_rnnt_loss(acts.data(), g1.data(), labels.data(),
                    label_lengths.data(), input_lengths.data(), V, B, T, U,
                    c1.data(), ws.data(), opt) != WTT_STATUS_SUCCESS)
    return false;

  for (int b = 0; b < B; ++b)
    if (c0[b] != c1[b]) return false;
  for (size_t i = 0; i < g0.size(); ++i)
    if (g0[i] != g1[i]) return false;
  std::printf("workspace_test: caller workspace bit-identical (%zu bytes)\n",
              ws_bytes);
  return true;
}

// Pruned loss with a band covering the whole lattice == dense loss, and the
// banded gradient cells equal the dense gradient at the same lattice cells.
static bool pruned_test() {
  const int B = 2, T = 8, U = 4, V = 6, S = U;
  std::mt19937 gen(21);
  std::uniform_real_distribution<float> dist(-1.f, 1.f);
  std::vector<float> acts(static_cast<size_t>(B) * T * U * V);
  for (auto& x : acts) x = dist(gen);
  std::vector<int> labels(B * (U - 1));
  std::uniform_int_distribution<int> ldist(1, V - 1);
  for (auto& l : labels) l = ldist(gen);
  std::vector<int> label_lengths = {3, 2};
  std::vector<int> input_lengths = {8, 5};
  std::vector<int> ranges(B * T, 0);  // full-width band: starts all 0
  wttOptions opt{};

  std::vector<float> cd(B), gd(acts.size());
  if (wtt_rnnt_loss(acts.data(), gd.data(), labels.data(),
                    label_lengths.data(), input_lengths.data(), V, B, T, U,
                    cd.data(), nullptr, opt) != WTT_STATUS_SUCCESS)
    return false;

  // with S == U and ranges == 0, the band IS the lattice: same acts layout
  std::vector<float> cp(B), gp(acts.size());
  if (wtt_rnnt_loss_pruned(acts.data(), gp.data(), ranges.data(),
                           labels.data(), label_lengths.data(),
                           input_lengths.data(), V, B, T, S, U - 1,
                           cp.data(), nullptr, opt) != WTT_STATUS_SUCCESS)
    return false;

  for (int b = 0; b < B; ++b)
    if (!close(cp[b], cd[b], 1e-4)) {
      std::printf("pruned_test cost[%d]: %f vs dense %f\n", b, cp[b], cd[b]);
      return false;
    }
  for (size_t i = 0; i < gd.size(); ++i)
    if (!close(gp[i], gd[i], 1e-4)) {
      std::printf("pruned_test grad[%zu]: %f vs dense %f\n", i, gp[i], gd[i]);
      return false;
    }

  // a genuinely narrow band (S=2) on a diagonal range: loss must be finite,
  // >= dense loss (fewer paths), grads NaN-free, and the workspace path
  // bit-identical
  const int S2 = 2;
  std::vector<int> r2(B * T);
  for (int b = 0; b < B; ++b) {
    const int Ub = label_lengths[b] + 1;
    const int Tb = input_lengths[b];
    for (int t = 0; t < T; ++t) {
      int r = (t * (Ub - 1)) / (Tb > 1 ? Tb - 1 : 1);
      if (r > Ub - S2) r = Ub - S2;
      if (r < 0) r = 0;
      r2[b * T + t] = (t == 0) ? 0 : r;
    }
    // enforce monotone, step<=S2-1 (defensive; the formula already is)
    for (int t = 1; t < T; ++t) {
      if (r2[b * T + t] < r2[b * T + t - 1]) r2[b * T + t] = r2[b * T + t - 1];
      if (r2[b * T + t] - r2[b * T + t - 1] > S2 - 1)
        r2[b * T + t] = r2[b * T + t - 1] + S2 - 1;
    }
  }
  std::vector<float> acts2(static_cast<size_t>(B) * T * S2 * V);
  for (int b = 0; b < B; ++b)
    for (int t = 0; t < T; ++t)
      for (int s = 0; s < S2; ++s) {
        int u = r2[b * T + t] + s;
        if (u > U - 1) u = U - 1;
        for (int v = 0; v < V; ++v)
          acts2[((static_cast<size_t>(b) * T + t) * S2 + s) * V + v] =
              acts[((static_cast<size_t>(b) * T + t) * U + u) * V + v];
      }
  std::vector<float> cp2(B), gp2(acts2.size());
  if (wtt_rnnt_loss_pruned(acts2.data(), gp2.data(), r2.data(), labels.data(),
                           label_lengths.data(), input_lengths.data(), V, B,
                           T, S2, U - 1, cp2.data(), nullptr,
                           opt) != WTT_STATUS_SUCCESS)
    return false;
  for (int b = 0; b < B; ++b) {
    if (!std::isfinite(cp2[b])) return false;
    if (cp2[b] < cd[b] - 1e-4) {
      std::printf("pruned_test narrow cost[%d] %f < dense %f\n", b, cp2[b], cd[b]);
      return false;
    }
  }
  for (float g : gp2)
    if (std::isnan(g)) return false;

  size_t ws_bytes = 0;
  if (wtt_get_workspace_size(T, S2, B, 0, &ws_bytes) != WTT_STATUS_SUCCESS)
    return false;
  std::vector<unsigned char> ws(ws_bytes, 0xCD);
  std::vector<float> cp3(B), gp3(acts2.size());
  if (wtt_rnnt_loss_pruned(acts2.data(), gp3.data(), r2.data(), labels.data(),
                           label_lengths.data(), input_lengths.data(), V, B,
                           T, S2, U - 1, cp3.data(), ws.data(),
                           opt) != WTT_STATUS_SUCCESS)
    return false;
  for (int b = 0; b < B; ++b)
    if (cp3[b] != cp2[b]) return false;
  for (size_t i = 0; i < gp2.size(); ++i)
    if (gp3[i] != gp2[i]) return false;

  std::printf("pruned_test: full band == dense (%f, %f); narrow band %f %f\n",
              cp[0], cp[1], cp2[0], cp2[1]);
  return true;
}

// fused joint engine vs the dense engine on the materialised
// tanh(e + p) @ W + bias, costs and all four gradients (dW/db checked by
// chain rule through the materialisation).
static bool fused_test() {
  const int B = 2, T = 6, U = 4, V = 7, H = 5;
  std::mt19937 gen(31);
  std::uniform_real_distribution<double> dist(-1.0, 1.0);
  std::vector<double> e(static_cast<size_t>(B) * T * H),
      p(static_cast<size_t>(B) * U * H), W(static_cast<size_t>(H) * V),
      bias(V);
  for (auto& x : e) x = dist(gen);
  for (auto& x : p) x = dist(gen);
  for (auto& x : W) x = dist(gen) / std::sqrt(double(H));
  for (auto& x : bias) x = dist(gen) * 0.1;
  std::vector<int> labels(B * (U - 1));
  std::uniform_int_distribution<int> ldist(1, V - 1);
  for (auto& l : labels) l = ldist(gen);
  std::vector<int> label_lengths = {3, 2};
  std::vector<int> input_lengths = {6, 4};
  wttOptions opt{};

  // materialise acts and tanh(h) for the reference path
  std::vector<double> acts(static_cast<size_t>(B) * T * U * V);
  std::vector<double> hbuf(static_cast<size_t>(B) * T * U * H);
  for (int b = 0; b < B; ++b)
    for (int t = 0; t < T; ++t)
      for (int u = 0; u < U; ++u) {
        const size_t cell = (static_cast<size_t>(b) * T + t) * U + u;
        double* hc = &hbuf[cell * H];
        for (int i = 0; i < H; ++i)
          hc[i] = std::tanh(e[(static_cast<size_t>(b) * T + t) * H + i] +
                            p[(static_cast<size_t>(b) * U + u) * H + i]);
        for (int v = 0; v < V; ++v) {
          double s = bias[v];
          for (int i = 0; i < H; ++i) s += hc[i] * W[static_cast<size_t>(i) * V + v];
          acts[cell * V + v] = s;
        }
      }

  std::vector<double> cd(B), gd(acts.size());
  if (wtt_rnnt_loss_fp64(acts.data(), gd.data(), labels.data(),
                         label_lengths.data(), input_lengths.data(), V, B, T,
                         U, cd.data(), nullptr, opt) != WTT_STATUS_SUCCESS)
    return false;

  std::vector<double> cf(B), de(e.size()), dp(p.size()), dW(W.size()), db(V);
  if (wtt_rnnt_loss_fused_joint_fp64(
          e.data(), p.data(), W.data(), bias.data(), de.data(), dp.data(),
          dW.data(), db.data(), labels.data(), label_lengths.data(),
          input_lengths.data(), H, V, B, T, U, cf.data(), nullptr,
          opt) != WTT_STATUS_SUCCESS)
    return false;

  for (int b = 0; b < B; ++b)
    if (!close(cf[b], cd[b], 1e-8)) {
      std::printf("fused_test cost[%d]: %f vs dense %f\n", b, cf[b], cd[b]);
      return false;
    }

  // chain rule through the materialisation: reference de/dp/dW/db from gd
  std::vector<double> de_r(e.size(), 0), dp_r(p.size(), 0), dW_r(W.size(), 0),
      db_r(V, 0);
  for (int b = 0; b < B; ++b)
    for (int t = 0; t < T; ++t)
      for (int u = 0; u < U; ++u) {
        const size_t cell = (static_cast<size_t>(b) * T + t) * U + u;
        const double* g = &gd[cell * V];
        const double* hc = &hbuf[cell * H];
        for (int v = 0; v < V; ++v) db_r[v] += g[v];
        for (int i = 0; i < H; ++i) {
          double acc = 0;
          for (int v = 0; v < V; ++v) {
            acc += W[static_cast<size_t>(i) * V + v] * g[v];
            dW_r[static_cast<size_t>(i) * V + v] += hc[i] * g[v];
          }
          const double dh = acc * (1.0 - hc[i] * hc[i]);
          de_r[(static_cast<size_t>(b) * T + t) * H + i] += dh;
          dp_r[(static_cast<size_t>(b) * U + u) * H + i] += dh;
        }
      }
  auto cmp = [&](const std::vector<double>& a, const std::vector<double>& r,
                 const char* name) {
    for (size_t i = 0; i < a.size(); ++i)
      if (!close(a[i], r[i], 1e-8)) {
        std::printf("fused_test %s[%zu]: %g vs %g\n", name, i, a[i], r[i]);
        return false;
      }
    return true;
  };
  if (!cmp(de, de_r, "de") || !cmp(dp, dp_r, "dp") || !cmp(dW, dW_r, "dW") ||
      !cmp(db, db_r, "db"))
    return false;

  // mixed grad pointers must be rejected
  if (wtt_rnnt_loss_fused_joint_fp64(
          e.data(), p.data(), W.data(), bias.data(), de.data(), nullptr,
          nullptr, nullptr, labels.data(), label_lengths.data(),
          input_lengths.data(), H, V, B, T, U, cf.data(), nullptr,
          opt) != WTT_STATUS_BAD_ARGUMENT)
    return false;

  std::printf("fused_test: fused == dense via chain rule (%f, %f)\n", cf[0],
              cf[1]);
  return true;
}

// pruned_fused with a full-width band (S = U, ranges = 0) must equal the
// dense fused engine exactly: same lattice, same gradients.
static bool pruned_fused_test() {
  const int B = 2, T = 6, U = 4, V = 7, H = 5, S = U;
  std::mt19937 gen(47);
  std::uniform_real_distribution<double> dist(-1.0, 1.0);
  std::vector<double> e(static_cast<size_t>(B) * T * H),
      p(static_cast<size_t>(B) * U * H), W(static_cast<size_t>(H) * V),
      bias(V);
  for (auto& x : e) x = dist(gen);
  for (auto& x : p) x = dist(gen);
  for (auto& x : W) x = dist(gen) / std::sqrt(double(H));
  for (auto& x : bias) x = dist(gen) * 0.1;
  std::vector<int> labels(B * (U - 1));
  std::uniform_int_distribution<int> ldist(1, V - 1);
  for (auto& l : labels) l = ldist(gen);
  std::vector<int> label_lengths = {3, 2};
  std::vector<int> input_lengths = {6, 4};
  std::vector<int> ranges(static_cast<size_t>(B) * T, 0);
  wttOptions opt{};
  opt.fastemit_lambda = 0.25f;  // exercise the FastEmit path too

  std::vector<double> cf(B), de_f(e.size()), dp_f(p.size()),
      dW_f(W.size()), db_f(V);
  if (wtt_rnnt_loss_fused_joint_fp64(
          e.data(), p.data(), W.data(), bias.data(), de_f.data(),
          dp_f.data(), dW_f.data(), db_f.data(), labels.data(),
          label_lengths.data(), input_lengths.data(), H, V, B, T, U,
          cf.data(), nullptr, opt) != WTT_STATUS_SUCCESS)
    return false;

  std::vector<double> cp(B), de_p(e.size()), dp_p(p.size()),
      dW_p(W.size()), db_p(V);
  if (wtt_rnnt_loss_pruned_fused_fp64(
          e.data(), p.data(), W.data(), bias.data(), de_p.data(),
          dp_p.data(), dW_p.data(), db_p.data(), ranges.data(),
          labels.data(), label_lengths.data(), input_lengths.data(), H, V,
          B, T, S, U, cp.data(), nullptr, opt) != WTT_STATUS_SUCCESS)
    return false;

  for (int b = 0; b < B; ++b)
    if (!close(cp[b], cf[b], 1e-10)) {
      std::printf("pruned_fused_test cost[%d]: %f vs fused %f\n", b, cp[b],
                  cf[b]);
      return false;
    }
  auto cmp = [&](const char* name, const std::vector<double>& a,
                 const std::vector<double>& r) {
    for (size_t i = 0; i < a.size(); ++i)
      if (!close(a[i], r[i], 1e-10)) {
        std::printf("pruned_fused_test %s[%zu]: %g vs %g\n", name, i, a[i],
                    r[i]);
        return false;
      }
    return true;
  };
  if (!cmp("de", de_p, de_f) || !cmp("dp", dp_p, dp_f) ||
      !cmp("dW", dW_p, dW_f) || !cmp("db", db_p, db_f))
    return false;

  // score-only path (all grads NULL)
  std::vector<double> cs(B);
  if (wtt_rnnt_loss_pruned_fused_fp64(
          e.data(), p.data(), W.data(), bias.data(), nullptr, nullptr,
          nullptr, nullptr, ranges.data(), labels.data(),
          label_lengths.data(), input_lengths.data(), H, V, B, T, S, U,
          cs.data(), nullptr, opt) != WTT_STATUS_SUCCESS)
    return false;
  for (int b = 0; b < B; ++b)
    if (!close(cs[b], cf[b], 1e-10)) return false;

  std::printf("pruned_fused_test: full band == dense fused (%f, %f)\n",
              cp[0], cp[1]);
  return true;
}

// Multi-blank engine: K=0 must equal the dense engine exactly (costs AND
// gradients); K>0 must not lose likelihood (more paths, same weights at
// sigma=0) and must keep fwd == bwd loglik (checked via score symmetry:
// run twice with grads to exercise backward, costs finite & smaller).
static bool multiblank_test() {
  const int B = 2, T = 9, U = 4, V = 8;
  std::mt19937 gen(13);
  std::uniform_real_distribution<float> dist(-1.f, 1.f);
  std::vector<float> acts(static_cast<size_t>(B) * T * U * V);
  for (auto& x : acts) x = 2.f * dist(gen);
  std::vector<int> labels = {1, 2, 3, 4, 5, 2};  // (B, U-1)
  std::vector<int> label_lengths = {3, 2};
  std::vector<int> input_lengths = {9, 6};
  wttOptions opt{};
  opt.blank_label = 0;

  std::vector<float> c_dense(B), g_dense(acts.size());
  if (wtt_rnnt_loss(acts.data(), g_dense.data(), labels.data(),
                    label_lengths.data(), input_lengths.data(), V, B, T, U,
                    c_dense.data(), nullptr, opt) != WTT_STATUS_SUCCESS)
    return false;

  // K = 0: exact dense equality
  std::vector<float> c0(B), g0(acts.size());
  if (wtt_rnnt_loss_multiblank(acts.data(), g0.data(), labels.data(),
                               label_lengths.data(), input_lengths.data(),
                               V, B, T, U, nullptr, nullptr, 0, 0.f,
                               c0.data(), opt) != WTT_STATUS_SUCCESS)
    return false;
  for (int b = 0; b < B; ++b)
    if (!close(c0[b], c_dense[b], 1e-5)) return false;
  for (size_t i = 0; i < acts.size(); ++i)
    if (!close(g0[i], g_dense[i], 1e-5)) return false;

  // K = 2 big blanks on the last two columns: likelihood can only grow
  const int durs[2] = {2, 4};
  const int idx[2] = {V - 2, V - 1};
  std::vector<float> c2(B), g2(acts.size());
  if (wtt_rnnt_loss_multiblank(acts.data(), g2.data(), labels.data(),
                               label_lengths.data(), input_lengths.data(),
                               V, B, T, U, durs, idx, 2, 0.05f,
                               c2.data(), opt) != WTT_STATUS_SUCCESS)
    return false;
  for (int b = 0; b < B; ++b)
    if (!std::isfinite(c2[b])) return false;
  for (size_t i = 0; i < acts.size(); ++i)
    if (!std::isfinite(g2[i])) return false;
  // bad arguments rejected
  const int bad_dur[1] = {1};
  std::vector<float> cb(B);
  if (wtt_rnnt_loss_multiblank(acts.data(), nullptr, labels.data(),
                               label_lengths.data(), input_lengths.data(),
                               V, B, T, U, bad_dur, idx, 1, 0.f, cb.data(),
                               opt) != WTT_STATUS_BAD_ARGUMENT)
    return false;
  std::printf("multiblank_test dense-parity + K=2 ok (cost0=%f)\n", c2[0]);
  return true;
}

// TDT engine: finite costs/grads on random two-head inputs; the duration
// head's per-cell gradient must sum to ~0 at unit occupancy... cheapest
// exact invariant: sum_j g_dur(t,u,j) == 0 wherever the cell posterior
// equals the total arc posterior, which holds identically (both are W);
// check it everywhere. Also bad-arg rejection.
static bool tdt_test() {
  const int B = 2, T = 8, U = 3, V = 7, D = 3;
  std::mt19937 gen(29);
  std::uniform_real_distribution<float> dist(-1.f, 1.f);
  std::vector<float> tok(static_cast<size_t>(B) * T * U * V);
  std::vector<float> dur(static_cast<size_t>(B) * T * U * D);
  for (auto& x : tok) x = 2.f * dist(gen);
  for (auto& x : dur) x = 2.f * dist(gen);
  std::vector<int> labels = {1, 2, 3, 4};  // (B, U-1)
  std::vector<int> label_lengths = {2, 1};
  std::vector<int> input_lengths = {8, 5};
  const int durs[D] = {0, 1, 2};
  wttOptions opt{};
  opt.blank_label = 0;

  std::vector<float> costs(B), gt(tok.size()), gd(dur.size());
  wttStatus_t st = wtt_rnnt_loss_tdt(
      tok.data(), dur.data(), gt.data(), gd.data(), labels.data(),
      label_lengths.data(), input_lengths.data(), V, B, T, U, durs, D,
      0.05f, costs.data(), opt);
  if (st != WTT_STATUS_SUCCESS) {
    std::printf("tdt_test status: %s\n", wtt_get_status_string(st));
    return false;
  }
  for (int b = 0; b < B; ++b)
    if (!std::isfinite(costs[b])) return false;
  // per-cell: sum_j g_dur = p_dur-weighted W - (total arc posterior) = 0
  for (int b = 0; b < B; ++b) {
    const int Tb = input_lengths[b], Ub = label_lengths[b] + 1;
    for (int t = 0; t < Tb; ++t)
      for (int u = 0; u < Ub; ++u) {
        double s = 0;
        for (int j = 0; j < D; ++j)
          s += gd[((static_cast<size_t>(b) * T + t) * U + u) * D + j];
        if (!close(s, 0.0, 2e-4)) {
          std::printf("tdt_test: dur-head row sum %g at (%d,%d,%d)\n",
                      s, b, t, u);
          return false;
        }
      }
  }
  // duration 0 only: no blank arc can advance — must be rejected
  const int bad[1] = {0};
  std::vector<float> cb(B);
  if (wtt_rnnt_loss_tdt(tok.data(), dur.data(), nullptr, nullptr,
                        labels.data(), label_lengths.data(),
                        input_lengths.data(), V, B, T, U, bad, 1, 0.f,
                        cb.data(), opt) != WTT_STATUS_BAD_ARGUMENT)
    return false;
  std::printf("tdt_test ok (cost0=%f)\n", costs[0]);
  return true;
}

// Fused duration-arc engines: costs must equal their materialized-logits
// twins exactly (same recursion on identical caches).
static bool fused_variants_test() {
  const int B = 2, T = 7, U = 3, V = 8, H = 5, D = 3;
  std::mt19937 gen(37);
  std::uniform_real_distribution<double> dist(-1.0, 1.0);
  std::vector<double> e(static_cast<size_t>(B) * T * H),
      p(static_cast<size_t>(B) * U * H), W(static_cast<size_t>(H) * V),
      bias(V), Wd(static_cast<size_t>(H) * D), bd(D);
  for (auto& x : e) x = dist(gen);
  for (auto& x : p) x = dist(gen);
  for (auto& x : W) x = dist(gen) / std::sqrt(double(H));
  for (auto& x : bias) x = dist(gen) * 0.1;
  for (auto& x : Wd) x = dist(gen) / std::sqrt(double(H));
  for (auto& x : bd) x = dist(gen) * 0.1;
  std::vector<int> labels(B * (U - 1));
  std::uniform_int_distribution<int> ldist(1, V - 3);
  for (auto& l : labels) l = ldist(gen);
  std::vector<int> label_lengths = {2, 1};
  std::vector<int> input_lengths = {7, 5};
  wttOptions opt{};

  // materialise token logits and duration logits
  std::vector<double> acts(static_cast<size_t>(B) * T * U * V);
  std::vector<double> dur(static_cast<size_t>(B) * T * U * D);
  for (int b = 0; b < B; ++b)
    for (int t = 0; t < T; ++t)
      for (int u = 0; u < U; ++u) {
        const size_t cell = (static_cast<size_t>(b) * T + t) * U + u;
        for (int v = 0; v < V; ++v) {
          double s = bias[v];
          for (int i = 0; i < H; ++i)
            s += std::tanh(e[(static_cast<size_t>(b) * T + t) * H + i] +
                           p[(static_cast<size_t>(b) * U + u) * H + i]) *
                 W[static_cast<size_t>(i) * V + v];
          acts[cell * V + v] = s;
        }
        for (int j = 0; j < D; ++j) {
          double s = bd[j];
          for (int i = 0; i < H; ++i)
            s += std::tanh(e[(static_cast<size_t>(b) * T + t) * H + i] +
                           p[(static_cast<size_t>(b) * U + u) * H + i]) *
                 Wd[static_cast<size_t>(i) * D + j];
          dur[cell * D + j] = s;
        }
      }

  const int mb_durs[2] = {2, 3};
  const int mb_idx[2] = {V - 2, V - 1};
  std::vector<double> c_ref(B);
  if (wtt_rnnt_loss_multiblank_fp64(
          acts.data(), nullptr, labels.data(), label_lengths.data(),
          input_lengths.data(), V, B, T, U, mb_durs, mb_idx, 2, 0.05,
          c_ref.data(), opt) != WTT_STATUS_SUCCESS)
    return false;
  std::vector<double> c_f(B), de(e.size()), dp(p.size()), dW(W.size()),
      db(V);
  if (wtt_rnnt_loss_multiblank_fused_fp64(
          e.data(), p.data(), W.data(), bias.data(), de.data(), dp.data(),
          dW.data(), db.data(), labels.data(), label_lengths.data(),
          input_lengths.data(), H, V, B, T, U, mb_durs, mb_idx, 2, 0.05,
          c_f.data(), opt) != WTT_STATUS_SUCCESS)
    return false;
  for (int b = 0; b < B; ++b)
    if (!close(c_f[b], c_ref[b], 1e-8)) {
      std::printf("mb fused cost[%d]: %f vs %f\n", b, c_f[b], c_ref[b]);
      return false;
    }

  const int td_durs[D] = {0, 1, 2};
  std::vector<double> c_tref(B);
  if (wtt_rnnt_loss_tdt_fp64(
          acts.data(), dur.data(), nullptr, nullptr, labels.data(),
          label_lengths.data(), input_lengths.data(), V, B, T, U, td_durs,
          D, 0.03, c_tref.data(), opt) != WTT_STATUS_SUCCESS)
    return false;
  std::vector<double> c_tf(B), dWd(Wd.size()), dbd(D);
  std::fill(de.begin(), de.end(), 0);
  std::fill(dp.begin(), dp.end(), 0);
  std::fill(dW.begin(), dW.end(), 0);
  std::fill(db.begin(), db.end(), 0);
  if (wtt_rnnt_loss_tdt_fused_fp64(
          e.data(), p.data(), W.data(), bias.data(), Wd.data(), bd.data(),
          de.data(), dp.data(), dW.data(), db.data(), dWd.data(),
          dbd.data(), labels.data(), label_lengths.data(),
          input_lengths.data(), H, V, D, B, T, U, td_durs, 0.03,
          c_tf.data(), opt) != WTT_STATUS_SUCCESS)
    return false;
  for (int b = 0; b < B; ++b)
    if (!close(c_tf[b], c_tref[b], 1e-8)) {
      std::printf("tdt fused cost[%d]: %f vs %f\n", b, c_tf[b], c_tref[b]);
      return false;
    }
  std::printf("fused_variants_test: mb + tdt fused match materialized "
              "(%f, %f)\n", c_f[0], c_tf[0]);
  return true;
}

int main() {
  if (wtt_get_version() != 3) return 1;
  bool ok = small_test();
  ok = random_test() && ok;
  ok = simple_test() && ok;
  ok = workspace_test() && ok;
  ok = pruned_test() && ok;
  ok = fused_test() && ok;
  ok = pruned_fused_test() && ok;
  ok = multiblank_test() && ok;
  ok = tdt_test() && ok;
  ok = fused_variants_test() && ok;
  std::printf(ok ? "native tests pass\n" : "native tests FAIL\n");
  return ok ? 0 : 1;
}
