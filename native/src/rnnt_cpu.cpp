// Native CPU backend: OpenMP-parallel RNN-T loss and gradient.
//
// Fresh implementation of the forward-backward math (Graves 2012,
// arXiv:1211.3711; derivation in the reference's docs/rnnt_notes.tex).
// Structure differs from the reference CPU engine deliberately:
//   * row-major t-sweeps (not diagonal) — cache-friendly on CPU;
//   * both gradient conventions in one engine (sparse w.r.t. log-probs and
//     dense w.r.t. raw activations with fused log-softmax);
//   * internal allocation via std::vector (no caller workspace protocol).
#include "rnnt_tpu.h"

#include <algorithm>
#include <cmath>
#include <cstring>
#include <limits>
#include <vector>

#if defined(_OPENMP)
#include <omp.h>
#endif

namespace {

template <typename T>
constexpr T kNegInf = -std::numeric_limits<T>::infinity();

template <typename T>
inline T logaddexp(T a, T b) {
  if (a == kNegInf<T>) return b;
  if (b == kNegInf<T>) return a;
  const T hi = std::max(a, b);
  return hi + std::log1p(std::exp(-std::fabs(a - b)));
}

// Per-utterance engine. All lattice scratch is (T x U) for this utterance's
// true lengths; `stride_u = maxU` indexes into the padded activation block.
// Scratch comes from the caller workspace when provided (zero-allocation
// contract, cf. /root/reference/include/rnnt.h:139-143) — `scratch` must
// hold 5*T*U Reals — or is allocated internally when scratch == nullptr.
template <typename Real>
class Lattice {
 public:
  Lattice(int T_, int U_, int V_, int maxU, int blank, bool from_log_probs,
          Real* scratch = nullptr, Real fastemit_lambda = Real(0),
          Real delay_penalty = Real(0))
      : T(T_), U(U_), V(V_), maxU_(maxU), blank_(blank),
        from_log_probs_(from_log_probs), lam_(fastemit_lambda),
        delay_(delay_penalty) {
    const size_t n = static_cast<size_t>(T_) * U_;
    if (!scratch) {
      own_.resize(5 * n);
      scratch = own_.data();
    }
    lpb_ = scratch;
    lpe_ = scratch + n;
    denom_ = scratch + 2 * n;
    alpha_ = scratch + 3 * n;
    beta_ = scratch + 4 * n;
    std::fill(lpe_, lpe_ + n, kNegInf<Real>);
  }

  // Build the blank/label caches (and softmax denominators when fusing).
  void setup(const Real* acts, const int* labels) {
    for (int t = 0; t < T; ++t) {
      for (int u = 0; u < U; ++u) {
        const Real* row = acts + (static_cast<size_t>(t) * maxU_ + u) * V;
        Real d = 0;
        if (!from_log_probs_) {
          Real hi = row[0];
          for (int v = 1; v < V; ++v) hi = std::max(hi, row[v]);
          Real s = 0;
          for (int v = 0; v < V; ++v) s += std::exp(row[v] - hi);
          d = -hi - std::log(s);
          denom_[idx(t, u)] = d;
        }
        lpb_[idx(t, u)] = row[blank_] + d;
        if (u < U - 1) lpe_[idx(t, u)] = row[labels[u]] + d;
      }
    }
    apply_delay_shift();
  }

  // Delay-penalized transducer (arXiv:2211.00490): + lambda*((T-1)/2 - t)
  // on every emit log-weight. Applied after the caches are built so the
  // recursions and the closed-form gradient operate on shifted weights.
  void apply_delay_shift() {
    if (delay_ == Real(0)) return;
    const Real mid = Real(T - 1) / Real(2);
    for (int t = 0; t < T; ++t) {
      const Real shift = delay_ * (mid - Real(t));
      for (int u = 0; u < U - 1; ++u) lpe_[idx(t, u)] += shift;
    }
  }

  Real forward() {
    alpha_[0] = 0;
    for (int t = 1; t < T; ++t)
      alpha_[idx(t, 0)] = alpha_[idx(t - 1, 0)] + lpb_[idx(t - 1, 0)];
    for (int u = 1; u < U; ++u)
      alpha_[idx(0, u)] = alpha_[idx(0, u - 1)] + lpe_[idx(0, u - 1)];
    for (int t = 1; t < T; ++t)
      for (int u = 1; u < U; ++u)
        alpha_[idx(t, u)] =
            logaddexp(alpha_[idx(t - 1, u)] + lpb_[idx(t - 1, u)],
                      alpha_[idx(t, u - 1)] + lpe_[idx(t, u - 1)]);
    return alpha_[idx(T - 1, U - 1)] + lpb_[idx(T - 1, U - 1)];
  }

  Real backward() {
    beta_[idx(T - 1, U - 1)] = lpb_[idx(T - 1, U - 1)];
    for (int t = T - 2; t >= 0; --t)
      beta_[idx(t, U - 1)] = beta_[idx(t + 1, U - 1)] + lpb_[idx(t, U - 1)];
    for (int u = U - 2; u >= 0; --u)
      beta_[idx(T - 1, u)] = beta_[idx(T - 1, u + 1)] + lpe_[idx(T - 1, u)];
    for (int t = T - 2; t >= 0; --t)
      for (int u = U - 2; u >= 0; --u)
        beta_[idx(t, u)] = logaddexp(beta_[idx(t + 1, u)] + lpb_[idx(t, u)],
                                     beta_[idx(t, u + 1)] + lpe_[idx(t, u)]);
    return beta_[0];
  }

  // Gradient of cost = -ll. `grads` points at this utterance's padded block.
  void gradient(Real* grads, const Real* acts, const int* labels, Real ll) {
    for (int t = 0; t < T; ++t) {
      for (int u = 0; u < U; ++u) {
        const size_t cell = idx(t, u);
        Real* grow = grads + (static_cast<size_t>(t) * maxU_ + u) * V;
        const Real a = alpha_[cell];
        // beta continuation terms for the blank / emit transitions
        const Real bt = (t < T - 1) ? beta_[idx(t + 1, u)]
                                 : ((u == U - 1) ? Real(0) : kNegInf<Real>);
        const Real bu = (u < U - 1) ? beta_[idx(t, u + 1)] : kNegInf<Real>;
        const Real gb = std::exp(a + lpb_[cell] + bt - ll);
        const Real ge = (u < U - 1) ? std::exp(a + lpe_[cell] + bu - ll) : Real(0);
        // FastEmit (arXiv:2010.11148): emit arc scaled by (1+lambda);
        // the dense softmax coefficient is exactly gb + ge, so it picks
        // up + lambda*ge.
        if (from_log_probs_) {
          grow[blank_] = -gb;
          if (u < U - 1) grow[labels[u]] = -(Real(1) + lam_) * ge;
        } else {
          const Real* row = acts + (static_cast<size_t>(t) * maxU_ + u) * V;
          const Real coef = std::exp(a + beta_[cell] - ll) + lam_ * ge;
          const Real d = denom_[cell];
          for (int v = 0; v < V; ++v)
            grow[v] = coef * std::exp(row[v] + d);
          grow[blank_] -= gb;
          if (u < U - 1) grow[labels[u]] -= (Real(1) + lam_) * ge;
        }
      }
    }
  }

  // Direct cache access for engines that build lpb/lpe themselves
  // (the factorised loss) and then reuse the recursions above.
  Real* lpb() { return lpb_; }
  Real* lpe() { return lpe_; }
  const Real* alpha() const { return alpha_; }
  const Real* beta() const { return beta_; }

 private:
  size_t idx(int t, int u) const { return static_cast<size_t>(t) * U + u; }
  int T, U, V, maxU_, blank_;
  bool from_log_probs_;
  Real lam_ = Real(0);
  Real delay_ = Real(0);
  Real *lpb_, *lpe_, *denom_, *alpha_, *beta_;
  std::vector<Real> own_;
};

// Factorised per-utterance engine: joint = am ⊕ lm (see the JAX twin in
// warp_transducer_tpu/ops/simple.py for the derivation). Scratch is
// O((T+U)V + T·U); the gradient marginals are two small GEMMs.
template <typename Real>
void run_simple_utterance(const Real* am, const Real* lm, Real* gam,
                          Real* glm, const int* labels, int T, int U, int V,
                          int blank, Real* cost,
                          Real fastemit_lambda = Real(0),
                          Real delay_penalty = Real(0)) {
  const Real kFloor = static_cast<Real>(1e-30);
  std::vector<Real> A(static_cast<size_t>(T) * V), Bm(static_cast<size_t>(U) * V);
  std::vector<Real> Ma(T), Ml(U);
  for (int t = 0; t < T; ++t) {
    const Real* row = am + static_cast<size_t>(t) * V;
    Real hi = row[0];
    for (int v = 1; v < V; ++v) hi = std::max(hi, row[v]);
    Ma[t] = hi;
    for (int v = 0; v < V; ++v) A[static_cast<size_t>(t) * V + v] = std::exp(row[v] - hi);
  }
  for (int u = 0; u < U; ++u) {
    const Real* row = lm + static_cast<size_t>(u) * V;
    Real hi = row[0];
    for (int v = 1; v < V; ++v) hi = std::max(hi, row[v]);
    Ml[u] = hi;
    for (int v = 0; v < V; ++v) Bm[static_cast<size_t>(u) * V + v] = std::exp(row[v] - hi);
  }

  // S = A · Bmᵀ  (the normalizer matmul), logZ = Ma ⊕ Ml + log S
  std::vector<Real> S(static_cast<size_t>(T) * U);
  for (int t = 0; t < T; ++t)
    for (int u = 0; u < U; ++u) {
      const Real* a = &A[static_cast<size_t>(t) * V];
      const Real* b = &Bm[static_cast<size_t>(u) * V];
      Real s = 0;
      for (int v = 0; v < V; ++v) s += a[v] * b[v];
      S[static_cast<size_t>(t) * U + u] = std::max(s, kFloor);
    }

  Lattice<Real> lat(T, U, V, U, blank, /*from_log_probs=*/true);
  Real* lpb = lat.lpb();
  Real* lpe = lat.lpe();
  for (int t = 0; t < T; ++t)
    for (int u = 0; u < U; ++u) {
      const size_t cell = static_cast<size_t>(t) * U + u;
      const Real logZ = Ma[t] + Ml[u] + std::log(S[cell]);
      lpb[cell] = am[static_cast<size_t>(t) * V + blank] +
                  lm[static_cast<size_t>(u) * V + blank] - logZ;
      if (u < U - 1) {
        const int y = labels[u];
        lpe[cell] = am[static_cast<size_t>(t) * V + y] +
                    lm[static_cast<size_t>(u) * V + y] - logZ;
      }
    }
  if (delay_penalty != Real(0)) {
    const Real mid = Real(T - 1) / Real(2);
    for (int t = 0; t < T; ++t)
      for (int u = 0; u < U - 1; ++u)
        lpe[static_cast<size_t>(t) * U + u] += delay_penalty * (mid - Real(t));
  }

  const Real ll = lat.forward();
  *cost = -ll;
  if (!gam) return;

  lat.backward();
  const Real* alpha = lat.alpha();
  const Real* beta = lat.beta();
  // W = coef / S and the blank/emit correction coefficients (cf.
  // _coefs in ops/simple.py; derivation docs/rnnt_math.md).
  std::vector<Real> W(static_cast<size_t>(T) * U);
  std::vector<Real> cb(static_cast<size_t>(T) * U), ce(static_cast<size_t>(T) * U);
  for (int t = 0; t < T; ++t)
    for (int u = 0; u < U; ++u) {
      const size_t cell = static_cast<size_t>(t) * U + u;
      const Real bt = (t < T - 1) ? beta[cell + U]
                                  : ((u == U - 1) ? Real(0) : kNegInf<Real>);
      const Real bu = (u < U - 1) ? beta[cell + 1] : kNegInf<Real>;
      cb[cell] = std::exp(alpha[cell] + lpb[cell] + bt - ll);
      ce[cell] = (u < U - 1) ? std::exp(alpha[cell] + lpe[cell] + bu - ll)
                             : Real(0);
      // FastEmit: softmax coefficient picks up + lambda*ce, emit arc
      // is scaled by (1+lambda)
      W[cell] = (std::exp(alpha[cell] + beta[cell] - ll) +
                 fastemit_lambda * ce[cell]) / S[cell];
      ce[cell] *= Real(1) + fastemit_lambda;
    }

  // d cost/d am = A ⊙ (W·Bm) − blank/emit corrections   (GEMM T×U·U×V)
  for (int t = 0; t < T; ++t) {
    Real* g = gam + static_cast<size_t>(t) * V;
    for (int u = 0; u < U; ++u) {
      const Real w = W[static_cast<size_t>(t) * U + u];
      const Real* b = &Bm[static_cast<size_t>(u) * V];
      for (int v = 0; v < V; ++v) g[v] += w * b[v];
    }
    Real cbsum = 0;
    for (int u = 0; u < U; ++u) cbsum += cb[static_cast<size_t>(t) * U + u];
    for (int v = 0; v < V; ++v) g[v] *= A[static_cast<size_t>(t) * V + v];
    g[blank] -= cbsum;
    for (int u = 0; u < U - 1; ++u)
      g[labels[u]] -= ce[static_cast<size_t>(t) * U + u];
  }

  // d cost/d lm = Bm ⊙ (Wᵀ·A) − corrections             (GEMM U×T·T×V)
  for (int u = 0; u < U; ++u) {
    Real* g = glm + static_cast<size_t>(u) * V;
    for (int t = 0; t < T; ++t) {
      const Real w = W[static_cast<size_t>(t) * U + u];
      const Real* a = &A[static_cast<size_t>(t) * V];
      for (int v = 0; v < V; ++v) g[v] += w * a[v];
    }
    Real cbsum = 0, cesum = 0;
    for (int t = 0; t < T; ++t) {
      cbsum += cb[static_cast<size_t>(t) * U + u];
      cesum += ce[static_cast<size_t>(t) * U + u];
    }
    for (int v = 0; v < V; ++v) g[v] *= Bm[static_cast<size_t>(u) * V + v];
    g[blank] -= cbsum;
    if (u < U - 1) g[labels[u]] -= cesum;
  }
}

template <typename T>
wttStatus_t run_simple(const T* am, const T* lm, T* gam, T* glm,
                       const int* labels, const int* label_lengths,
                       const int* input_lengths, int V, int B, int maxT,
                       int maxU, T* costs, wttOptions options) {
  if (!am || !lm || !labels || !label_lengths || !input_lengths || !costs)
    return WTT_STATUS_BAD_ARGUMENT;
  if ((gam == nullptr) != (glm == nullptr)) return WTT_STATUS_BAD_ARGUMENT;
  if (V <= 0 || B <= 0 || maxT <= 0 || maxU <= 0 ||
      options.blank_label < 0 || options.blank_label >= V ||
      options.from_log_probs != 0 ||
      !(options.fastemit_lambda >= 0.0f) ||
      !(options.delay_penalty >= 0.0f))
    return WTT_STATUS_BAD_ARGUMENT;
  for (int b = 0; b < B; ++b) {
    if (input_lengths[b] < 1 || input_lengths[b] > maxT) return WTT_STATUS_BAD_ARGUMENT;
    if (label_lengths[b] < 0 || label_lengths[b] + 1 > maxU) return WTT_STATUS_BAD_ARGUMENT;
  }

#if defined(_OPENMP)
  if (options.num_threads > 0) omp_set_num_threads(options.num_threads);
#endif

  const size_t am_block = static_cast<size_t>(maxT) * V;
  const size_t lm_block = static_cast<size_t>(maxU) * V;
  if (gam) {
    std::memset(gam, 0, sizeof(T) * am_block * B);
    std::memset(glm, 0, sizeof(T) * lm_block * B);
  }

  bool ok = true;
#if defined(_OPENMP)
#pragma omp parallel for schedule(dynamic)
#endif
  for (int b = 0; b < B; ++b) {
    const int Tb = input_lengths[b];
    const int Ub = label_lengths[b] + 1;
    T cost;
    run_simple_utterance<T>(
        am + b * am_block, lm + b * lm_block,
        gam ? gam + b * am_block : nullptr, glm ? glm + b * lm_block : nullptr,
        labels + static_cast<size_t>(b) * (maxU - 1), Tb, Ub, V,
        options.blank_label, &cost,
        static_cast<T>(options.fastemit_lambda),
        static_cast<T>(options.delay_penalty));
    if (!std::isfinite(cost)) ok = false;
    costs[b] = cost;
  }
  return ok ? WTT_STATUS_SUCCESS : WTT_STATUS_EXECUTION_FAILED;
}

template <typename T>
wttStatus_t run(const T* acts, T* grads, const int* labels,
                const int* label_lengths, const int* input_lengths,
                int V, int B, int maxT, int maxU, T* costs,
                void* workspace, wttOptions options) {
  if (!acts || !labels || !label_lengths || !input_lengths || !costs)
    return WTT_STATUS_BAD_ARGUMENT;
  if (V <= 0 || B <= 0 || maxT <= 0 || maxU <= 0 ||
      options.blank_label < 0 || options.blank_label >= V ||
      !(options.fastemit_lambda >= 0.0f) ||
      !(options.delay_penalty >= 0.0f))
    return WTT_STATUS_BAD_ARGUMENT;
  for (int b = 0; b < B; ++b) {
    if (input_lengths[b] < 1 || input_lengths[b] > maxT) return WTT_STATUS_BAD_ARGUMENT;
    if (label_lengths[b] < 0 || label_lengths[b] + 1 > maxU) return WTT_STATUS_BAD_ARGUMENT;
  }

#if defined(_OPENMP)
  if (options.num_threads > 0) omp_set_num_threads(options.num_threads);
#endif

  const size_t block = static_cast<size_t>(maxT) * maxU * V;
  // per-utterance workspace slice: the 5 lattice arrays, maxT*maxU each
  // (matches wtt_get_workspace_size)
  const size_t ws_per_mb = 5u * static_cast<size_t>(maxT) * maxU;
  T* ws = static_cast<T*>(workspace);
  if (grads) std::memset(grads, 0, sizeof(T) * block * B);

  bool ok = true;
#if defined(_OPENMP)
#pragma omp parallel for schedule(dynamic)
#endif
  for (int b = 0; b < B; ++b) {
    const int Tb = input_lengths[b];
    const int Ub = label_lengths[b] + 1;
    const T* a_b = acts + b * block;
    const int* lab_b = labels + static_cast<size_t>(b) * (maxU - 1);
    Lattice<T> lat(Tb, Ub, V, maxU, options.blank_label,
                   options.from_log_probs != 0,
                   ws ? ws + b * ws_per_mb : nullptr,
                   static_cast<T>(options.fastemit_lambda),
                   static_cast<T>(options.delay_penalty));
    lat.setup(a_b, lab_b);
    const T ll = lat.forward();
    if (!std::isfinite(ll)) ok = false;
    costs[b] = -ll;
    if (grads) {
      lat.backward();
      lat.gradient(grads + b * block, a_b, lab_b, ll);
    }
  }
  return ok ? WTT_STATUS_SUCCESS : WTT_STATUS_EXECUTION_FAILED;
}

// ---------------------------------------------------------------------------
// Multi-blank engine (arXiv 2211.03541): K big-blank symbols whose
// emission advances t by a duration m_k >= 2 (u unchanged); the path may
// also END on a big blank consuming the remaining frames exactly. Scalar
// twin of the JAX engine (warp_transducer_tpu/ops/multiblank.py); the
// semantics contract is utils/numpy_oracle_multiblank.py. `sigma` is the
// paper's logit under-normalization (log-probs shifted by -sigma).
// ---------------------------------------------------------------------------

template <typename Real>
class MultiblankLattice {
 public:
  MultiblankLattice(int T_, int U_, int V_, int maxU, int blank,
                    bool from_log_probs, const int* durs, const int* bb,
                    int K_, Real sigma, Real lam, Real delay)
      : T(T_), U(U_), V(V_), maxU_(maxU), blank_(blank),
        from_log_probs_(from_log_probs), durs_(durs), bb_(bb), K(K_),
        sigma_(sigma), lam_(lam), delay_(delay) {
    const size_t n = static_cast<size_t>(T) * U;
    own_.assign((5 + static_cast<size_t>(K)) * n, kNegInf<Real>);
    lpb_ = own_.data();
    lpe_ = lpb_ + n;
    denom_ = lpe_ + n;
    alpha_ = denom_ + n;
    beta_ = alpha_ + n;
    lpB_ = beta_ + n;  // K consecutive (T*U) planes
  }

  void setup(const Real* acts, const int* labels) {
    const size_t n = static_cast<size_t>(T) * U;
    for (int t = 0; t < T; ++t) {
      for (int u = 0; u < U; ++u) {
        const Real* row = acts + (static_cast<size_t>(t) * maxU_ + u) * V;
        Real d = 0;
        if (!from_log_probs_) {
          Real hi = row[0];
          for (int v = 1; v < V; ++v) hi = std::max(hi, row[v]);
          Real s = 0;
          for (int v = 0; v < V; ++v) s += std::exp(row[v] - hi);
          d = -hi - std::log(s);
          denom_[idx(t, u)] = d;
        }
        const Real sh = d - sigma_;
        lpb_[idx(t, u)] = row[blank_] + sh;
        if (u < U - 1) lpe_[idx(t, u)] = row[labels[u]] + sh;
        for (int k = 0; k < K; ++k)
          lpB_[k * n + idx(t, u)] = row[bb_[k]] + sh;
      }
    }
    if (delay_ != Real(0)) {
      const Real mid = Real(T - 1) / Real(2);
      for (int t = 0; t < T; ++t) {
        const Real shift = delay_ * (mid - Real(t));
        for (int u = 0; u < U - 1; ++u) lpe_[idx(t, u)] += shift;
      }
    }
  }

  Real forward() {
    const size_t n = static_cast<size_t>(T) * U;
    for (int t = 0; t < T; ++t) {
      for (int u = 0; u < U; ++u) {
        if (t == 0 && u == 0) {
          alpha_[0] = 0;
          continue;
        }
        Real acc = kNegInf<Real>;
        if (t > 0)
          acc = alpha_[idx(t - 1, u)] + lpb_[idx(t - 1, u)];
        if (u > 0)
          acc = logaddexp(acc, alpha_[idx(t, u - 1)] + lpe_[idx(t, u - 1)]);
        for (int k = 0; k < K; ++k) {
          const int m = durs_[k];
          if (t - m >= 0)
            acc = logaddexp(acc, alpha_[idx(t - m, u)]
                                 + lpB_[k * n + idx(t - m, u)]);
        }
        alpha_[idx(t, u)] = acc;
      }
    }
    const size_t nn = n;
    Real ll = alpha_[idx(T - 1, U - 1)] + lpb_[idx(T - 1, U - 1)];
    for (int k = 0; k < K; ++k) {
      const int m = durs_[k];
      if (m <= T)
        ll = logaddexp(ll, alpha_[idx(T - m, U - 1)]
                           + lpB_[k * nn + idx(T - m, U - 1)]);
    }
    return ll;
  }

  Real backward() {
    const size_t n = static_cast<size_t>(T) * U;
    for (int t = T - 1; t >= 0; --t) {
      for (int u = U - 1; u >= 0; --u) {
        Real acc = kNegInf<Real>;
        if (u == U - 1) {
          if (t == T - 1) acc = lpb_[idx(t, u)];
          for (int k = 0; k < K; ++k)
            if (t + durs_[k] == T)
              acc = logaddexp(acc, lpB_[k * n + idx(t, u)]);
        }
        if (t < T - 1)
          acc = logaddexp(acc, lpb_[idx(t, u)] + beta_[idx(t + 1, u)]);
        if (u < U - 1)
          acc = logaddexp(acc, lpe_[idx(t, u)] + beta_[idx(t, u + 1)]);
        for (int k = 0; k < K; ++k) {
          const int m = durs_[k];
          if (t + m <= T - 1)
            acc = logaddexp(acc, lpB_[k * n + idx(t, u)]
                                 + beta_[idx(t + m, u)]);
        }
        beta_[idx(t, u)] = acc;
      }
    }
    return beta_[0];
  }

  void gradient(Real* grads, const Real* acts, const int* labels, Real ll) {
    const size_t n = static_cast<size_t>(T) * U;
    for (int t = 0; t < T; ++t) {
      for (int u = 0; u < U; ++u) {
        const size_t cell = idx(t, u);
        Real* grow = grads + (static_cast<size_t>(t) * maxU_ + u) * V;
        const Real a = alpha_[cell];
        const Real bt = (t < T - 1) ? beta_[idx(t + 1, u)]
                                 : ((u == U - 1) ? Real(0) : kNegInf<Real>);
        const Real bu = (u < U - 1) ? beta_[idx(t, u + 1)] : kNegInf<Real>;
        const Real gb = std::exp(a + lpb_[cell] + bt - ll);
        const Real ge =
            (u < U - 1) ? std::exp(a + lpe_[cell] + bu - ll) : Real(0);
        if (from_log_probs_) {
          grow[blank_] = -gb;
          for (int k = 0; k < K; ++k)
            grow[bb_[k]] = -big_post(k, t, u, ll, n);
          if (u < U - 1) grow[labels[u]] = -(Real(1) + lam_) * ge;
        } else {
          const Real* row = acts + (static_cast<size_t>(t) * maxU_ + u) * V;
          const Real coef = std::exp(a + beta_[cell] - ll) + lam_ * ge;
          const Real d = denom_[cell];
          for (int v = 0; v < V; ++v)
            grow[v] = coef * std::exp(row[v] + d);
          grow[blank_] -= gb;
          for (int k = 0; k < K; ++k)
            grow[bb_[k]] -= big_post(k, t, u, ll, n);
          if (u < U - 1) grow[labels[u]] -= (Real(1) + lam_) * ge;
        }
      }
    }
  }

  // Direct cache access for the fused-joint engine (fills the caches from
  // recomputed logits instead of calling setup()).
  Real* lpb() { return lpb_; }
  Real* lpe() { return lpe_; }
  Real* lpB() { return lpB_; }
  const Real* alpha() const { return alpha_; }
  const Real* beta() const { return beta_; }

  // posterior of the duration-m_k arc out of (t, u): interior when
  // t + m <= T-1, terminal (beta = 0) when it consumes the rest exactly
  Real big_post(int k, int t, int u, Real ll, size_t n) const {
    const int m = durs_[k];
    const Real w = lpB_[k * n + idx(t, u)];
    if (t + m <= T - 1)
      return std::exp(alpha_[idx(t, u)] + w + beta_[idx(t + m, u)] - ll);
    if (t + m == T && u == U - 1)
      return std::exp(alpha_[idx(t, u)] + w - ll);
    return Real(0);
  }

 private:

  size_t idx(int t, int u) const { return static_cast<size_t>(t) * U + u; }
  int T, U, V, maxU_, blank_;
  bool from_log_probs_;
  const int* durs_;
  const int* bb_;
  int K;
  Real sigma_, lam_, delay_;
  Real *lpb_, *lpe_, *denom_, *alpha_, *beta_, *lpB_;
  std::vector<Real> own_;
};

template <typename T>
wttStatus_t run_multiblank(const T* acts, T* grads, const int* labels,
                           const int* label_lengths, const int* input_lengths,
                           int V, int B, int maxT, int maxU,
                           const int* durs, const int* bb, int K, T sigma,
                           T* costs, wttOptions options) {
  if (!acts || !labels || !label_lengths || !input_lengths || !costs)
    return WTT_STATUS_BAD_ARGUMENT;
  if (K < 0 || (K > 0 && (!durs || !bb)))
    return WTT_STATUS_BAD_ARGUMENT;
  if (V <= 0 || B <= 0 || maxT <= 0 || maxU <= 0 ||
      options.blank_label < 0 || options.blank_label >= V ||
      !(options.fastemit_lambda >= 0.0f) ||
      !(options.delay_penalty >= 0.0f))
    return WTT_STATUS_BAD_ARGUMENT;
  for (int k = 0; k < K; ++k) {
    if (durs[k] < 2) return WTT_STATUS_BAD_ARGUMENT;
    if (bb[k] < 0 || bb[k] >= V || bb[k] == options.blank_label)
      return WTT_STATUS_BAD_ARGUMENT;
    for (int j = 0; j < k; ++j)
      if (durs[j] == durs[k] || bb[j] == bb[k])
        return WTT_STATUS_BAD_ARGUMENT;
  }
  for (int b = 0; b < B; ++b) {
    if (input_lengths[b] < 1 || input_lengths[b] > maxT)
      return WTT_STATUS_BAD_ARGUMENT;
    if (label_lengths[b] < 0 || label_lengths[b] + 1 > maxU)
      return WTT_STATUS_BAD_ARGUMENT;
  }

#if defined(_OPENMP)
  if (options.num_threads > 0) omp_set_num_threads(options.num_threads);
#endif

  const size_t block = static_cast<size_t>(maxT) * maxU * V;
  if (grads) std::memset(grads, 0, sizeof(T) * block * B);

  bool ok = true;
#if defined(_OPENMP)
#pragma omp parallel for schedule(dynamic)
#endif
  for (int b = 0; b < B; ++b) {
    const int Tb = input_lengths[b];
    const int Ub = label_lengths[b] + 1;
    const T* a_b = acts + b * block;
    const int* lab_b = labels + static_cast<size_t>(b) * (maxU - 1);
    MultiblankLattice<T> lat(Tb, Ub, V, maxU, options.blank_label,
                             options.from_log_probs != 0, durs, bb, K, sigma,
                             static_cast<T>(options.fastemit_lambda),
                             static_cast<T>(options.delay_penalty));
    lat.setup(a_b, lab_b);
    const T ll = lat.forward();
    if (!std::isfinite(ll)) ok = false;
    costs[b] = -ll;
    if (grads) {
      lat.backward();
      lat.gradient(grads + b * block, a_b, lab_b, ll);
    }
  }
  return ok ? WTT_STATUS_SUCCESS : WTT_STATUS_EXECUTION_FAILED;
}

// ---------------------------------------------------------------------------
// Token-and-Duration Transducer engine (arXiv 2304.06795): every emission
// carries a duration from a small set; token arcs (t,u)->(t+d,u+1) may use
// d = 0, blank arcs (t,u)->(t+d,u) need d >= 1, and the final blank
// consumes the remaining frames exactly. Scalar twin of the JAX engine
// (warp_transducer_tpu/ops/tdt.py); semantics contract:
// utils/numpy_oracle_tdt.py. Raw logits only (both heads' log-softmax
// fused); sigma under-normalizes the TOKEN head.
// ---------------------------------------------------------------------------

template <typename Real>
class TDTLattice {
 public:
  TDTLattice(int T_, int U_, int V_, int D_, int maxU, int blank,
             const int* durs, Real sigma, Real lam, Real delay)
      : T(T_), U(U_), V(V_), D(D_), maxU_(maxU), blank_(blank), durs_(durs),
        sigma_(sigma), lam_(lam), delay_(delay) {
    const size_t n = static_cast<size_t>(T) * U;
    own_.assign((5 + static_cast<size_t>(D)) * n, kNegInf<Real>);
    lpb_ = own_.data();
    lpe_ = lpb_ + n;
    denom_ = lpe_ + n;
    alpha_ = denom_ + n;
    beta_ = alpha_ + n;
    lpd_ = beta_ + n;  // D consecutive (T*U) planes
    dden_.assign(n, Real(0));
  }

  void setup(const Real* tok, const Real* dur, const int* labels) {
    const size_t n = static_cast<size_t>(T) * U;
    for (int t = 0; t < T; ++t) {
      for (int u = 0; u < U; ++u) {
        const Real* row = tok + (static_cast<size_t>(t) * maxU_ + u) * V;
        Real hi = row[0];
        for (int v = 1; v < V; ++v) hi = std::max(hi, row[v]);
        Real s = 0;
        for (int v = 0; v < V; ++v) s += std::exp(row[v] - hi);
        const Real d = -hi - std::log(s);
        denom_[idx(t, u)] = d;
        const Real sh = d - sigma_;
        lpb_[idx(t, u)] = row[blank_] + sh;
        if (u < U - 1) lpe_[idx(t, u)] = row[labels[u]] + sh;

        const Real* drow = dur + (static_cast<size_t>(t) * maxU_ + u) * D;
        Real dhi = drow[0];
        for (int j = 1; j < D; ++j) dhi = std::max(dhi, drow[j]);
        Real ds = 0;
        for (int j = 0; j < D; ++j) ds += std::exp(drow[j] - dhi);
        const Real dd = -dhi - std::log(ds);
        dden_[idx(t, u)] = dd;
        for (int j = 0; j < D; ++j) lpd_[j * n + idx(t, u)] = drow[j] + dd;
      }
    }
    if (delay_ != Real(0)) {
      const Real mid = Real(T - 1) / Real(2);
      for (int t = 0; t < T; ++t) {
        const Real shift = delay_ * (mid - Real(t));
        for (int u = 0; u < U - 1; ++u) lpe_[idx(t, u)] += shift;
      }
    }
  }

  Real forward() {
    const size_t n = static_cast<size_t>(T) * U;
    for (int t = 0; t < T; ++t) {
      for (int u = 0; u < U; ++u) {
        if (t == 0 && u == 0) {
          alpha_[0] = 0;
          continue;
        }
        Real acc = kNegInf<Real>;
        for (int j = 0; j < D; ++j) {
          const int d = durs_[j];
          if (u > 0 && t - d >= 0)
            acc = logaddexp(acc, alpha_[idx(t - d, u - 1)]
                                 + lpe_[idx(t - d, u - 1)]
                                 + lpd_[j * n + idx(t - d, u - 1)]);
          if (d >= 1 && t - d >= 0)
            acc = logaddexp(acc, alpha_[idx(t - d, u)] + lpb_[idx(t - d, u)]
                                 + lpd_[j * n + idx(t - d, u)]);
        }
        alpha_[idx(t, u)] = acc;
      }
    }
    Real ll = kNegInf<Real>;
    for (int j = 0; j < D; ++j) {
      const int d = durs_[j];
      if (d >= 1 && T - d >= 0)
        ll = logaddexp(ll, alpha_[idx(T - d, U - 1)] + lpb_[idx(T - d, U - 1)]
                           + lpd_[j * n + idx(T - d, U - 1)]);
    }
    return ll;
  }

  Real backward() {
    const size_t n = static_cast<size_t>(T) * U;
    for (int t = T - 1; t >= 0; --t) {
      for (int u = U - 1; u >= 0; --u) {
        Real acc = kNegInf<Real>;
        for (int j = 0; j < D; ++j) {
          const int d = durs_[j];
          if (u == U - 1 && d >= 1 && t + d == T)
            acc = logaddexp(acc, lpb_[idx(t, u)] + lpd_[j * n + idx(t, u)]);
          if (d >= 1 && t + d <= T - 1)
            acc = logaddexp(acc, lpb_[idx(t, u)] + lpd_[j * n + idx(t, u)]
                                 + beta_[idx(t + d, u)]);
          if (u < U - 1 && t + d <= T - 1)
            acc = logaddexp(acc, lpe_[idx(t, u)] + lpd_[j * n + idx(t, u)]
                                 + beta_[idx(t + d, u + 1)]);
        }
        beta_[idx(t, u)] = acc;
      }
    }
    return beta_[0];
  }

  // Both heads' dense gradients; g_tok/g_dur point at this utterance's
  // padded blocks. Every arc carries one factor from each head, so both
  // share the occupation coefficient W = exp(alpha+beta-ll) (+ lam*ce
  // under FastEmit).
  void gradient(Real* g_tok, Real* g_dur, const Real* tok, const Real* dur,
                const int* labels, Real ll) {
    const size_t n = static_cast<size_t>(T) * U;
    for (int t = 0; t < T; ++t) {
      for (int u = 0; u < U; ++u) {
        const size_t cell = idx(t, u);
        const Real a = alpha_[cell];
        Real ce_total = 0;
        Real cb_total = 0;
        Real cb_j[32], ce_j[32];  // D <= 32 enforced at entry
        for (int j = 0; j < D; ++j) {
          const int d = durs_[j];
          const Real w = lpd_[j * n + cell];
          Real ce = 0, cb = 0;
          if (u < U - 1 && t + d <= T - 1)
            ce = std::exp(a + lpe_[cell] + w + beta_[idx(t + d, u + 1)] - ll);
          if (d >= 1) {
            if (t + d <= T - 1)
              cb = std::exp(a + lpb_[cell] + w + beta_[idx(t + d, u)] - ll);
            else if (t + d == T && u == U - 1)
              cb = std::exp(a + lpb_[cell] + w - ll);
          }
          ce_j[j] = ce;
          cb_j[j] = cb;
          ce_total += ce;
          cb_total += cb;
        }
        const Real coef = std::exp(a + beta_[cell] - ll) + lam_ * ce_total;

        Real* gt = g_tok + (static_cast<size_t>(t) * maxU_ + u) * V;
        const Real* row = tok + (static_cast<size_t>(t) * maxU_ + u) * V;
        const Real den = denom_[cell];
        for (int v = 0; v < V; ++v) gt[v] = coef * std::exp(row[v] + den);
        gt[blank_] -= cb_total;
        if (u < U - 1) gt[labels[u]] -= (Real(1) + lam_) * ce_total;

        Real* gd = g_dur + (static_cast<size_t>(t) * maxU_ + u) * D;
        const Real* drow = dur + (static_cast<size_t>(t) * maxU_ + u) * D;
        const Real dden = dden_[cell];
        for (int j = 0; j < D; ++j)
          gd[j] = coef * std::exp(drow[j] + dden)
                  - (cb_j[j] + (Real(1) + lam_) * ce_j[j]);
      }
    }
  }

  // Direct cache access for the fused-joint engine.
  Real* lpb() { return lpb_; }
  Real* lpe() { return lpe_; }
  Real* lpd() { return lpd_; }
  const Real* alpha() const { return alpha_; }
  const Real* beta() const { return beta_; }

 private:
  size_t idx(int t, int u) const { return static_cast<size_t>(t) * U + u; }
  int T, U, V, D, maxU_, blank_;
  const int* durs_;
  Real sigma_, lam_, delay_;
  Real *lpb_, *lpe_, *denom_, *alpha_, *beta_, *lpd_;
  std::vector<Real> own_, dden_;
};

template <typename T>
wttStatus_t run_tdt(const T* tok, const T* dur, T* g_tok, T* g_dur,
                    const int* labels, const int* label_lengths,
                    const int* input_lengths, int V, int B, int maxT,
                    int maxU, const int* durs, int D, T sigma, T* costs,
                    wttOptions options) {
  if (!tok || !dur || !labels || !label_lengths || !input_lengths || !costs ||
      !durs)
    return WTT_STATUS_BAD_ARGUMENT;
  if ((g_tok == nullptr) != (g_dur == nullptr))
    return WTT_STATUS_BAD_ARGUMENT;
  if (V <= 0 || B <= 0 || maxT <= 0 || maxU <= 0 || D <= 0 || D > 32 ||
      options.blank_label < 0 || options.blank_label >= V ||
      options.from_log_probs != 0 ||  // raw logits only (two fused heads)
      !(options.fastemit_lambda >= 0.0f) ||
      !(options.delay_penalty >= 0.0f))
    return WTT_STATUS_BAD_ARGUMENT;
  bool any_pos = false;
  for (int j = 0; j < D; ++j) {
    if (durs[j] < 0) return WTT_STATUS_BAD_ARGUMENT;
    if (durs[j] >= 1) any_pos = true;
    for (int k = 0; k < j; ++k)
      if (durs[k] == durs[j]) return WTT_STATUS_BAD_ARGUMENT;
  }
  if (!any_pos) return WTT_STATUS_BAD_ARGUMENT;
  for (int b = 0; b < B; ++b) {
    if (input_lengths[b] < 1 || input_lengths[b] > maxT)
      return WTT_STATUS_BAD_ARGUMENT;
    if (label_lengths[b] < 0 || label_lengths[b] + 1 > maxU)
      return WTT_STATUS_BAD_ARGUMENT;
  }

#if defined(_OPENMP)
  if (options.num_threads > 0) omp_set_num_threads(options.num_threads);
#endif

  const size_t block_t = static_cast<size_t>(maxT) * maxU * V;
  const size_t block_d = static_cast<size_t>(maxT) * maxU * D;
  if (g_tok) {
    std::memset(g_tok, 0, sizeof(T) * block_t * B);
    std::memset(g_dur, 0, sizeof(T) * block_d * B);
  }

  bool ok = true;
#if defined(_OPENMP)
#pragma omp parallel for schedule(dynamic)
#endif
  for (int b = 0; b < B; ++b) {
    const int Tb = input_lengths[b];
    const int Ub = label_lengths[b] + 1;
    const T* t_b = tok + b * block_t;
    const T* d_b = dur + b * block_d;
    const int* lab_b = labels + static_cast<size_t>(b) * (maxU - 1);
    TDTLattice<T> lat(Tb, Ub, V, D, maxU, options.blank_label, durs, sigma,
                      static_cast<T>(options.fastemit_lambda),
                      static_cast<T>(options.delay_penalty));
    lat.setup(t_b, d_b, lab_b);
    const T ll = lat.forward();
    if (std::isnan(ll)) ok = false;
    if (ll == kNegInf<T>) {
      // no duration combination consumes the frames exactly: infeasible
      // utterance -> huge finite cost, zero gradients (the pruned-loss
      // convention; grads blocks are already zeroed)
      costs[b] = T(1e30);
      continue;
    }
    costs[b] = -ll;
    if (g_tok) {
      lat.backward();
      lat.gradient(g_tok + b * block_t, g_dur + b * block_d, t_b, d_b,
                   lab_b, ll);
    }
  }
  return ok ? WTT_STATUS_SUCCESS : WTT_STATUS_EXECUTION_FAILED;
}

// ---------------------------------------------------------------------------
// Fused-joint engines for the duration-arc families: the (T, U, V) logits
// are recomputed per cell and consumed in place (cf. run_fused_utterance);
// scalar twins of ops/multiblank_fused.py and ops/tdt_fused.py.
// ---------------------------------------------------------------------------

template <typename Real>
void run_mb_fused_utterance(const Real* e, const Real* p, const Real* W,
                            const Real* bias, Real* de, Real* dp, Real* dW,
                            Real* db, const int* labels, int Tb, int Ub,
                            int H, int V, int blank, const int* durs,
                            const int* bb, int K, Real sigma, Real* cost,
                            Real lam, Real delay) {
  MultiblankLattice<Real> lat(Tb, Ub, V, Ub, blank, /*from_log_probs=*/true,
                              durs, bb, K, /*sigma=*/Real(0), lam, delay);
  Real* lpb = lat.lpb();
  Real* lpe = lat.lpe();
  Real* lpB = lat.lpB();
  const size_t n = static_cast<size_t>(Tb) * Ub;
  std::vector<Real> denom(n), h(H), logits(V);

  auto idx = [Ub](int t, int u) { return static_cast<size_t>(t) * Ub + u; };
  auto cell_logits = [&](int t, int u) {
    const Real* et = e + static_cast<size_t>(t) * H;
    const Real* pu = p + static_cast<size_t>(u) * H;
    for (int i = 0; i < H; ++i) h[i] = std::tanh(et[i] + pu[i]);
    for (int v = 0; v < V; ++v) logits[v] = bias[v];
    for (int i = 0; i < H; ++i) {
      const Real hi = h[i];
      const Real* wrow = W + static_cast<size_t>(i) * V;
      for (int v = 0; v < V; ++v) logits[v] += hi * wrow[v];
    }
  };

  for (int t = 0; t < Tb; ++t) {
    for (int u = 0; u < Ub; ++u) {
      cell_logits(t, u);
      Real hi = logits[0];
      for (int v = 1; v < V; ++v) hi = std::max(hi, logits[v]);
      Real s = 0;
      for (int v = 0; v < V; ++v) s += std::exp(logits[v] - hi);
      const Real d = -hi - std::log(s);
      const size_t cell = idx(t, u);
      denom[cell] = d;
      const Real sh = d - sigma;
      lpb[cell] = logits[blank] + sh;
      if (u < Ub - 1) lpe[cell] = logits[labels[u]] + sh;
      for (int k = 0; k < K; ++k) lpB[k * n + cell] = logits[bb[k]] + sh;
    }
  }
  if (delay != Real(0)) {
    const Real mid = Real(Tb - 1) / Real(2);
    for (int t = 0; t < Tb; ++t)
      for (int u = 0; u < Ub - 1; ++u)
        lpe[idx(t, u)] += delay * (mid - Real(t));
  }

  const Real ll = lat.forward();
  *cost = -ll;
  if (!de) return;

  lat.backward();
  const Real* alpha = lat.alpha();
  const Real* beta = lat.beta();
  std::vector<Real> g(V), dh(H);
  for (int t = 0; t < Tb; ++t) {
    for (int u = 0; u < Ub; ++u) {
      cell_logits(t, u);
      const size_t cell = idx(t, u);
      const Real a = alpha[cell];
      const Real bt = (t < Tb - 1) ? beta[idx(t + 1, u)]
                                   : ((u == Ub - 1) ? Real(0) : kNegInf<Real>);
      const Real bu = (u < Ub - 1) ? beta[idx(t, u + 1)] : kNegInf<Real>;
      const Real gb = std::exp(a + lpb[cell] + bt - ll);
      const Real ge = (u < Ub - 1) ? std::exp(a + lpe[cell] + bu - ll)
                                   : Real(0);
      const Real coef = std::exp(a + beta[cell] - ll) + lam * ge;
      const Real d = denom[cell];
      for (int v = 0; v < V; ++v) g[v] = coef * std::exp(logits[v] + d);
      g[blank] -= gb;
      for (int k = 0; k < K; ++k) g[bb[k]] -= lat.big_post(k, t, u, ll, n);
      if (u < Ub - 1) g[labels[u]] -= (Real(1) + lam) * ge;

      for (int i = 0; i < H; ++i) {
        const Real* wrow = W + static_cast<size_t>(i) * V;
        Real acc = 0;
        for (int v = 0; v < V; ++v) acc += wrow[v] * g[v];
        dh[i] = acc * (Real(1) - h[i] * h[i]);
      }
      Real* det = de + static_cast<size_t>(t) * H;
      Real* dpu = dp + static_cast<size_t>(u) * H;
      for (int i = 0; i < H; ++i) {
        det[i] += dh[i];
        dpu[i] += dh[i];
      }
      for (int i = 0; i < H; ++i) {
        const Real hi2 = h[i];
        Real* dwrow = dW + static_cast<size_t>(i) * V;
        for (int v = 0; v < V; ++v) dwrow[v] += hi2 * g[v];
      }
      for (int v = 0; v < V; ++v) db[v] += g[v];
    }
  }
}

template <typename Real>
void run_tdt_fused_utterance(const Real* e, const Real* p, const Real* W,
                             const Real* bias, const Real* Wd,
                             const Real* bias_d, Real* de, Real* dp,
                             Real* dW, Real* db, Real* dWd, Real* dbd,
                             const int* labels, int Tb, int Ub, int H,
                             int V, int D, int blank, const int* durs,
                             Real sigma, Real* cost, Real lam, Real delay) {
  TDTLattice<Real> lat(Tb, Ub, V, D, Ub, blank, durs, /*sigma=*/Real(0),
                       lam, delay);
  Real* lpb = lat.lpb();
  Real* lpe = lat.lpe();
  Real* lpd = lat.lpd();
  const size_t n = static_cast<size_t>(Tb) * Ub;
  std::vector<Real> denom(n), dden(n), h(H), logits(V), dlog(D);

  auto idx = [Ub](int t, int u) { return static_cast<size_t>(t) * Ub + u; };
  auto cell_logits = [&](int t, int u) {
    const Real* et = e + static_cast<size_t>(t) * H;
    const Real* pu = p + static_cast<size_t>(u) * H;
    for (int i = 0; i < H; ++i) h[i] = std::tanh(et[i] + pu[i]);
    for (int v = 0; v < V; ++v) logits[v] = bias[v];
    for (int j = 0; j < D; ++j) dlog[j] = bias_d[j];
    for (int i = 0; i < H; ++i) {
      const Real hi = h[i];
      const Real* wrow = W + static_cast<size_t>(i) * V;
      for (int v = 0; v < V; ++v) logits[v] += hi * wrow[v];
      const Real* wdrow = Wd + static_cast<size_t>(i) * D;
      for (int j = 0; j < D; ++j) dlog[j] += hi * wdrow[j];
    }
  };

  for (int t = 0; t < Tb; ++t) {
    for (int u = 0; u < Ub; ++u) {
      cell_logits(t, u);
      Real hi = logits[0];
      for (int v = 1; v < V; ++v) hi = std::max(hi, logits[v]);
      Real s = 0;
      for (int v = 0; v < V; ++v) s += std::exp(logits[v] - hi);
      const Real d = -hi - std::log(s);
      const size_t cell = idx(t, u);
      denom[cell] = d;
      const Real sh = d - sigma;
      lpb[cell] = logits[blank] + sh;
      if (u < Ub - 1) lpe[cell] = logits[labels[u]] + sh;
      Real dhi = dlog[0];
      for (int j = 1; j < D; ++j) dhi = std::max(dhi, dlog[j]);
      Real ds = 0;
      for (int j = 0; j < D; ++j) ds += std::exp(dlog[j] - dhi);
      const Real dd = -dhi - std::log(ds);
      dden[cell] = dd;
      for (int j = 0; j < D; ++j) lpd[j * n + cell] = dlog[j] + dd;
    }
  }
  if (delay != Real(0)) {
    const Real mid = Real(Tb - 1) / Real(2);
    for (int t = 0; t < Tb; ++t)
      for (int u = 0; u < Ub - 1; ++u)
        lpe[idx(t, u)] += delay * (mid - Real(t));
  }

  const Real ll = lat.forward();
  if (ll == kNegInf<Real>) {  // infeasible: sentinel cost, zero grads
    *cost = Real(1e30);
    return;
  }
  *cost = -ll;
  if (!de) return;

  lat.backward();
  const Real* alpha = lat.alpha();
  const Real* beta = lat.beta();
  std::vector<Real> g(V), gd(D), dh(H);
  std::vector<Real> cb_j(D), ce_j(D);
  for (int t = 0; t < Tb; ++t) {
    for (int u = 0; u < Ub; ++u) {
      cell_logits(t, u);
      const size_t cell = idx(t, u);
      const Real a = alpha[cell];
      Real cb_total = 0, ce_total = 0;
      for (int j = 0; j < D; ++j) {
        const int dn = durs[j];
        const Real w = lpd[j * n + cell];
        Real ce = 0, cb = 0;
        if (u < Ub - 1 && t + dn <= Tb - 1)
          ce = std::exp(a + lpe[cell] + w + beta[idx(t + dn, u + 1)] - ll);
        if (dn >= 1) {
          if (t + dn <= Tb - 1)
            cb = std::exp(a + lpb[cell] + w + beta[idx(t + dn, u)] - ll);
          else if (t + dn == Tb && u == Ub - 1)
            cb = std::exp(a + lpb[cell] + w - ll);
        }
        cb_j[j] = cb;
        ce_j[j] = ce;
        cb_total += cb;
        ce_total += ce;
      }
      const Real coef = std::exp(a + beta[cell] - ll) + lam * ce_total;
      const Real d = denom[cell];
      for (int v = 0; v < V; ++v) g[v] = coef * std::exp(logits[v] + d);
      g[blank] -= cb_total;
      if (u < Ub - 1) g[labels[u]] -= (Real(1) + lam) * ce_total;
      const Real dd = dden[cell];
      for (int j = 0; j < D; ++j)
        gd[j] = coef * std::exp(dlog[j] + dd)
                - (cb_j[j] + (Real(1) + lam) * ce_j[j]);

      for (int i = 0; i < H; ++i) {
        const Real* wrow = W + static_cast<size_t>(i) * V;
        Real acc = 0;
        for (int v = 0; v < V; ++v) acc += wrow[v] * g[v];
        const Real* wdrow = Wd + static_cast<size_t>(i) * D;
        for (int j = 0; j < D; ++j) acc += wdrow[j] * gd[j];
        dh[i] = acc * (Real(1) - h[i] * h[i]);
      }
      Real* det = de + static_cast<size_t>(t) * H;
      Real* dpu = dp + static_cast<size_t>(u) * H;
      for (int i = 0; i < H; ++i) {
        det[i] += dh[i];
        dpu[i] += dh[i];
      }
      for (int i = 0; i < H; ++i) {
        const Real hi2 = h[i];
        Real* dwrow = dW + static_cast<size_t>(i) * V;
        for (int v = 0; v < V; ++v) dwrow[v] += hi2 * g[v];
        Real* dwdrow = dWd + static_cast<size_t>(i) * D;
        for (int j = 0; j < D; ++j) dwdrow[j] += hi2 * gd[j];
      }
      for (int v = 0; v < V; ++v) db[v] += g[v];
      for (int j = 0; j < D; ++j) dbd[j] += gd[j];
    }
  }
}

template <typename T>
wttStatus_t run_mb_fused(const T* e, const T* p, const T* W, const T* bias,
                         T* de, T* dp, T* dW, T* db, const int* labels,
                         const int* label_lengths, const int* input_lengths,
                         int H, int V, int B, int maxT, int maxU,
                         const int* durs, const int* bb, int K, T sigma,
                         T* costs, wttOptions options) {
  if (!e || !p || !W || !bias || !labels || !label_lengths ||
      !input_lengths || !costs)
    return WTT_STATUS_BAD_ARGUMENT;
  const int n_grads = (de != nullptr) + (dp != nullptr) + (dW != nullptr) +
                      (db != nullptr);
  if (n_grads != 0 && n_grads != 4) return WTT_STATUS_BAD_ARGUMENT;
  if (K < 0 || (K > 0 && (!durs || !bb)))
    return WTT_STATUS_BAD_ARGUMENT;
  if (H <= 0 || V <= 0 || B <= 0 || maxT <= 0 || maxU <= 0 ||
      options.blank_label < 0 || options.blank_label >= V ||
      options.from_log_probs != 0 ||
      !(options.fastemit_lambda >= 0.0f) ||
      !(options.delay_penalty >= 0.0f))
    return WTT_STATUS_BAD_ARGUMENT;
  for (int k = 0; k < K; ++k) {
    if (durs[k] < 2) return WTT_STATUS_BAD_ARGUMENT;
    if (bb[k] < 0 || bb[k] >= V || bb[k] == options.blank_label)
      return WTT_STATUS_BAD_ARGUMENT;
    for (int j = 0; j < k; ++j)
      if (durs[j] == durs[k] || bb[j] == bb[k])
        return WTT_STATUS_BAD_ARGUMENT;
  }
  for (int b = 0; b < B; ++b) {
    if (input_lengths[b] < 1 || input_lengths[b] > maxT)
      return WTT_STATUS_BAD_ARGUMENT;
    if (label_lengths[b] < 0 || label_lengths[b] + 1 > maxU)
      return WTT_STATUS_BAD_ARGUMENT;
  }

#if defined(_OPENMP)
  if (options.num_threads > 0) omp_set_num_threads(options.num_threads);
#endif

  const size_t e_block = static_cast<size_t>(maxT) * H;
  const size_t p_block = static_cast<size_t>(maxU) * H;
  const size_t wv = static_cast<size_t>(H) * V;
  if (de) {
    std::memset(de, 0, sizeof(T) * e_block * B);
    std::memset(dp, 0, sizeof(T) * p_block * B);
    std::memset(dW, 0, sizeof(T) * wv);
    std::memset(db, 0, sizeof(T) * V);
  }

  bool ok = true;
#if defined(_OPENMP)
#pragma omp parallel for schedule(dynamic)
#endif
  for (int b = 0; b < B; ++b) {
    const int Tb = input_lengths[b];
    const int Ub = label_lengths[b] + 1;
    std::vector<T> dW_loc, db_loc;
    if (de) {
      dW_loc.assign(wv, T(0));
      db_loc.assign(V, T(0));
    }
    T cost;
    run_mb_fused_utterance<T>(
        e + b * e_block, p + b * p_block, W, bias,
        de ? de + b * e_block : nullptr, dp ? dp + b * p_block : nullptr,
        de ? dW_loc.data() : nullptr, de ? db_loc.data() : nullptr,
        labels + static_cast<size_t>(b) * (maxU - 1), Tb, Ub, H, V,
        options.blank_label, durs, bb, K, sigma, &cost,
        static_cast<T>(options.fastemit_lambda),
        static_cast<T>(options.delay_penalty));
    if (!std::isfinite(cost)) ok = false;
    costs[b] = cost;
    if (de) {
#if defined(_OPENMP)
#pragma omp critical(wtt_mb_fused_dw)
#endif
      {
        for (size_t i = 0; i < wv; ++i) dW[i] += dW_loc[i];
        for (int v = 0; v < V; ++v) db[v] += db_loc[v];
      }
    }
  }
  return ok ? WTT_STATUS_SUCCESS : WTT_STATUS_EXECUTION_FAILED;
}

template <typename T>
wttStatus_t run_tdt_fused(const T* e, const T* p, const T* W, const T* bias,
                          const T* Wd, const T* bias_d, T* de, T* dp, T* dW,
                          T* db, T* dWd, T* dbd, const int* labels,
                          const int* label_lengths, const int* input_lengths,
                          int H, int V, int D, int B, int maxT, int maxU,
                          const int* durs, T sigma, T* costs,
                          wttOptions options) {
  if (!e || !p || !W || !bias || !Wd || !bias_d || !labels ||
      !label_lengths || !input_lengths || !costs || !durs)
    return WTT_STATUS_BAD_ARGUMENT;
  const int n_grads = (de != nullptr) + (dp != nullptr) + (dW != nullptr) +
                      (db != nullptr) + (dWd != nullptr) + (dbd != nullptr);
  if (n_grads != 0 && n_grads != 6) return WTT_STATUS_BAD_ARGUMENT;
  if (H <= 0 || V <= 0 || B <= 0 || maxT <= 0 || maxU <= 0 || D <= 0 ||
      D > 32 || options.blank_label < 0 || options.blank_label >= V ||
      options.from_log_probs != 0 ||
      !(options.fastemit_lambda >= 0.0f) ||
      !(options.delay_penalty >= 0.0f))
    return WTT_STATUS_BAD_ARGUMENT;
  bool any_pos = false;
  for (int j = 0; j < D; ++j) {
    if (durs[j] < 0) return WTT_STATUS_BAD_ARGUMENT;
    if (durs[j] >= 1) any_pos = true;
    for (int k = 0; k < j; ++k)
      if (durs[k] == durs[j]) return WTT_STATUS_BAD_ARGUMENT;
  }
  if (!any_pos) return WTT_STATUS_BAD_ARGUMENT;
  for (int b = 0; b < B; ++b) {
    if (input_lengths[b] < 1 || input_lengths[b] > maxT)
      return WTT_STATUS_BAD_ARGUMENT;
    if (label_lengths[b] < 0 || label_lengths[b] + 1 > maxU)
      return WTT_STATUS_BAD_ARGUMENT;
  }

#if defined(_OPENMP)
  if (options.num_threads > 0) omp_set_num_threads(options.num_threads);
#endif

  const size_t e_block = static_cast<size_t>(maxT) * H;
  const size_t p_block = static_cast<size_t>(maxU) * H;
  const size_t wv = static_cast<size_t>(H) * V;
  const size_t wd = static_cast<size_t>(H) * D;
  if (de) {
    std::memset(de, 0, sizeof(T) * e_block * B);
    std::memset(dp, 0, sizeof(T) * p_block * B);
    std::memset(dW, 0, sizeof(T) * wv);
    std::memset(db, 0, sizeof(T) * V);
    std::memset(dWd, 0, sizeof(T) * wd);
    std::memset(dbd, 0, sizeof(T) * D);
  }

  bool ok = true;
#if defined(_OPENMP)
#pragma omp parallel for schedule(dynamic)
#endif
  for (int b = 0; b < B; ++b) {
    const int Tb = input_lengths[b];
    const int Ub = label_lengths[b] + 1;
    std::vector<T> dW_loc, db_loc, dWd_loc, dbd_loc;
    if (de) {
      dW_loc.assign(wv, T(0));
      db_loc.assign(V, T(0));
      dWd_loc.assign(wd, T(0));
      dbd_loc.assign(D, T(0));
    }
    T cost;
    run_tdt_fused_utterance<T>(
        e + b * e_block, p + b * p_block, W, bias, Wd, bias_d,
        de ? de + b * e_block : nullptr, dp ? dp + b * p_block : nullptr,
        de ? dW_loc.data() : nullptr, de ? db_loc.data() : nullptr,
        de ? dWd_loc.data() : nullptr, de ? dbd_loc.data() : nullptr,
        labels + static_cast<size_t>(b) * (maxU - 1), Tb, Ub, H, V, D,
        options.blank_label, durs, sigma, &cost,
        static_cast<T>(options.fastemit_lambda),
        static_cast<T>(options.delay_penalty));
    if (std::isnan(cost)) ok = false;
    costs[b] = cost;
    if (de) {
#if defined(_OPENMP)
#pragma omp critical(wtt_tdt_fused_dw)
#endif
      {
        for (size_t i = 0; i < wv; ++i) dW[i] += dW_loc[i];
        for (int v = 0; v < V; ++v) db[v] += db_loc[v];
        for (size_t i = 0; i < wd; ++i) dWd[i] += dWd_loc[i];
        for (int j = 0; j < D; ++j) dbd[j] += dbd_loc[j];
      }
    }
  }
  return ok ? WTT_STATUS_SUCCESS : WTT_STATUS_EXECUTION_FAILED;
}

// ---------------------------------------------------------------------------
// Pruned (banded) engine: the dense loss restricted to band cells
// (t, ranges[t] + s), s in [0, s_range). Scalar twin of the JAX band
// recursion in warp_transducer_tpu/ops/pruned.py (same masks, same
// infeasible-band semantics).
// ---------------------------------------------------------------------------

// Band alpha recursion on (Tb, S) caches; returns ll (-inf if the band
// admits no complete alignment). Shared by the banded and the
// banded-fused engines.
template <typename Real>
Real band_alpha(const Real* lpb, const Real* lpe, const int* ranges,
                int Tb, int Ub, int S, Real* alpha) {
  auto idx = [S](int t, int s) { return static_cast<size_t>(t) * S + s; };
  auto valid = [&](int t, int s) { return ranges[t] + s < Ub; };
  for (int t = 0; t < Tb; ++t) {
    const int delta = (t > 0) ? ranges[t] - ranges[t - 1] : 0;
    for (int s = 0; s < S; ++s) {
      const size_t cell = idx(t, s);
      if (!valid(t, s)) {
        alpha[cell] = kNegInf<Real>;
        continue;
      }
      if (t == 0 && s == 0) {
        alpha[cell] = 0;  // ranges[0] == 0 => lattice origin
        continue;
      }
      Real ne = kNegInf<Real>;
      if (t > 0 && s + delta < S)
        ne = alpha[idx(t - 1, s + delta)] + lpb[idx(t - 1, s + delta)];
      Real em = kNegInf<Real>;
      if (s > 0) em = alpha[idx(t, s - 1)] + lpe[idx(t, s - 1)];
      alpha[cell] = logaddexp(ne, em);
    }
  }
  const int s_star = Ub - 1 - ranges[Tb - 1];
  if (s_star < 0 || s_star >= S) return kNegInf<Real>;
  return alpha[idx(Tb - 1, s_star)] + lpb[idx(Tb - 1, s_star)];
}

template <typename Real>
void band_beta(const Real* lpb, const Real* lpe, const int* ranges,
               int Tb, int Ub, int S, Real* beta) {
  auto idx = [S](int t, int s) { return static_cast<size_t>(t) * S + s; };
  auto valid = [&](int t, int s) { return ranges[t] + s < Ub; };
  const int s_star = Ub - 1 - ranges[Tb - 1];
  for (int t = Tb - 1; t >= 0; --t) {
    const int delta_n = (t < Tb - 1) ? ranges[t + 1] - ranges[t] : 0;
    for (int s = S - 1; s >= 0; --s) {
      const size_t cell = idx(t, s);
      if (!valid(t, s)) {
        beta[cell] = kNegInf<Real>;
        continue;
      }
      if (t == Tb - 1 && s == s_star) {
        beta[cell] = lpb[cell];
        continue;
      }
      Real ne = kNegInf<Real>;
      if (t < Tb - 1 && s - delta_n >= 0)
        ne = beta[idx(t + 1, s - delta_n)] + lpb[cell];
      Real em = kNegInf<Real>;
      if (s + 1 < S && valid(t, s + 1)) em = beta[idx(t, s + 1)] + lpe[cell];
      beta[cell] = logaddexp(ne, em);
    }
  }
}

template <typename Real>
void run_pruned_utterance(const Real* acts /* (T, S, V) rows */, Real* grads,
                          const int* ranges, const int* labels, int Tb,
                          int Ub, int S, int V, int blank, Real* cost,
                          Real* scratch /* 5*Tb*S */,
                          Real fastemit_lambda = Real(0),
                          Real delay_penalty = Real(0)) {
  const size_t n = static_cast<size_t>(Tb) * S;
  std::vector<Real> own;
  if (!scratch) {
    own.resize(5 * n);
    scratch = own.data();
  }
  Real* lpb = scratch;
  Real* lpe = scratch + n;
  Real* denom = scratch + 2 * n;
  Real* alpha = scratch + 3 * n;
  Real* beta = scratch + 4 * n;

  auto idx = [S](int t, int s) { return static_cast<size_t>(t) * S + s; };
  auto valid = [&](int t, int s) { return ranges[t] + s < Ub; };

  // caches: fused log-softmax denominator + blank/label log-probs per cell
  for (int t = 0; t < Tb; ++t) {
    for (int s = 0; s < S; ++s) {
      const size_t cell = idx(t, s);
      if (!valid(t, s)) {
        lpb[cell] = kNegInf<Real>;
        lpe[cell] = kNegInf<Real>;
        denom[cell] = 0;
        continue;
      }
      const int u = ranges[t] + s;
      const Real* row = acts + cell * V;
      Real hi = row[0];
      for (int v = 1; v < V; ++v) hi = std::max(hi, row[v]);
      Real sum = 0;
      for (int v = 0; v < V; ++v) sum += std::exp(row[v] - hi);
      const Real d = -hi - std::log(sum);
      denom[cell] = d;
      lpb[cell] = row[blank] + d;
      lpe[cell] = (u < Ub - 1) ? row[labels[u]] + d : kNegInf<Real>;
    }
  }
  if (delay_penalty != Real(0)) {
    const Real mid = Real(Tb - 1) / Real(2);
    for (int t = 0; t < Tb; ++t)
      for (int sdx = 0; sdx < S; ++sdx)
        lpe[idx(t, sdx)] += delay_penalty * (mid - Real(t));
  }

  const Real ll = band_alpha(lpb, lpe, ranges, Tb, Ub, S, alpha);
  // infeasible band (no complete alignment fits): huge finite cost, zero
  // gradients — mirrors the JAX NEG sentinel semantics (ops/pruned.py)
  *cost = std::isfinite(ll) ? -ll : static_cast<Real>(1e30);
  if (!grads || !std::isfinite(ll)) return;

  band_beta(lpb, lpe, ranges, Tb, Ub, S, beta);

  // gradient: dense on the band, fused log-softmax convention
  for (int t = 0; t < Tb; ++t) {
    const int delta_n = (t < Tb - 1) ? ranges[t + 1] - ranges[t] : 0;
    for (int s = 0; s < S; ++s) {
      const size_t cell = idx(t, s);
      if (!valid(t, s)) continue;
      const int u = ranges[t] + s;
      const Real a = alpha[cell];
      // blank-transition continuation: beta(t+1, u) or 1 at the terminal
      Real bt = kNegInf<Real>;
      if (t == Tb - 1 && u == Ub - 1) bt = 0;
      else if (t < Tb - 1 && s - delta_n >= 0) bt = beta[idx(t + 1, s - delta_n)];
      // emit-transition continuation: beta(t, u+1) (must be inside band)
      Real bu = kNegInf<Real>;
      if (u + 1 < Ub && s + 1 < S) bu = beta[idx(t, s + 1)];
      const Real gb = std::exp(a + lpb[cell] + bt - ll);
      const Real ge = (u < Ub - 1) ? std::exp(a + lpe[cell] + bu - ll) : Real(0);
      // FastEmit: + lambda*ge in the softmax coefficient, (1+lambda) on
      // the emit arc
      const Real coef = std::exp(a + beta[cell] - ll) + fastemit_lambda * ge;
      const Real* row = acts + cell * V;
      Real* grow = grads + cell * V;
      const Real d = denom[cell];
      for (int v = 0; v < V; ++v) grow[v] = coef * std::exp(row[v] + d);
      grow[blank] -= gb;
      if (u < Ub - 1) grow[labels[u]] -= (Real(1) + fastemit_lambda) * ge;
    }
  }
}

template <typename T>
wttStatus_t run_pruned(const T* acts, T* grads, const int* ranges,
                       const int* labels, const int* label_lengths,
                       const int* input_lengths, int V, int B, int maxT,
                       int S, int maxL, T* costs, void* workspace,
                       wttOptions options) {
  if (!acts || !ranges || !labels || !label_lengths || !input_lengths || !costs)
    return WTT_STATUS_BAD_ARGUMENT;
  if (V <= 0 || B <= 0 || maxT <= 0 || S < 2 || maxL < 0 ||
      options.blank_label < 0 || options.blank_label >= V ||
      options.from_log_probs != 0 ||
      !(options.fastemit_lambda >= 0.0f) ||
      !(options.delay_penalty >= 0.0f))
    return WTT_STATUS_BAD_ARGUMENT;
  for (int b = 0; b < B; ++b) {
    const int Tb = input_lengths[b];
    const int Ub = label_lengths[b] + 1;
    if (Tb < 1 || Tb > maxT) return WTT_STATUS_BAD_ARGUMENT;
    if (label_lengths[b] < 0 || label_lengths[b] > maxL)
      return WTT_STATUS_BAD_ARGUMENT;
    const int* r = ranges + static_cast<size_t>(b) * maxT;
    if (r[0] != 0) return WTT_STATUS_BAD_ARGUMENT;
    for (int t = 0; t < Tb; ++t) {
      if (r[t] < 0 || r[t] > Ub - 1) return WTT_STATUS_BAD_ARGUMENT;
      if (t > 0 && (r[t] < r[t - 1] || r[t] - r[t - 1] > S - 1))
        return WTT_STATUS_BAD_ARGUMENT;
    }
  }

#if defined(_OPENMP)
  if (options.num_threads > 0) omp_set_num_threads(options.num_threads);
#endif

  const size_t block = static_cast<size_t>(maxT) * S * V;
  const size_t ws_per_mb = 5u * static_cast<size_t>(maxT) * S;
  T* ws = static_cast<T*>(workspace);
  if (grads) std::memset(grads, 0, sizeof(T) * block * B);

  bool ok = true;
#if defined(_OPENMP)
#pragma omp parallel for schedule(dynamic)
#endif
  for (int b = 0; b < B; ++b) {
    const int Tb = input_lengths[b];
    const int Ub = label_lengths[b] + 1;
    T cost;
    run_pruned_utterance<T>(
        acts + b * block, grads ? grads + b * block : nullptr,
        ranges + static_cast<size_t>(b) * maxT,
        labels + static_cast<size_t>(b) * maxL,
        Tb, Ub, S, V, options.blank_label, &cost,
        ws ? ws + b * ws_per_mb : nullptr,
        static_cast<T>(options.fastemit_lambda),
        static_cast<T>(options.delay_penalty));
    if (!std::isfinite(cost)) ok = false;
    costs[b] = cost;
  }
  return ok ? WTT_STATUS_SUCCESS : WTT_STATUS_EXECUTION_FAILED;
}

// ---------------------------------------------------------------------------
// Joint-fused engine: logits[t,u] = tanh(e[t] + p[u]) @ W + bias produced
// one O(H·V) cell row at a time — the (T, U, V) tensor never exists.
// Scalar twin of the JAX fused op (warp_transducer_tpu/ops/fused_joint.py);
// same lattice, same gradient contraction (de/dp via (g·Wᵀ)⊙tanh′,
// dW via h⊗g, db via Σg).
// ---------------------------------------------------------------------------

template <typename Real>
void run_fused_utterance(const Real* e, const Real* p, const Real* W,
                         const Real* bias, Real* de, Real* dp, Real* dW,
                         Real* db, const int* labels, int Tb, int Ub, int H,
                         int V, int blank, Real* cost, Real* scratch,
                         Real fastemit_lambda = Real(0),
                         Real delay_penalty = Real(0)) {
  Lattice<Real> lat(Tb, Ub, V, Ub, blank, /*from_log_probs=*/true, scratch);
  Real* lpb = lat.lpb();
  Real* lpe = lat.lpe();
  std::vector<Real> denom(static_cast<size_t>(Tb) * Ub);
  std::vector<Real> h(H), logits(V);

  auto idx = [Ub](int t, int u) { return static_cast<size_t>(t) * Ub + u; };
  auto cell_logits = [&](int t, int u) {
    const Real* et = e + static_cast<size_t>(t) * H;
    const Real* pu = p + static_cast<size_t>(u) * H;
    for (int i = 0; i < H; ++i) h[i] = std::tanh(et[i] + pu[i]);
    for (int v = 0; v < V; ++v) logits[v] = bias[v];
    for (int i = 0; i < H; ++i) {
      const Real hi = h[i];
      const Real* wrow = W + static_cast<size_t>(i) * V;
      for (int v = 0; v < V; ++v) logits[v] += hi * wrow[v];
    }
  };

  for (int t = 0; t < Tb; ++t) {
    for (int u = 0; u < Ub; ++u) {
      cell_logits(t, u);
      Real hi = logits[0];
      for (int v = 1; v < V; ++v) hi = std::max(hi, logits[v]);
      Real s = 0;
      for (int v = 0; v < V; ++v) s += std::exp(logits[v] - hi);
      const Real d = -hi - std::log(s);
      const size_t cell = idx(t, u);
      denom[cell] = d;
      lpb[cell] = logits[blank] + d;
      if (u < Ub - 1) lpe[cell] = logits[labels[u]] + d;
    }
  }
  if (delay_penalty != Real(0)) {
    const Real mid = Real(Tb - 1) / Real(2);
    for (int t = 0; t < Tb; ++t)
      for (int u = 0; u < Ub - 1; ++u)
        lpe[idx(t, u)] += delay_penalty * (mid - Real(t));
  }

  const Real ll = lat.forward();
  *cost = -ll;
  if (!de) return;

  lat.backward();
  const Real* alpha = lat.alpha();
  const Real* beta = lat.beta();
  std::vector<Real> g(V), dh(H);
  for (int t = 0; t < Tb; ++t) {
    for (int u = 0; u < Ub; ++u) {
      cell_logits(t, u);
      const size_t cell = idx(t, u);
      const Real a = alpha[cell];
      const Real bt = (t < Tb - 1) ? beta[idx(t + 1, u)]
                                   : ((u == Ub - 1) ? Real(0) : kNegInf<Real>);
      const Real bu = (u < Ub - 1) ? beta[idx(t, u + 1)] : kNegInf<Real>;
      const Real gb = std::exp(a + lpb[cell] + bt - ll);
      const Real ge = (u < Ub - 1) ? std::exp(a + lpe[cell] + bu - ll)
                                   : Real(0);
      // FastEmit: + lambda*ge in the softmax coefficient, (1+lambda) on
      // the emit arc
      const Real coef = std::exp(a + beta[cell] - ll) + fastemit_lambda * ge;
      const Real d = denom[cell];
      for (int v = 0; v < V; ++v) g[v] = coef * std::exp(logits[v] + d);
      g[blank] -= gb;
      if (u < Ub - 1) g[labels[u]] -= (Real(1) + fastemit_lambda) * ge;

      for (int i = 0; i < H; ++i) {
        const Real* wrow = W + static_cast<size_t>(i) * V;
        Real acc = 0;
        for (int v = 0; v < V; ++v) acc += wrow[v] * g[v];
        dh[i] = acc * (Real(1) - h[i] * h[i]);
      }
      Real* det = de + static_cast<size_t>(t) * H;
      Real* dpu = dp + static_cast<size_t>(u) * H;
      for (int i = 0; i < H; ++i) {
        det[i] += dh[i];
        dpu[i] += dh[i];
      }
      for (int i = 0; i < H; ++i) {
        const Real hi = h[i];
        Real* dwrow = dW + static_cast<size_t>(i) * V;
        for (int v = 0; v < V; ++v) dwrow[v] += hi * g[v];
      }
      for (int v = 0; v < V; ++v) db[v] += g[v];
    }
  }
}

template <typename T>
wttStatus_t run_fused(const T* e, const T* p, const T* W, const T* bias,
                      T* de, T* dp, T* dW, T* db, const int* labels,
                      const int* label_lengths, const int* input_lengths,
                      int H, int V, int B, int maxT, int maxU, T* costs,
                      void* workspace, wttOptions options) {
  if (!e || !p || !W || !bias || !labels || !label_lengths ||
      !input_lengths || !costs)
    return WTT_STATUS_BAD_ARGUMENT;
  const int n_grads = (de != nullptr) + (dp != nullptr) + (dW != nullptr) +
                      (db != nullptr);
  if (n_grads != 0 && n_grads != 4) return WTT_STATUS_BAD_ARGUMENT;
  if (H <= 0 || V <= 0 || B <= 0 || maxT <= 0 || maxU <= 0 ||
      options.blank_label < 0 || options.blank_label >= V ||
      options.from_log_probs != 0 ||
      !(options.fastemit_lambda >= 0.0f) ||
      !(options.delay_penalty >= 0.0f))
    return WTT_STATUS_BAD_ARGUMENT;
  for (int b = 0; b < B; ++b) {
    if (input_lengths[b] < 1 || input_lengths[b] > maxT)
      return WTT_STATUS_BAD_ARGUMENT;
    if (label_lengths[b] < 0 || label_lengths[b] + 1 > maxU)
      return WTT_STATUS_BAD_ARGUMENT;
  }

#if defined(_OPENMP)
  if (options.num_threads > 0) omp_set_num_threads(options.num_threads);
#endif

  const size_t e_block = static_cast<size_t>(maxT) * H;
  const size_t p_block = static_cast<size_t>(maxU) * H;
  const size_t wv = static_cast<size_t>(H) * V;
  const size_t ws_per_mb = 5u * static_cast<size_t>(maxT) * maxU;
  T* ws = static_cast<T*>(workspace);
  if (de) {
    std::memset(de, 0, sizeof(T) * e_block * B);
    std::memset(dp, 0, sizeof(T) * p_block * B);
    std::memset(dW, 0, sizeof(T) * wv);
    std::memset(db, 0, sizeof(T) * V);
  }

  bool ok = true;
#if defined(_OPENMP)
#pragma omp parallel for schedule(dynamic)
#endif
  for (int b = 0; b < B; ++b) {
    const int Tb = input_lengths[b];
    const int Ub = label_lengths[b] + 1;
    // de/dp rows belong to this utterance alone; dW/db are shared across
    // the minibatch — accumulate locally, merge under the critical section
    std::vector<T> dW_loc, db_loc;
    if (de) {
      dW_loc.assign(wv, T(0));
      db_loc.assign(V, T(0));
    }
    T cost;
    run_fused_utterance<T>(
        e + b * e_block, p + b * p_block, W, bias,
        de ? de + b * e_block : nullptr, dp ? dp + b * p_block : nullptr,
        de ? dW_loc.data() : nullptr, de ? db_loc.data() : nullptr,
        labels + static_cast<size_t>(b) * (maxU - 1), Tb, Ub, H, V,
        options.blank_label, &cost, ws ? ws + b * ws_per_mb : nullptr,
        static_cast<T>(options.fastemit_lambda),
        static_cast<T>(options.delay_penalty));
    if (!std::isfinite(cost)) ok = false;
    costs[b] = cost;
    if (de) {
#if defined(_OPENMP)
#pragma omp critical(wtt_fused_dw)
#endif
      {
        for (size_t i = 0; i < wv; ++i) dW[i] += dW_loc[i];
        for (int v = 0; v < V; ++v) db[v] += db_loc[v];
      }
    }
  }
  return ok ? WTT_STATUS_SUCCESS : WTT_STATUS_EXECUTION_FAILED;
}

// ---------------------------------------------------------------------------
// Pruned + fused engine: logits generated per band cell from the trunk
// activations (tanh(e[t] + p[u]) @ W + bias), consumed in place. Scalar
// twin of the JAX op (warp_transducer_tpu/ops/pruned_fused.py): neither
// the (T, U, V) nor even the (T, S, V) banded logits ever exist.
// ---------------------------------------------------------------------------

template <typename Real>
void run_pruned_fused_utterance(const Real* e, const Real* p, const Real* W,
                                const Real* bias, Real* de, Real* dp,
                                Real* dW, Real* db, const int* ranges,
                                const int* labels, int Tb, int Ub, int S,
                                int H, int V, int blank, Real* cost,
                                Real* scratch /* 5*Tb*S */,
                                Real fastemit_lambda = Real(0),
                                Real delay_penalty = Real(0)) {
  const size_t n = static_cast<size_t>(Tb) * S;
  std::vector<Real> own;
  if (!scratch) {
    own.resize(5 * n);
    scratch = own.data();
  }
  Real* lpb = scratch;
  Real* lpe = scratch + n;
  Real* denom = scratch + 2 * n;
  Real* alpha = scratch + 3 * n;
  Real* beta = scratch + 4 * n;

  auto idx = [S](int t, int s) { return static_cast<size_t>(t) * S + s; };
  auto valid = [&](int t, int s) { return ranges[t] + s < Ub; };

  std::vector<Real> h(H), logits(V);
  auto cell_logits = [&](int t, int u) {
    const Real* et = e + static_cast<size_t>(t) * H;
    const Real* pu = p + static_cast<size_t>(u) * H;
    for (int i = 0; i < H; ++i) h[i] = std::tanh(et[i] + pu[i]);
    for (int v = 0; v < V; ++v) logits[v] = bias[v];
    for (int i = 0; i < H; ++i) {
      const Real hi = h[i];
      const Real* wrow = W + static_cast<size_t>(i) * V;
      for (int v = 0; v < V; ++v) logits[v] += hi * wrow[v];
    }
  };

  for (int t = 0; t < Tb; ++t) {
    for (int s = 0; s < S; ++s) {
      const size_t cell = idx(t, s);
      if (!valid(t, s)) {
        lpb[cell] = kNegInf<Real>;
        lpe[cell] = kNegInf<Real>;
        denom[cell] = 0;
        continue;
      }
      const int u = ranges[t] + s;
      cell_logits(t, u);
      Real hi = logits[0];
      for (int v = 1; v < V; ++v) hi = std::max(hi, logits[v]);
      Real sum = 0;
      for (int v = 0; v < V; ++v) sum += std::exp(logits[v] - hi);
      const Real d = -hi - std::log(sum);
      denom[cell] = d;
      lpb[cell] = logits[blank] + d;
      lpe[cell] = (u < Ub - 1) ? logits[labels[u]] + d : kNegInf<Real>;
    }
  }
  if (delay_penalty != Real(0)) {
    const Real mid = Real(Tb - 1) / Real(2);
    for (int t = 0; t < Tb; ++t)
      for (int sdx = 0; sdx < S; ++sdx)
        lpe[idx(t, sdx)] += delay_penalty * (mid - Real(t));
  }

  const Real ll = band_alpha(lpb, lpe, ranges, Tb, Ub, S, alpha);
  // infeasible band: huge finite cost, zero gradients (ops/pruned.py)
  *cost = std::isfinite(ll) ? -ll : static_cast<Real>(1e30);
  if (!de || !std::isfinite(ll)) return;

  band_beta(lpb, lpe, ranges, Tb, Ub, S, beta);

  std::vector<Real> g(V), dh(H);
  for (int t = 0; t < Tb; ++t) {
    const int delta_n = (t < Tb - 1) ? ranges[t + 1] - ranges[t] : 0;
    for (int s = 0; s < S; ++s) {
      const size_t cell = idx(t, s);
      if (!valid(t, s)) continue;
      const int u = ranges[t] + s;
      cell_logits(t, u);
      const Real a = alpha[cell];
      Real bt = kNegInf<Real>;
      if (t == Tb - 1 && u == Ub - 1) bt = 0;
      else if (t < Tb - 1 && s - delta_n >= 0) bt = beta[idx(t + 1, s - delta_n)];
      Real bu = kNegInf<Real>;
      if (u + 1 < Ub && s + 1 < S) bu = beta[idx(t, s + 1)];
      const Real gb = std::exp(a + lpb[cell] + bt - ll);
      const Real ge = (u < Ub - 1) ? std::exp(a + lpe[cell] + bu - ll) : Real(0);
      // FastEmit: + lambda*ge in the softmax coefficient, (1+lambda) on
      // the emit arc
      const Real coef = std::exp(a + beta[cell] - ll) + fastemit_lambda * ge;
      const Real d = denom[cell];
      for (int v = 0; v < V; ++v) g[v] = coef * std::exp(logits[v] + d);
      g[blank] -= gb;
      if (u < Ub - 1) g[labels[u]] -= (Real(1) + fastemit_lambda) * ge;

      for (int i = 0; i < H; ++i) {
        const Real* wrow = W + static_cast<size_t>(i) * V;
        Real acc = 0;
        for (int v = 0; v < V; ++v) acc += wrow[v] * g[v];
        dh[i] = acc * (Real(1) - h[i] * h[i]);
      }
      Real* det = de + static_cast<size_t>(t) * H;
      Real* dpu = dp + static_cast<size_t>(u) * H;
      for (int i = 0; i < H; ++i) {
        det[i] += dh[i];
        dpu[i] += dh[i];
      }
      for (int i = 0; i < H; ++i) {
        const Real hi = h[i];
        Real* dwrow = dW + static_cast<size_t>(i) * V;
        for (int v = 0; v < V; ++v) dwrow[v] += hi * g[v];
      }
      for (int v = 0; v < V; ++v) db[v] += g[v];
    }
  }
}

template <typename T>
wttStatus_t run_pruned_fused(const T* e, const T* p, const T* W,
                             const T* bias, T* de, T* dp, T* dW, T* db,
                             const int* ranges, const int* labels,
                             const int* label_lengths,
                             const int* input_lengths, int H, int V, int B,
                             int maxT, int S, int maxU, T* costs,
                             void* workspace, wttOptions options) {
  if (!e || !p || !W || !bias || !ranges || !labels || !label_lengths ||
      !input_lengths || !costs)
    return WTT_STATUS_BAD_ARGUMENT;
  const int n_grads = (de != nullptr) + (dp != nullptr) + (dW != nullptr) +
                      (db != nullptr);
  if (n_grads != 0 && n_grads != 4) return WTT_STATUS_BAD_ARGUMENT;
  if (H <= 0 || V <= 0 || B <= 0 || maxT <= 0 || S < 2 || maxU <= 1 ||
      options.blank_label < 0 || options.blank_label >= V ||
      options.from_log_probs != 0 ||
      !(options.fastemit_lambda >= 0.0f) ||
      !(options.delay_penalty >= 0.0f))
    return WTT_STATUS_BAD_ARGUMENT;
  for (int b = 0; b < B; ++b) {
    const int Tb = input_lengths[b];
    const int Ub = label_lengths[b] + 1;
    if (Tb < 1 || Tb > maxT) return WTT_STATUS_BAD_ARGUMENT;
    if (label_lengths[b] < 0 || Ub > maxU) return WTT_STATUS_BAD_ARGUMENT;
    const int* r = ranges + static_cast<size_t>(b) * maxT;
    if (r[0] != 0) return WTT_STATUS_BAD_ARGUMENT;
    for (int t = 0; t < Tb; ++t) {
      if (r[t] < 0 || r[t] > Ub - 1) return WTT_STATUS_BAD_ARGUMENT;
      if (t > 0 && (r[t] < r[t - 1] || r[t] - r[t - 1] > S - 1))
        return WTT_STATUS_BAD_ARGUMENT;
    }
  }

#if defined(_OPENMP)
  if (options.num_threads > 0) omp_set_num_threads(options.num_threads);
#endif

  const size_t e_block = static_cast<size_t>(maxT) * H;
  const size_t p_block = static_cast<size_t>(maxU) * H;
  const size_t wv = static_cast<size_t>(H) * V;
  const size_t ws_per_mb = 5u * static_cast<size_t>(maxT) * S;
  T* ws = static_cast<T*>(workspace);
  if (de) {
    std::memset(de, 0, sizeof(T) * e_block * B);
    std::memset(dp, 0, sizeof(T) * p_block * B);
    std::memset(dW, 0, sizeof(T) * wv);
    std::memset(db, 0, sizeof(T) * V);
  }

  bool ok = true;
#if defined(_OPENMP)
#pragma omp parallel for schedule(dynamic)
#endif
  for (int b = 0; b < B; ++b) {
    const int Tb = input_lengths[b];
    const int Ub = label_lengths[b] + 1;
    std::vector<T> dW_loc, db_loc;
    if (de) {
      dW_loc.assign(wv, T(0));
      db_loc.assign(V, T(0));
    }
    T cost;
    run_pruned_fused_utterance<T>(
        e + b * e_block, p + b * p_block, W, bias,
        de ? de + b * e_block : nullptr, dp ? dp + b * p_block : nullptr,
        de ? dW_loc.data() : nullptr, de ? db_loc.data() : nullptr,
        ranges + static_cast<size_t>(b) * maxT,
        labels + static_cast<size_t>(b) * (maxU - 1), Tb, Ub, S, H, V,
        options.blank_label, &cost, ws ? ws + b * ws_per_mb : nullptr,
        static_cast<T>(options.fastemit_lambda),
        static_cast<T>(options.delay_penalty));
    if (!std::isfinite(cost)) ok = false;
    costs[b] = cost;
    if (de) {
#if defined(_OPENMP)
#pragma omp critical(wtt_pruned_fused_dw)
#endif
      {
        for (size_t i = 0; i < wv; ++i) dW[i] += dW_loc[i];
        for (int v = 0; v < V; ++v) db[v] += db_loc[v];
      }
    }
  }
  return ok ? WTT_STATUS_SUCCESS : WTT_STATUS_EXECUTION_FAILED;
}

}  // namespace

extern "C" {

// 2: wtt_rnnt_loss signatures gained a caller-workspace parameter and the
// pruned engine was added — ABI-incompatible with version 1.
// 3: additive — wtt_rnnt_loss_multiblank(_fp64) (arXiv 2211.03541),
//    wtt_rnnt_loss_tdt(_fp64) (arXiv 2304.06795), and their fused-joint
//    variants wtt_rnnt_loss_{multiblank,tdt}_fused(_fp64).
int wtt_get_version(void) { return 3; }

const char* wtt_get_status_string(wttStatus_t status) {
  switch (status) {
    case WTT_STATUS_SUCCESS: return "no error";
    case WTT_STATUS_BAD_ARGUMENT: return "bad argument";
    case WTT_STATUS_ALLOC_FAILED: return "allocation failed";
    case WTT_STATUS_EXECUTION_FAILED: return "execution failed";
  }
  return "unknown error";
}

wttStatus_t wtt_get_workspace_size(int maxT, int maxU, int minibatch,
                                   int fp64, size_t* size_bytes) {
  if (maxT <= 0 || maxU <= 0 || minibatch <= 0 || !size_bytes)
    return WTT_STATUS_BAD_ARGUMENT;
  // alpha, beta, lpb, lpe, denom per utterance (allocated internally).
  const size_t elems = 5u * static_cast<size_t>(maxT) * maxU;
  *size_bytes = elems * (fp64 ? sizeof(double) : sizeof(float)) * minibatch;
  return WTT_STATUS_SUCCESS;
}

wttStatus_t wtt_rnnt_loss(const float* acts, float* grads, const int* labels,
                          const int* label_lengths, const int* input_lengths,
                          int alphabet_size, int minibatch, int maxT, int maxU,
                          float* costs, void* workspace, wttOptions options) {
  return run<float>(acts, grads, labels, label_lengths, input_lengths,
                    alphabet_size, minibatch, maxT, maxU, costs, workspace,
                    options);
}

wttStatus_t wtt_rnnt_loss_fp64(const double* acts, double* grads,
                               const int* labels, const int* label_lengths,
                               const int* input_lengths, int alphabet_size,
                               int minibatch, int maxT, int maxU,
                               double* costs, void* workspace,
                               wttOptions options) {
  return run<double>(acts, grads, labels, label_lengths, input_lengths,
                     alphabet_size, minibatch, maxT, maxU, costs, workspace,
                     options);
}

wttStatus_t wtt_rnnt_loss_multiblank(
    const float* acts, float* grads, const int* labels,
    const int* label_lengths, const int* input_lengths, int alphabet_size,
    int minibatch, int maxT, int maxU, const int* big_blank_durations,
    const int* big_blank_indices, int num_big_blanks, float sigma,
    float* costs, wttOptions options) {
  return run_multiblank<float>(acts, grads, labels, label_lengths,
                               input_lengths, alphabet_size, minibatch, maxT,
                               maxU, big_blank_durations, big_blank_indices,
                               num_big_blanks, sigma, costs, options);
}

wttStatus_t wtt_rnnt_loss_multiblank_fp64(
    const double* acts, double* grads, const int* labels,
    const int* label_lengths, const int* input_lengths, int alphabet_size,
    int minibatch, int maxT, int maxU, const int* big_blank_durations,
    const int* big_blank_indices, int num_big_blanks, double sigma,
    double* costs, wttOptions options) {
  return run_multiblank<double>(acts, grads, labels, label_lengths,
                                input_lengths, alphabet_size, minibatch,
                                maxT, maxU, big_blank_durations,
                                big_blank_indices, num_big_blanks, sigma,
                                costs, options);
}

wttStatus_t wtt_rnnt_loss_multiblank_fused(
    const float* e, const float* p, const float* W, const float* bias,
    float* grad_e, float* grad_p, float* grad_W, float* grad_bias,
    const int* labels, const int* label_lengths, const int* input_lengths,
    int hidden, int alphabet_size, int minibatch, int maxT, int maxU,
    const int* big_blank_durations, const int* big_blank_indices,
    int num_big_blanks, float sigma, float* costs, wttOptions options) {
  return run_mb_fused<float>(e, p, W, bias, grad_e, grad_p, grad_W,
                             grad_bias, labels, label_lengths, input_lengths,
                             hidden, alphabet_size, minibatch, maxT, maxU,
                             big_blank_durations, big_blank_indices,
                             num_big_blanks, sigma, costs, options);
}

wttStatus_t wtt_rnnt_loss_multiblank_fused_fp64(
    const double* e, const double* p, const double* W, const double* bias,
    double* grad_e, double* grad_p, double* grad_W, double* grad_bias,
    const int* labels, const int* label_lengths, const int* input_lengths,
    int hidden, int alphabet_size, int minibatch, int maxT, int maxU,
    const int* big_blank_durations, const int* big_blank_indices,
    int num_big_blanks, double sigma, double* costs, wttOptions options) {
  return run_mb_fused<double>(e, p, W, bias, grad_e, grad_p, grad_W,
                              grad_bias, labels, label_lengths,
                              input_lengths, hidden, alphabet_size,
                              minibatch, maxT, maxU, big_blank_durations,
                              big_blank_indices, num_big_blanks, sigma,
                              costs, options);
}

wttStatus_t wtt_rnnt_loss_tdt_fused(
    const float* e, const float* p, const float* W, const float* bias,
    const float* Wd, const float* bias_d,
    float* grad_e, float* grad_p, float* grad_W, float* grad_bias,
    float* grad_Wd, float* grad_bias_d,
    const int* labels, const int* label_lengths, const int* input_lengths,
    int hidden, int alphabet_size, int num_durations, int minibatch,
    int maxT, int maxU, const int* durations, float sigma, float* costs,
    wttOptions options) {
  return run_tdt_fused<float>(e, p, W, bias, Wd, bias_d, grad_e, grad_p,
                              grad_W, grad_bias, grad_Wd, grad_bias_d,
                              labels, label_lengths, input_lengths, hidden,
                              alphabet_size, num_durations, minibatch, maxT,
                              maxU, durations, sigma, costs, options);
}

wttStatus_t wtt_rnnt_loss_tdt_fused_fp64(
    const double* e, const double* p, const double* W, const double* bias,
    const double* Wd, const double* bias_d,
    double* grad_e, double* grad_p, double* grad_W, double* grad_bias,
    double* grad_Wd, double* grad_bias_d,
    const int* labels, const int* label_lengths, const int* input_lengths,
    int hidden, int alphabet_size, int num_durations, int minibatch,
    int maxT, int maxU, const int* durations, double sigma, double* costs,
    wttOptions options) {
  return run_tdt_fused<double>(e, p, W, bias, Wd, bias_d, grad_e, grad_p,
                               grad_W, grad_bias, grad_Wd, grad_bias_d,
                               labels, label_lengths, input_lengths, hidden,
                               alphabet_size, num_durations, minibatch,
                               maxT, maxU, durations, sigma, costs, options);
}

wttStatus_t wtt_rnnt_loss_tdt(
    const float* token_logits, const float* duration_logits,
    float* grads_tok, float* grads_dur, const int* labels,
    const int* label_lengths, const int* input_lengths, int alphabet_size,
    int minibatch, int maxT, int maxU, const int* durations,
    int num_durations, float sigma, float* costs, wttOptions options) {
  return run_tdt<float>(token_logits, duration_logits, grads_tok, grads_dur,
                        labels, label_lengths, input_lengths, alphabet_size,
                        minibatch, maxT, maxU, durations, num_durations,
                        sigma, costs, options);
}

wttStatus_t wtt_rnnt_loss_tdt_fp64(
    const double* token_logits, const double* duration_logits,
    double* grads_tok, double* grads_dur, const int* labels,
    const int* label_lengths, const int* input_lengths, int alphabet_size,
    int minibatch, int maxT, int maxU, const int* durations,
    int num_durations, double sigma, double* costs, wttOptions options) {
  return run_tdt<double>(token_logits, duration_logits, grads_tok, grads_dur,
                         labels, label_lengths, input_lengths, alphabet_size,
                         minibatch, maxT, maxU, durations, num_durations,
                         sigma, costs, options);
}

wttStatus_t wtt_rnnt_loss_pruned(const float* acts, float* grads,
                                 const int* ranges, const int* labels,
                                 const int* label_lengths,
                                 const int* input_lengths, int alphabet_size,
                                 int minibatch, int maxT, int s_range,
                                 int max_label_len, float* costs,
                                 void* workspace, wttOptions options) {
  return run_pruned<float>(acts, grads, ranges, labels, label_lengths,
                           input_lengths, alphabet_size, minibatch, maxT,
                           s_range, max_label_len, costs, workspace, options);
}

wttStatus_t wtt_rnnt_loss_pruned_fp64(const double* acts, double* grads,
                                      const int* ranges, const int* labels,
                                      const int* label_lengths,
                                      const int* input_lengths,
                                      int alphabet_size, int minibatch,
                                      int maxT, int s_range, int max_label_len,
                                      double* costs, void* workspace,
                                      wttOptions options) {
  return run_pruned<double>(acts, grads, ranges, labels, label_lengths,
                            input_lengths, alphabet_size, minibatch, maxT,
                            s_range, max_label_len, costs, workspace, options);
}

wttStatus_t wtt_rnnt_loss_fused_joint(
    const float* e, const float* p, const float* W, const float* bias,
    float* grad_e, float* grad_p, float* grad_W, float* grad_bias,
    const int* labels, const int* label_lengths, const int* input_lengths,
    int hidden_size, int alphabet_size, int minibatch, int maxT, int maxU,
    float* costs, void* workspace, wttOptions options) {
  return run_fused<float>(e, p, W, bias, grad_e, grad_p, grad_W, grad_bias,
                          labels, label_lengths, input_lengths, hidden_size,
                          alphabet_size, minibatch, maxT, maxU, costs,
                          workspace, options);
}

wttStatus_t wtt_rnnt_loss_fused_joint_fp64(
    const double* e, const double* p, const double* W, const double* bias,
    double* grad_e, double* grad_p, double* grad_W, double* grad_bias,
    const int* labels, const int* label_lengths, const int* input_lengths,
    int hidden_size, int alphabet_size, int minibatch, int maxT, int maxU,
    double* costs, void* workspace, wttOptions options) {
  return run_fused<double>(e, p, W, bias, grad_e, grad_p, grad_W, grad_bias,
                           labels, label_lengths, input_lengths, hidden_size,
                           alphabet_size, minibatch, maxT, maxU, costs,
                           workspace, options);
}

wttStatus_t wtt_rnnt_loss_pruned_fused(
    const float* e, const float* p, const float* W, const float* bias,
    float* grad_e, float* grad_p, float* grad_W, float* grad_bias,
    const int* ranges, const int* labels, const int* label_lengths,
    const int* input_lengths, int hidden_size, int alphabet_size,
    int minibatch, int maxT, int s_range, int maxU, float* costs,
    void* workspace, wttOptions options) {
  return run_pruned_fused<float>(
      e, p, W, bias, grad_e, grad_p, grad_W, grad_bias, ranges, labels,
      label_lengths, input_lengths, hidden_size, alphabet_size, minibatch,
      maxT, s_range, maxU, costs, workspace, options);
}

wttStatus_t wtt_rnnt_loss_pruned_fused_fp64(
    const double* e, const double* p, const double* W, const double* bias,
    double* grad_e, double* grad_p, double* grad_W, double* grad_bias,
    const int* ranges, const int* labels, const int* label_lengths,
    const int* input_lengths, int hidden_size, int alphabet_size,
    int minibatch, int maxT, int s_range, int maxU, double* costs,
    void* workspace, wttOptions options) {
  return run_pruned_fused<double>(
      e, p, W, bias, grad_e, grad_p, grad_W, grad_bias, ranges, labels,
      label_lengths, input_lengths, hidden_size, alphabet_size, minibatch,
      maxT, s_range, maxU, costs, workspace, options);
}

wttStatus_t wtt_rnnt_loss_simple(const float* am, const float* lm,
                                 float* grad_am, float* grad_lm,
                                 const int* labels, const int* label_lengths,
                                 const int* input_lengths, int alphabet_size,
                                 int minibatch, int maxT, int maxU,
                                 float* costs, wttOptions options) {
  return run_simple<float>(am, lm, grad_am, grad_lm, labels, label_lengths,
                           input_lengths, alphabet_size, minibatch, maxT,
                           maxU, costs, options);
}

wttStatus_t wtt_rnnt_loss_simple_fp64(const double* am, const double* lm,
                                      double* grad_am, double* grad_lm,
                                      const int* labels,
                                      const int* label_lengths,
                                      const int* input_lengths,
                                      int alphabet_size, int minibatch,
                                      int maxT, int maxU, double* costs,
                                      wttOptions options) {
  return run_simple<double>(am, lm, grad_am, grad_lm, labels, label_lengths,
                            input_lengths, alphabet_size, minibatch, maxT,
                            maxU, costs, options);
}

}  // extern "C"
