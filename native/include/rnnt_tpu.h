/* C ABI for the warp_transducer_tpu native CPU backend.
 *
 * Capability parity with the reference public C API
 * (/root/reference/include/rnnt.h) re-designed without its C-era baggage:
 * no batch_first flag (one canonical (B, T, U, V) row-major layout), and
 * both gradient conventions in one entry point (the reference splits them
 * across its CPU/GPU backends).
 *
 * Workspace contract (reference: rnnt.h:139-143, README.md:36-37): the
 * dense and pruned entry points take a `workspace` pointer. Pass NULL for
 * internal allocation (the convenient default), or a buffer of at least
 * wtt_get_workspace_size(...) bytes for zero-allocation calls — the engine
 * then performs no heap allocation at all.
 */
#ifndef WTT_RNNT_TPU_H
#define WTT_RNNT_TPU_H

#include <stddef.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef enum {
  WTT_STATUS_SUCCESS = 0,
  WTT_STATUS_BAD_ARGUMENT = 1,
  WTT_STATUS_ALLOC_FAILED = 2,
  WTT_STATUS_EXECUTION_FAILED = 3
} wttStatus_t;

/* Semantic options only (cf. rnntOptions, rnnt.h:43-64). */
typedef struct {
  int blank_label;     /* index of the blank symbol                */
  int num_threads;     /* OpenMP threads; 0 = library default      */
  int from_log_probs;  /* 1: inputs are log-softmaxed, sparse grads
                          (reference CPU convention); 0: raw acts,
                          fused log-softmax, dense grads (reference
                          GPU convention)                          */
  float fastemit_lambda; /* FastEmit strength (arXiv:2010.11148):
                            scales the emit-arc gradient by (1+lambda);
                            the loss value is unchanged. 0 = off.    */
  float delay_penalty;   /* Delay-penalized transducer (arXiv:2211.00490):
                            emit arcs at frame t get
                            + lambda*((T_b-1)/2 - t) on their log-weight
                            (modified objective: loss AND gradients
                            change together). 0 = off.               */
} wttOptions;

int wtt_get_version(void);
const char* wtt_get_status_string(wttStatus_t status);

/* Scratch bytes needed by wtt_rnnt_loss for (maxT, maxU, minibatch); also
 * sizes wtt_rnnt_loss_pruned when called with maxU = s_range. Pass the
 * resulting buffer as `workspace`, or NULL to let the library allocate. */
wttStatus_t wtt_get_workspace_size(int maxT, int maxU, int minibatch,
                                   int fp64, size_t* size_bytes);

/* Loss (+ gradient when grads != NULL; score-only otherwise).
 * acts:      (B, maxT, maxU, V) row-major
 * labels:    (B, maxU-1) zero padded
 * costs:     (B,) output
 * grads:     (B, maxT, maxU, V) output or NULL
 * workspace: >= wtt_get_workspace_size bytes, or NULL (internal alloc) */
wttStatus_t wtt_rnnt_loss(const float* acts, float* grads,
                          const int* labels, const int* label_lengths,
                          const int* input_lengths,
                          int alphabet_size, int minibatch,
                          int maxT, int maxU,
                          float* costs, void* workspace, wttOptions options);

wttStatus_t wtt_rnnt_loss_fp64(const double* acts, double* grads,
                               const int* labels, const int* label_lengths,
                               const int* input_lengths,
                               int alphabet_size, int minibatch,
                               int maxT, int maxU,
                               double* costs, void* workspace,
                               wttOptions options);

/* Multi-blank transducer loss (arXiv 2211.03541): num_big_blanks extra
 * blank symbols; emitting big blank k advances t by big_blank_durations[k]
 * (each >= 2, distinct) and the path may end on a big blank consuming the
 * remaining frames exactly. big_blank_indices[k] is its vocab column
 * (distinct, != options.blank_label). sigma is the paper's logit
 * under-normalization (every log-prob shifted by -sigma). Shapes and the
 * grads/score split match wtt_rnnt_loss; scratch is allocated internally
 * (no caller-workspace variant). JAX twin: rnnt_loss_multiblank
 * (warp_transducer_tpu/ops/multiblank.py); oracle:
 * utils/numpy_oracle_multiblank.py. */
wttStatus_t wtt_rnnt_loss_multiblank(
    const float* acts, float* grads, const int* labels,
    const int* label_lengths, const int* input_lengths, int alphabet_size,
    int minibatch, int maxT, int maxU, const int* big_blank_durations,
    const int* big_blank_indices, int num_big_blanks, float sigma,
    float* costs, wttOptions options);

wttStatus_t wtt_rnnt_loss_multiblank_fp64(
    const double* acts, double* grads, const int* labels,
    const int* label_lengths, const int* input_lengths, int alphabet_size,
    int minibatch, int maxT, int maxU, const int* big_blank_durations,
    const int* big_blank_indices, int num_big_blanks, double sigma,
    double* costs, wttOptions options);

/* Token-and-Duration Transducer loss (arXiv 2304.06795): a duration head
 * (num_durations <= 32 raw logits per cell, column j for durations[j])
 * chooses each emission's frame skip; token arcs may use d = 0, blank
 * arcs need d >= 1, the final blank consumes the remaining frames
 * exactly. Raw logits only (both heads' log-softmax fused;
 * options.from_log_probs must be 0); sigma under-normalizes the token
 * head. grads_tok (B,maxT,maxU,V) and grads_dur (B,maxT,maxU,D) must be
 * both non-NULL (training) or both NULL (score-only); scratch is
 * allocated internally. JAX twin: rnnt_loss_tdt
 * (warp_transducer_tpu/ops/tdt.py); oracle: utils/numpy_oracle_tdt.py. */
wttStatus_t wtt_rnnt_loss_tdt(
    const float* token_logits, const float* duration_logits,
    float* grads_tok, float* grads_dur, const int* labels,
    const int* label_lengths, const int* input_lengths, int alphabet_size,
    int minibatch, int maxT, int maxU, const int* durations,
    int num_durations, float sigma, float* costs, wttOptions options);

wttStatus_t wtt_rnnt_loss_tdt_fp64(
    const double* token_logits, const double* duration_logits,
    double* grads_tok, double* grads_dur, const int* labels,
    const int* label_lengths, const int* input_lengths, int alphabet_size,
    int minibatch, int maxT, int maxU, const int* durations,
    int num_durations, double sigma, double* costs, wttOptions options);

/* Fused-joint variants of the duration-arc losses: logits = tanh(e+p)@W
 * + bias are recomputed per cell and consumed in place — the (T, U, V)
 * tensor never exists (JAX twins: rnnt_loss_multiblank_fused_joint /
 * rnnt_loss_tdt_fused_joint). e: (B, maxT, hidden), p: (B, maxU, hidden),
 * W: (hidden, V) row-major, bias: (V,). The six/four grad pointers must
 * be all non-NULL (training) or all NULL (score-only); grad_W/grad_bias
 * (and grad_Wd/grad_bias_d) accumulate over the minibatch. Raw logits
 * only (options.from_log_probs must be 0); scratch allocated internally. */
wttStatus_t wtt_rnnt_loss_multiblank_fused(
    const float* e, const float* p, const float* W, const float* bias,
    float* grad_e, float* grad_p, float* grad_W, float* grad_bias,
    const int* labels, const int* label_lengths, const int* input_lengths,
    int hidden, int alphabet_size, int minibatch, int maxT, int maxU,
    const int* big_blank_durations, const int* big_blank_indices,
    int num_big_blanks, float sigma, float* costs, wttOptions options);

wttStatus_t wtt_rnnt_loss_multiblank_fused_fp64(
    const double* e, const double* p, const double* W, const double* bias,
    double* grad_e, double* grad_p, double* grad_W, double* grad_bias,
    const int* labels, const int* label_lengths, const int* input_lengths,
    int hidden, int alphabet_size, int minibatch, int maxT, int maxU,
    const int* big_blank_durations, const int* big_blank_indices,
    int num_big_blanks, double sigma, double* costs, wttOptions options);

wttStatus_t wtt_rnnt_loss_tdt_fused(
    const float* e, const float* p, const float* W, const float* bias,
    const float* Wd, const float* bias_d,
    float* grad_e, float* grad_p, float* grad_W, float* grad_bias,
    float* grad_Wd, float* grad_bias_d,
    const int* labels, const int* label_lengths, const int* input_lengths,
    int hidden, int alphabet_size, int num_durations, int minibatch,
    int maxT, int maxU, const int* durations, float sigma, float* costs,
    wttOptions options);

wttStatus_t wtt_rnnt_loss_tdt_fused_fp64(
    const double* e, const double* p, const double* W, const double* bias,
    const double* Wd, const double* bias_d,
    double* grad_e, double* grad_p, double* grad_W, double* grad_bias,
    double* grad_Wd, double* grad_bias_d,
    const int* labels, const int* label_lengths, const int* input_lengths,
    int hidden, int alphabet_size, int num_durations, int minibatch,
    int maxT, int maxU, const int* durations, double sigma, double* costs,
    wttOptions options);

/* Pruned (banded) RNN-T loss: the dense loss restricted to a per-frame
 * band of width s_range (the JAX twin is rnnt_loss_pruned; see
 * warp_transducer_tpu/ops/pruned.py for the math and the band contract).
 *
 * acts:   (B, maxT, s_range, V) joint logits on the band, row-major;
 *         acts[b,t,s] is lattice cell (t, ranges[b,t] + s). Raw logits
 *         only (log-softmax fused): options.from_log_probs must be 0.
 * ranges: (B, maxT) int band starts — ranges[b,0] == 0, non-decreasing,
 *         steps <= s_range-1, ranges[b,t] <= U_b - 1.
 * labels: (B, max_label_len) zero padded, max_label_len >= max(label_lengths).
 * grads:  (B, maxT, s_range, V) output or NULL (score-only).
 * An utterance whose band admits no complete alignment gets cost 1e30 and
 * zero gradients (matching the JAX implementation).
 * workspace: >= wtt_get_workspace_size(maxT, s_range, B, fp64) bytes or
 * NULL. */
wttStatus_t wtt_rnnt_loss_pruned(const float* acts, float* grads,
                                 const int* ranges, const int* labels,
                                 const int* label_lengths,
                                 const int* input_lengths,
                                 int alphabet_size, int minibatch,
                                 int maxT, int s_range, int max_label_len,
                                 float* costs, void* workspace,
                                 wttOptions options);

wttStatus_t wtt_rnnt_loss_pruned_fp64(const double* acts, double* grads,
                                      const int* ranges, const int* labels,
                                      const int* label_lengths,
                                      const int* input_lengths,
                                      int alphabet_size, int minibatch,
                                      int maxT, int s_range, int max_label_len,
                                      double* costs, void* workspace,
                                      wttOptions options);

/* Pruned + fused joint: logits generated per band cell from the trunk
 * activations; neither the dense nor the banded logits ever exist.
 * e: (B, maxT, H); p: (B, maxU, H); W: (H, V); bias: (V,)
 * ranges: (B, maxT) band starts (contract of wtt_rnnt_loss_pruned)
 * grads: all four or all NULL (score-only)
 * workspace: >= wtt_get_workspace_size(maxT, s_range, B) bytes or NULL */
wttStatus_t wtt_rnnt_loss_pruned_fused(
    const float* e, const float* p, const float* W, const float* bias,
    float* grad_e, float* grad_p, float* grad_W, float* grad_bias,
    const int* ranges, const int* labels, const int* label_lengths,
    const int* input_lengths, int hidden_size, int alphabet_size,
    int minibatch, int maxT, int s_range, int maxU, float* costs,
    void* workspace, wttOptions options);

wttStatus_t wtt_rnnt_loss_pruned_fused_fp64(
    const double* e, const double* p, const double* W, const double* bias,
    double* grad_e, double* grad_p, double* grad_W, double* grad_bias,
    const int* ranges, const int* labels, const int* label_lengths,
    const int* input_lengths, int hidden_size, int alphabet_size,
    int minibatch, int maxT, int s_range, int maxU, double* costs,
    void* workspace, wttOptions options);

/* Factorised ("simple") RNN-T loss for the additive joiner
 *   logit[b,t,u,v] = am[b,t,v] + lm[b,u,v]
 * — the (B, T, U, V) joint tensor is NEVER materialised; scratch is
 * O((maxT+maxU)·V + maxT·maxU) per utterance. Exactly equals
 * wtt_rnnt_loss on the expanded sum (same lattice, same math); gradients
 * are the u-/t-marginals of the dense gradient, returned w.r.t. am / lm.
 *
 * am:      (B, maxT, V) row-major raw logits
 * lm:      (B, maxU, V) row-major raw logits (maxU = max label len + 1)
 * grad_am: (B, maxT, V) output, or NULL    (both NULL = score-only,
 * grad_lm: (B, maxU, V) output, or NULL     one NULL alone is an error)
 * options.from_log_probs must be 0: the additive joiner is defined on raw
 * logits (log-softmax is fused); there is no pre-normalised convention.  */
wttStatus_t wtt_rnnt_loss_simple(const float* am, const float* lm,
                                 float* grad_am, float* grad_lm,
                                 const int* labels, const int* label_lengths,
                                 const int* input_lengths,
                                 int alphabet_size, int minibatch,
                                 int maxT, int maxU,
                                 float* costs, wttOptions options);

wttStatus_t wtt_rnnt_loss_simple_fp64(const double* am, const double* lm,
                                      double* grad_am, double* grad_lm,
                                      const int* labels,
                                      const int* label_lengths,
                                      const int* input_lengths,
                                      int alphabet_size, int minibatch,
                                      int maxT, int maxU,
                                      double* costs, wttOptions options);

/* Joint-fused RNN-T loss (the JAX twin is rnnt_loss_fused_joint; see
 * warp_transducer_tpu/ops/fused_joint.py): given the projected trunk
 * activations e (B, maxT, H) and p (B, maxU, H) plus the output projection
 * W (H, V), bias (V), computes the dense loss of
 *   logits[b,t,u] = tanh(e[b,t] + p[b,u]) @ W + bias
 * WITHOUT ever materialising the (B, maxT, maxU, V) tensor: each cell's
 * logits row is produced on the fly (O(H·V) scratch), reduced to the
 * lattice caches, and in the gradient pass recomputed and contracted
 * directly into grad_e / grad_p / grad_W / grad_bias.
 *
 * grads: pass all four output pointers, or all NULL (score-only); a mixed
 * set is an error. grad_W/grad_bias are summed over the whole minibatch.
 * options.from_log_probs must be 0 (the joint produces raw logits).
 * workspace: >= wtt_get_workspace_size(maxT, maxU, minibatch) bytes or
 * NULL (the fused engine needs the same 5 lattice arrays plus O(H+V)
 * per-thread scratch it allocates itself). */
wttStatus_t wtt_rnnt_loss_fused_joint(
    const float* e, const float* p, const float* W, const float* bias,
    float* grad_e, float* grad_p, float* grad_W, float* grad_bias,
    const int* labels, const int* label_lengths, const int* input_lengths,
    int hidden_size, int alphabet_size, int minibatch, int maxT, int maxU,
    float* costs, void* workspace, wttOptions options);

wttStatus_t wtt_rnnt_loss_fused_joint_fp64(
    const double* e, const double* p, const double* W, const double* bias,
    double* grad_e, double* grad_p, double* grad_W, double* grad_bias,
    const int* labels, const int* label_lengths, const int* input_lengths,
    int hidden_size, int alphabet_size, int minibatch, int maxT, int maxU,
    double* costs, void* workspace, wttOptions options);

#ifdef __cplusplus
}
#endif

#endif /* WTT_RNNT_TPU_H */
