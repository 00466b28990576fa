/* C ABI for the warp_transducer_tpu native CPU backend.
 *
 * Capability parity with the reference public C API
 * (/root/reference/include/rnnt.h) re-designed without its C-era baggage:
 * no caller-managed workspace (the library allocates internally; a sizing
 * query is still provided for embedders that want to pre-allocate), no
 * batch_first flag (one canonical (B, T, U, V) row-major layout), and both
 * gradient conventions in one entry point (the reference splits them across
 * its CPU/GPU backends).
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
} wttOptions;

int wtt_get_version(void);
const char* wtt_get_status_string(wttStatus_t status);

/* Bytes of scratch the library will allocate internally per call.   */
wttStatus_t wtt_get_workspace_size(int maxT, int maxU, int minibatch,
                                   int fp64, size_t* size_bytes);

/* Loss (+ gradient when grads != NULL; score-only otherwise).
 * acts:   (B, maxT, maxU, V) row-major
 * labels: (B, maxU-1) zero padded
 * costs:  (B,) output
 * grads:  (B, maxT, maxU, V) output or NULL                          */
wttStatus_t wtt_rnnt_loss(const float* acts, float* grads,
                          const int* labels, const int* label_lengths,
                          const int* input_lengths,
                          int alphabet_size, int minibatch,
                          int maxT, int maxU,
                          float* costs, wttOptions options);

wttStatus_t wtt_rnnt_loss_fp64(const double* acts, double* grads,
                               const int* labels, const int* label_lengths,
                               const int* input_lengths,
                               int alphabet_size, int minibatch,
                               int maxT, int maxU,
                               double* costs, wttOptions options);

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

#ifdef __cplusplus
}
#endif

#endif /* WTT_RNNT_TPU_H */
