"""ctypes binding to the native CPU backend (``native/``).

The TPU-era replacement for the reference's pybind11 glue
(/root/reference/pytorch_binding/src/binding.cpp): no compiled Python
extension, just the stable C ABI of ``libwarp_rnnt_tpu.so`` loaded with
ctypes.  Used as a fast CPU fallback and as an independent oracle in tests.

Build the library first:  ``make -C native``  (or cmake; see native/).
"""
from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB_ENV = "WARP_RNNT_TPU_LIB"
_SEARCH_PATHS = (
    os.path.join(os.path.dirname(__file__), "..", "..", "native", "build"),
    os.path.join(os.path.dirname(__file__), "..", "..", "native", "build", "lib"),
)

_STATUS_STRINGS = {
    0: "no error",
    1: "bad argument",
    2: "allocation failed",
    3: "execution failed",
}


class _Options(ctypes.Structure):
    _fields_ = [
        ("blank_label", ctypes.c_int),
        ("num_threads", ctypes.c_int),
        ("from_log_probs", ctypes.c_int),
        ("fastemit_lambda", ctypes.c_float),
        ("delay_penalty", ctypes.c_float),
    ]


_lib = None


def _find_library() -> Optional[str]:
    cand = os.environ.get(_LIB_ENV)
    if cand and os.path.exists(cand):
        return cand
    for d in _SEARCH_PATHS:
        p = os.path.abspath(os.path.join(d, "libwarp_rnnt_tpu.so"))
        if os.path.exists(p):
            return p
    return None


def available() -> bool:
    return _find_library() is not None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    path = _find_library()
    if path is None:
        raise RuntimeError(
            "native backend not built; run `make -C native` or set "
            f"${_LIB_ENV} to the libwarp_rnnt_tpu.so path"
        )
    lib = ctypes.CDLL(path)
    lib.wtt_get_version.restype = ctypes.c_int
    F, D, I = ctypes.c_float, ctypes.c_double, ctypes.c_int
    fp = np.ctypeslib.ndpointer
    lib.wtt_rnnt_loss.restype = ctypes.c_int
    lib.wtt_rnnt_loss.argtypes = [
        fp(np.float32, flags="C_CONTIGUOUS"), ctypes.c_void_p,
        fp(np.int32, flags="C_CONTIGUOUS"), fp(np.int32, flags="C_CONTIGUOUS"),
        fp(np.int32, flags="C_CONTIGUOUS"), I, I, I, I,
        fp(np.float32, flags="C_CONTIGUOUS"), ctypes.c_void_p, _Options,
    ]
    lib.wtt_rnnt_loss_fp64.restype = ctypes.c_int
    lib.wtt_rnnt_loss_fp64.argtypes = [
        fp(np.float64, flags="C_CONTIGUOUS"), ctypes.c_void_p,
        fp(np.int32, flags="C_CONTIGUOUS"), fp(np.int32, flags="C_CONTIGUOUS"),
        fp(np.int32, flags="C_CONTIGUOUS"), I, I, I, I,
        fp(np.float64, flags="C_CONTIGUOUS"), ctypes.c_void_p, _Options,
    ]
    lib.wtt_get_workspace_size.restype = ctypes.c_int
    lib.wtt_get_workspace_size.argtypes = [
        I, I, I, I, ctypes.POINTER(ctypes.c_size_t)
    ]
    for name, ft in (("wtt_rnnt_loss_pruned", np.float32),
                     ("wtt_rnnt_loss_pruned_fp64", np.float64)):
        f = getattr(lib, name)
        f.restype = ctypes.c_int
        f.argtypes = [
            fp(ft, flags="C_CONTIGUOUS"), ctypes.c_void_p,
            fp(np.int32, flags="C_CONTIGUOUS"),
            fp(np.int32, flags="C_CONTIGUOUS"),
            fp(np.int32, flags="C_CONTIGUOUS"),
            fp(np.int32, flags="C_CONTIGUOUS"), I, I, I, I, I,
            fp(ft, flags="C_CONTIGUOUS"), ctypes.c_void_p, _Options,
        ]
    for name, ft in (("wtt_rnnt_loss_simple", np.float32),
                     ("wtt_rnnt_loss_simple_fp64", np.float64)):
        f = getattr(lib, name)
        f.restype = ctypes.c_int
        f.argtypes = [
            fp(ft, flags="C_CONTIGUOUS"), fp(ft, flags="C_CONTIGUOUS"),
            ctypes.c_void_p, ctypes.c_void_p,
            fp(np.int32, flags="C_CONTIGUOUS"),
            fp(np.int32, flags="C_CONTIGUOUS"),
            fp(np.int32, flags="C_CONTIGUOUS"), I, I, I, I,
            fp(ft, flags="C_CONTIGUOUS"), _Options,
        ]
    for name, ft in (("wtt_rnnt_loss_fused_joint", np.float32),
                     ("wtt_rnnt_loss_fused_joint_fp64", np.float64)):
        f = getattr(lib, name)
        f.restype = ctypes.c_int
        f.argtypes = [
            fp(ft, flags="C_CONTIGUOUS"), fp(ft, flags="C_CONTIGUOUS"),
            fp(ft, flags="C_CONTIGUOUS"), fp(ft, flags="C_CONTIGUOUS"),
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p,
            fp(np.int32, flags="C_CONTIGUOUS"),
            fp(np.int32, flags="C_CONTIGUOUS"),
            fp(np.int32, flags="C_CONTIGUOUS"), I, I, I, I, I,
            fp(ft, flags="C_CONTIGUOUS"), ctypes.c_void_p, _Options,
        ]
    for name, ft in (("wtt_rnnt_loss_pruned_fused", np.float32),
                     ("wtt_rnnt_loss_pruned_fused_fp64", np.float64)):
        f = getattr(lib, name)
        f.restype = ctypes.c_int
        f.argtypes = [
            fp(ft, flags="C_CONTIGUOUS"), fp(ft, flags="C_CONTIGUOUS"),
            fp(ft, flags="C_CONTIGUOUS"), fp(ft, flags="C_CONTIGUOUS"),
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p,
            fp(np.int32, flags="C_CONTIGUOUS"),
            fp(np.int32, flags="C_CONTIGUOUS"),
            fp(np.int32, flags="C_CONTIGUOUS"),
            fp(np.int32, flags="C_CONTIGUOUS"), I, I, I, I, I, I,
            fp(ft, flags="C_CONTIGUOUS"), ctypes.c_void_p, _Options,
        ]
    for name, ft, st in (
            ("wtt_rnnt_loss_multiblank", np.float32, ctypes.c_float),
            ("wtt_rnnt_loss_multiblank_fp64", np.float64, ctypes.c_double)):
        f = getattr(lib, name)
        f.restype = ctypes.c_int
        f.argtypes = [
            fp(ft, flags="C_CONTIGUOUS"), ctypes.c_void_p,
            fp(np.int32, flags="C_CONTIGUOUS"),
            fp(np.int32, flags="C_CONTIGUOUS"),
            fp(np.int32, flags="C_CONTIGUOUS"), I, I, I, I,
            ctypes.c_void_p, ctypes.c_void_p, I, st,
            fp(ft, flags="C_CONTIGUOUS"), _Options,
        ]
    for name, ft, st in (
            ("wtt_rnnt_loss_tdt", np.float32, ctypes.c_float),
            ("wtt_rnnt_loss_tdt_fp64", np.float64, ctypes.c_double)):
        f = getattr(lib, name)
        f.restype = ctypes.c_int
        f.argtypes = [
            fp(ft, flags="C_CONTIGUOUS"), fp(ft, flags="C_CONTIGUOUS"),
            ctypes.c_void_p, ctypes.c_void_p,
            fp(np.int32, flags="C_CONTIGUOUS"),
            fp(np.int32, flags="C_CONTIGUOUS"),
            fp(np.int32, flags="C_CONTIGUOUS"), I, I, I, I,
            fp(np.int32, flags="C_CONTIGUOUS"), I, st,
            fp(ft, flags="C_CONTIGUOUS"), _Options,
        ]
    for name, ft, st in (
            ("wtt_rnnt_loss_multiblank_fused", np.float32, ctypes.c_float),
            ("wtt_rnnt_loss_multiblank_fused_fp64", np.float64,
             ctypes.c_double)):
        f = getattr(lib, name)
        f.restype = ctypes.c_int
        f.argtypes = [
            fp(ft, flags="C_CONTIGUOUS"), fp(ft, flags="C_CONTIGUOUS"),
            fp(ft, flags="C_CONTIGUOUS"), fp(ft, flags="C_CONTIGUOUS"),
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p,
            fp(np.int32, flags="C_CONTIGUOUS"),
            fp(np.int32, flags="C_CONTIGUOUS"),
            fp(np.int32, flags="C_CONTIGUOUS"), I, I, I, I, I,
            ctypes.c_void_p, ctypes.c_void_p, I, st,
            fp(ft, flags="C_CONTIGUOUS"), _Options,
        ]
    for name, ft, st in (
            ("wtt_rnnt_loss_tdt_fused", np.float32, ctypes.c_float),
            ("wtt_rnnt_loss_tdt_fused_fp64", np.float64, ctypes.c_double)):
        f = getattr(lib, name)
        f.restype = ctypes.c_int
        f.argtypes = [
            fp(ft, flags="C_CONTIGUOUS"), fp(ft, flags="C_CONTIGUOUS"),
            fp(ft, flags="C_CONTIGUOUS"), fp(ft, flags="C_CONTIGUOUS"),
            fp(ft, flags="C_CONTIGUOUS"), fp(ft, flags="C_CONTIGUOUS"),
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            fp(np.int32, flags="C_CONTIGUOUS"),
            fp(np.int32, flags="C_CONTIGUOUS"),
            fp(np.int32, flags="C_CONTIGUOUS"), I, I, I, I, I, I,
            fp(np.int32, flags="C_CONTIGUOUS"), st,
            fp(ft, flags="C_CONTIGUOUS"), _Options,
        ]
    _lib = lib
    return lib


def rnnt_loss_native(
    acts: np.ndarray,
    labels: np.ndarray,
    input_lengths: np.ndarray,
    label_lengths: np.ndarray,
    blank: int = 0,
    from_log_probs: bool = False,
    num_threads: int = 0,
    compute_grads: bool = True,
    workspace: Optional[np.ndarray] = None,
    fastemit_lambda: float = 0.0,
    delay_penalty: float = 0.0,
) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Compute (costs, grads) with the native CPU engine.

    ``acts`` must be float32 or float64, shape (B, T, U, V); ``labels``
    (B, U-1) int32.  Returns grads=None when ``compute_grads`` is False.
    ``workspace``: optional caller buffer of >= ``workspace_size(...)``
    bytes for zero-allocation calls (the reference's workspace contract,
    rnnt.h:139-143); None lets the engine allocate internally.
    """
    lib = _load()
    acts = np.ascontiguousarray(acts)
    if acts.dtype not in (np.float32, np.float64):
        raise TypeError(f"acts must be float32/float64, got {acts.dtype}")
    if acts.ndim != 4:
        raise ValueError(f"acts must be (B, T, U, V), got {acts.shape}")
    B, T, U, V = acts.shape
    labels = np.ascontiguousarray(labels, dtype=np.int32)
    if labels.shape != (B, U - 1):
        # pad/truncate to the (B, U-1) the C ABI expects
        fixed = np.zeros((B, U - 1), np.int32)
        L = min(labels.shape[1], U - 1)
        fixed[:, :L] = labels[:, :L]
        labels = fixed
    il = np.ascontiguousarray(input_lengths, dtype=np.int32)
    ll = np.ascontiguousarray(label_lengths, dtype=np.int32)

    costs = np.zeros((B,), acts.dtype)
    grads = np.zeros_like(acts) if compute_grads else None
    gptr = grads.ctypes.data_as(ctypes.c_void_p) if compute_grads else None
    opts = _Options(blank, num_threads, int(from_log_probs),
                    float(fastemit_lambda), float(delay_penalty))
    if workspace is not None:
        workspace = np.ascontiguousarray(workspace)
        wptr = workspace.ctypes.data_as(ctypes.c_void_p)
    else:
        wptr = None

    fn = lib.wtt_rnnt_loss if acts.dtype == np.float32 else lib.wtt_rnnt_loss_fp64
    status = fn(acts, gptr, labels, ll, il, V, B, T, U, costs, wptr, opts)
    if status != 0:
        raise RuntimeError(
            f"native rnnt loss failed: {_STATUS_STRINGS.get(status, status)}"
        )
    return costs, grads


def workspace_size(maxT: int, maxU: int, minibatch: int,
                   fp64: bool = False) -> int:
    """Bytes of scratch ``rnnt_loss_native`` needs for these dims — pass a
    buffer this big as ``workspace`` for zero-allocation calls. For the
    pruned loss use ``maxU = s_range``."""
    lib = _load()
    out = ctypes.c_size_t(0)
    status = lib.wtt_get_workspace_size(maxT, maxU, minibatch, int(fp64),
                                        ctypes.byref(out))
    if status != 0:
        raise RuntimeError(
            f"workspace sizing failed: {_STATUS_STRINGS.get(status, status)}"
        )
    return out.value


def rnnt_loss_multiblank_native(
    acts: np.ndarray,
    labels: np.ndarray,
    input_lengths: np.ndarray,
    label_lengths: np.ndarray,
    big_blank_durations,
    blank: int = 0,
    big_blank_indices=None,
    sigma: float = 0.0,
    from_log_probs: bool = False,
    num_threads: int = 0,
    compute_grads: bool = True,
    fastemit_lambda: float = 0.0,
    delay_penalty: float = 0.0,
) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Multi-blank transducer loss (arXiv 2211.03541) on the native CPU
    engine; semantics match ``rnnt_loss_multiblank`` (and the oracle,
    ``utils/numpy_oracle_multiblank.py``). ``big_blank_indices`` default:
    the last K vocab columns."""
    lib = _load()
    acts = np.ascontiguousarray(acts)
    if acts.dtype not in (np.float32, np.float64):
        raise TypeError(f"acts must be float32/float64, got {acts.dtype}")
    if acts.ndim != 4:
        raise ValueError(f"acts must be (B, T, U, V), got {acts.shape}")
    B, T, U, V = acts.shape
    durs = np.ascontiguousarray(list(big_blank_durations), dtype=np.int32)
    K = len(durs)
    if big_blank_indices is None:
        big_blank_indices = range(V - K, V)
    idx = np.ascontiguousarray(list(big_blank_indices), dtype=np.int32)
    if len(idx) != K:
        raise ValueError(f"{len(idx)} indices for {K} durations")
    labels = np.ascontiguousarray(labels, dtype=np.int32)
    if labels.shape != (B, U - 1):
        fixed = np.zeros((B, U - 1), np.int32)
        L = min(labels.shape[1], U - 1)
        fixed[:, :L] = labels[:, :L]
        labels = fixed
    il = np.ascontiguousarray(input_lengths, dtype=np.int32)
    ll = np.ascontiguousarray(label_lengths, dtype=np.int32)
    if K:
        # labels may not use the big-blank columns — the emit and big-blank
        # posteriors would silently collide (only the valid label positions
        # count; padding is ignored)
        pos = np.arange(U - 1)[None, :] < np.asarray(ll)[:, None]
        if np.isin(labels[pos], idx).any():
            raise ValueError(
                f"labels use big-blank vocab entries {sorted(idx.tolist())}")
    costs = np.zeros((B,), acts.dtype)
    grads = np.zeros_like(acts) if compute_grads else None
    gptr = grads.ctypes.data_as(ctypes.c_void_p) if compute_grads else None
    opts = _Options(blank, num_threads, int(from_log_probs),
                    float(fastemit_lambda), float(delay_penalty))
    fn = (lib.wtt_rnnt_loss_multiblank if acts.dtype == np.float32
          else lib.wtt_rnnt_loss_multiblank_fp64)
    status = fn(acts, gptr, labels, ll, il, V, B, T, U,
                durs.ctypes.data_as(ctypes.c_void_p) if K else None,
                idx.ctypes.data_as(ctypes.c_void_p) if K else None,
                K, sigma, costs, opts)
    if status != 0:
        raise RuntimeError(
            f"native multiblank loss failed: "
            f"{_STATUS_STRINGS.get(status, status)}"
        )
    return costs, grads


def rnnt_loss_tdt_native(
    token_logits: np.ndarray,
    duration_logits: np.ndarray,
    labels: np.ndarray,
    input_lengths: np.ndarray,
    label_lengths: np.ndarray,
    durations,
    blank: int = 0,
    sigma: float = 0.0,
    num_threads: int = 0,
    compute_grads: bool = True,
    fastemit_lambda: float = 0.0,
    delay_penalty: float = 0.0,
):
    """Token-and-Duration Transducer loss (arXiv 2304.06795) on the native
    CPU engine; semantics match ``rnnt_loss_tdt`` (and the oracle,
    ``utils/numpy_oracle_tdt.py``). Returns (costs, grads_tok, grads_dur);
    the gradients are None when ``compute_grads`` is False."""
    lib = _load()
    tok = np.ascontiguousarray(token_logits)
    dur = np.ascontiguousarray(duration_logits)
    if tok.dtype not in (np.float32, np.float64):
        raise TypeError(f"logits must be float32/float64, got {tok.dtype}")
    if dur.dtype != tok.dtype:
        dur = dur.astype(tok.dtype)
    if tok.ndim != 4 or dur.ndim != 4 or tok.shape[:3] != dur.shape[:3]:
        raise ValueError(
            f"token/duration logits must be 4-D with equal (B, T, U); got "
            f"{tok.shape}, {dur.shape}")
    B, T, U, V = tok.shape
    durs = np.ascontiguousarray(list(durations), dtype=np.int32)
    D = len(durs)
    if dur.shape[-1] != D:
        raise ValueError(
            f"duration_logits last dim {dur.shape[-1]} != len(durations)={D}")
    labels = np.ascontiguousarray(labels, dtype=np.int32)
    if labels.shape != (B, U - 1):
        fixed = np.zeros((B, U - 1), np.int32)
        L = min(labels.shape[1], U - 1)
        fixed[:, :L] = labels[:, :L]
        labels = fixed
    il = np.ascontiguousarray(input_lengths, dtype=np.int32)
    ll = np.ascontiguousarray(label_lengths, dtype=np.int32)
    costs = np.zeros((B,), tok.dtype)
    g_tok = np.zeros_like(tok) if compute_grads else None
    g_dur = np.zeros_like(dur) if compute_grads else None
    gt = g_tok.ctypes.data_as(ctypes.c_void_p) if compute_grads else None
    gd = g_dur.ctypes.data_as(ctypes.c_void_p) if compute_grads else None
    opts = _Options(blank, num_threads, 0, float(fastemit_lambda),
                    float(delay_penalty))
    fn = (lib.wtt_rnnt_loss_tdt if tok.dtype == np.float32
          else lib.wtt_rnnt_loss_tdt_fp64)
    status = fn(tok, dur, gt, gd, labels, ll, il, V, B, T, U, durs, D,
                sigma, costs, opts)
    if status != 0:
        raise RuntimeError(
            f"native tdt loss failed: {_STATUS_STRINGS.get(status, status)}"
        )
    return costs, g_tok, g_dur


def rnnt_loss_pruned_native(
    acts: np.ndarray,
    ranges: np.ndarray,
    labels: np.ndarray,
    input_lengths: np.ndarray,
    label_lengths: np.ndarray,
    blank: int = 0,
    num_threads: int = 0,
    compute_grads: bool = True,
    workspace: Optional[np.ndarray] = None,
    fastemit_lambda: float = 0.0,
    delay_penalty: float = 0.0,
) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Banded (pruned) RNN-T loss with the native CPU engine.

    ``acts``: (B, T, S, V) float32/float64 joint logits on the band
    (``acts[b,t,s]`` is lattice cell (t, ranges[b,t]+s)); ``ranges``:
    (B, T) int32 band starts obeying the band contract (see
    ``rnnt_prune_ranges``). Matches ``warp_transducer_tpu.rnnt_loss_pruned``.
    """
    lib = _load()
    acts = np.ascontiguousarray(acts)
    if acts.dtype not in (np.float32, np.float64):
        raise TypeError(f"acts must be float32/float64, got {acts.dtype}")
    if acts.ndim != 4:
        raise ValueError(f"acts must be (B, T, S, V), got {acts.shape}")
    B, T, S, V = acts.shape
    ranges = np.ascontiguousarray(ranges, dtype=np.int32)
    if ranges.shape != (B, T):
        raise ValueError(f"ranges must be (B, T) = {(B, T)}, got {ranges.shape}")
    labels = np.ascontiguousarray(labels, dtype=np.int32)
    if labels.ndim != 2 or labels.shape[0] != B:
        raise ValueError(f"labels must be (B, L), got {labels.shape}")
    L = labels.shape[1]
    il = np.ascontiguousarray(input_lengths, dtype=np.int32)
    ll = np.ascontiguousarray(label_lengths, dtype=np.int32)

    costs = np.zeros((B,), acts.dtype)
    grads = np.zeros_like(acts) if compute_grads else None
    gptr = grads.ctypes.data_as(ctypes.c_void_p) if compute_grads else None
    opts = _Options(blank, num_threads, 0, float(fastemit_lambda),
                    float(delay_penalty))
    if workspace is not None:
        workspace = np.ascontiguousarray(workspace)
        wptr = workspace.ctypes.data_as(ctypes.c_void_p)
    else:
        wptr = None

    fn = (lib.wtt_rnnt_loss_pruned if acts.dtype == np.float32
          else lib.wtt_rnnt_loss_pruned_fp64)
    status = fn(acts, gptr, ranges, labels, ll, il, V, B, T, S, L, costs,
                wptr, opts)
    if status != 0:
        raise RuntimeError(
            f"native pruned rnnt loss failed: {_STATUS_STRINGS.get(status, status)}"
        )
    return costs, grads


def rnnt_loss_fused_joint_native(
    e: np.ndarray,
    p: np.ndarray,
    W: np.ndarray,
    bias: np.ndarray,
    labels: np.ndarray,
    input_lengths: np.ndarray,
    label_lengths: np.ndarray,
    blank: int = 0,
    num_threads: int = 0,
    compute_grads: bool = True,
    workspace: Optional[np.ndarray] = None,
    fastemit_lambda: float = 0.0,
    delay_penalty: float = 0.0,
):
    """Joint-fused loss with the native CPU engine: the (B, T, U, V) joint
    of ``tanh(e ⊕ p) @ W + bias`` is never materialised (O(H·V) scratch per
    cell row). ``e``: (B, T, H), ``p``: (B, U, H), ``W``: (H, V), ``bias``:
    (V,), all float32 or all float64. Returns
    ``(costs, (grad_e, grad_p, grad_W, grad_bias))`` — the tuple is None
    when ``compute_grads`` is False. Matches
    ``warp_transducer_tpu.rnnt_loss_fused_joint``.
    """
    lib = _load()
    e = np.ascontiguousarray(e)
    p = np.ascontiguousarray(p)
    W = np.ascontiguousarray(W, dtype=e.dtype)
    bias = np.ascontiguousarray(bias, dtype=e.dtype)
    if e.dtype not in (np.float32, np.float64):
        raise TypeError(f"e must be float32/float64, got {e.dtype}")
    if e.ndim != 3 or p.ndim != 3 or W.ndim != 2 or bias.ndim != 1:
        raise ValueError(
            f"expected e (B,T,H), p (B,U,H), W (H,V), bias (V,); got "
            f"{e.shape}, {p.shape}, {W.shape}, {bias.shape}"
        )
    if p.dtype != e.dtype or p.shape[0] != e.shape[0] \
            or p.shape[2] != e.shape[2] or W.shape[0] != e.shape[2] \
            or bias.shape[0] != W.shape[1]:
        raise ValueError(
            f"e/p/W/bias mismatch: {e.shape}, {p.shape}, {W.shape}, "
            f"{bias.shape}"
        )
    B, T, H = e.shape
    U = p.shape[1]
    V = W.shape[1]
    labels = np.ascontiguousarray(labels, dtype=np.int32)
    if labels.shape != (B, U - 1):
        fixed = np.zeros((B, U - 1), np.int32)
        L = min(labels.shape[1], U - 1)
        fixed[:, :L] = labels[:, :L]
        labels = fixed
    il = np.ascontiguousarray(input_lengths, dtype=np.int32)
    ll = np.ascontiguousarray(label_lengths, dtype=np.int32)

    costs = np.zeros((B,), e.dtype)
    if compute_grads:
        gs = (np.zeros_like(e), np.zeros_like(p), np.zeros_like(W),
              np.zeros_like(bias))
        gps = tuple(g.ctypes.data_as(ctypes.c_void_p) for g in gs)
    else:
        gs = None
        gps = (None,) * 4
    opts = _Options(blank, num_threads, 0, float(fastemit_lambda),
                    float(delay_penalty))
    if workspace is not None:
        workspace = np.ascontiguousarray(workspace)
        wptr = workspace.ctypes.data_as(ctypes.c_void_p)
    else:
        wptr = None

    fn = (lib.wtt_rnnt_loss_fused_joint if e.dtype == np.float32
          else lib.wtt_rnnt_loss_fused_joint_fp64)
    status = fn(e, p, W, bias, *gps, labels, ll, il, H, V, B, T, U, costs,
                wptr, opts)
    if status != 0:
        raise RuntimeError(
            f"native fused joint loss failed: "
            f"{_STATUS_STRINGS.get(status, status)}"
        )
    return costs, gs


def rnnt_loss_simple_native(
    am: np.ndarray,
    lm: np.ndarray,
    labels: np.ndarray,
    input_lengths: np.ndarray,
    label_lengths: np.ndarray,
    blank: int = 0,
    num_threads: int = 0,
    compute_grads: bool = True,
    fastemit_lambda: float = 0.0,
    delay_penalty: float = 0.0,
) -> Tuple[np.ndarray, Optional[np.ndarray], Optional[np.ndarray]]:
    """Factorised additive-joiner loss with the native CPU engine.

    ``am``: (B, T, V), ``lm``: (B, U, V) raw logits (float32/float64);
    the (B, T, U, V) joint tensor is never materialised. Returns
    (costs, grad_am, grad_lm); the grads are None when ``compute_grads``
    is False. Matches ``warp_transducer_tpu.rnnt_loss_simple``.
    """
    lib = _load()
    am = np.ascontiguousarray(am)
    lm = np.ascontiguousarray(lm)
    if am.dtype not in (np.float32, np.float64):
        raise TypeError(f"am must be float32/float64, got {am.dtype}")
    if am.ndim != 3 or lm.ndim != 3:
        raise ValueError(f"am must be (B, T, V), lm (B, U, V); got {am.shape}, {lm.shape}")
    if lm.dtype != am.dtype or lm.shape[0] != am.shape[0] or lm.shape[2] != am.shape[2]:
        raise ValueError(f"am/lm mismatch: {am.shape}/{am.dtype} vs {lm.shape}/{lm.dtype}")
    B, T, V = am.shape
    U = lm.shape[1]
    labels = np.ascontiguousarray(labels, dtype=np.int32)
    if labels.shape != (B, U - 1):
        fixed = np.zeros((B, U - 1), np.int32)
        L = min(labels.shape[1], U - 1)
        fixed[:, :L] = labels[:, :L]
        labels = fixed
    il = np.ascontiguousarray(input_lengths, dtype=np.int32)
    ll = np.ascontiguousarray(label_lengths, dtype=np.int32)

    costs = np.zeros((B,), am.dtype)
    gam = np.zeros_like(am) if compute_grads else None
    glm = np.zeros_like(lm) if compute_grads else None
    gam_p = gam.ctypes.data_as(ctypes.c_void_p) if compute_grads else None
    glm_p = glm.ctypes.data_as(ctypes.c_void_p) if compute_grads else None
    opts = _Options(blank, num_threads, 0, float(fastemit_lambda),
                    float(delay_penalty))

    fn = (lib.wtt_rnnt_loss_simple if am.dtype == np.float32
          else lib.wtt_rnnt_loss_simple_fp64)
    status = fn(am, lm, gam_p, glm_p, labels, ll, il, V, B, T, U, costs, opts)
    if status != 0:
        raise RuntimeError(
            f"native simple rnnt loss failed: {_STATUS_STRINGS.get(status, status)}"
        )
    return costs, gam, glm


def rnnt_loss_pruned_fused_native(
    e: np.ndarray,
    p: np.ndarray,
    W: np.ndarray,
    bias: np.ndarray,
    ranges: np.ndarray,
    labels: np.ndarray,
    input_lengths: np.ndarray,
    label_lengths: np.ndarray,
    s_range: int,
    blank: int = 0,
    num_threads: int = 0,
    compute_grads: bool = True,
    workspace: Optional[np.ndarray] = None,
    fastemit_lambda: float = 0.0,
    delay_penalty: float = 0.0,
):
    """Pruned fused joint+loss with the native CPU engine: the banded
    (B, T, S, V) logits are never materialised. ``ranges``: (B, T) band
    starts obeying the band contract; ``s_range`` is the band width S.
    Returns ``(costs, (grad_e, grad_p, grad_W, grad_bias))``; the tuple
    is None when ``compute_grads`` is False. Matches
    ``warp_transducer_tpu.rnnt_loss_pruned_fused``.
    """
    lib = _load()
    e = np.ascontiguousarray(e)
    p = np.ascontiguousarray(p)
    W = np.ascontiguousarray(W, dtype=e.dtype)
    bias = np.ascontiguousarray(bias, dtype=e.dtype)
    if e.dtype not in (np.float32, np.float64):
        raise TypeError(f"e must be float32/float64, got {e.dtype}")
    if e.ndim != 3 or p.ndim != 3 or W.ndim != 2 or bias.ndim != 1:
        raise ValueError(
            f"expected e (B,T,H), p (B,U,H), W (H,V), bias (V,); got "
            f"{e.shape}, {p.shape}, {W.shape}, {bias.shape}"
        )
    B, T, H = e.shape
    U = p.shape[1]
    V = W.shape[1]
    ranges = np.ascontiguousarray(ranges, dtype=np.int32)
    if ranges.shape != (B, T):
        raise ValueError(f"ranges must be (B, T) = {(B, T)}, got {ranges.shape}")
    labels = np.ascontiguousarray(labels, dtype=np.int32)
    if labels.shape != (B, U - 1):
        fixed = np.zeros((B, U - 1), np.int32)
        L = min(labels.shape[1], U - 1)
        fixed[:, :L] = labels[:, :L]
        labels = fixed
    il = np.ascontiguousarray(input_lengths, dtype=np.int32)
    ll = np.ascontiguousarray(label_lengths, dtype=np.int32)

    costs = np.zeros((B,), e.dtype)
    if compute_grads:
        gs = (np.zeros_like(e), np.zeros_like(p), np.zeros_like(W),
              np.zeros_like(bias))
        gps = tuple(g.ctypes.data_as(ctypes.c_void_p) for g in gs)
    else:
        gs = None
        gps = (None,) * 4
    opts = _Options(blank, num_threads, 0, float(fastemit_lambda),
                    float(delay_penalty))
    if workspace is not None:
        workspace = np.ascontiguousarray(workspace)
        wptr = workspace.ctypes.data_as(ctypes.c_void_p)
    else:
        wptr = None

    fn = (lib.wtt_rnnt_loss_pruned_fused if e.dtype == np.float32
          else lib.wtt_rnnt_loss_pruned_fused_fp64)
    status = fn(e, p, W, bias, *gps, ranges, labels, ll, il, H, V, B, T,
                int(s_range), U, costs, wptr, opts)
    if status != 0:
        raise RuntimeError(
            f"native pruned fused loss failed: "
            f"{_STATUS_STRINGS.get(status, status)}"
        )
    return costs, gs


def _fused_common(e, p, W, bias, labels, input_lengths, label_lengths):
    e = np.ascontiguousarray(e)
    if e.dtype not in (np.float32, np.float64):
        raise TypeError(f"e must be float32/float64, got {e.dtype}")
    dt = e.dtype
    p = np.ascontiguousarray(p, dtype=dt)
    W = np.ascontiguousarray(W, dtype=dt)
    bias = np.ascontiguousarray(bias, dtype=dt)
    if e.ndim != 3 or p.ndim != 3 or W.ndim != 2 or bias.ndim != 1:
        raise ValueError(
            f"expected e (B,T,H), p (B,U,H), W (H,V), bias (V,); got "
            f"{e.shape}, {p.shape}, {W.shape}, {bias.shape}")
    B, T, H = e.shape
    U = p.shape[1]
    V = W.shape[1]
    labels = np.ascontiguousarray(labels, dtype=np.int32)
    if labels.shape != (B, U - 1):
        fixed = np.zeros((B, U - 1), np.int32)
        L = min(labels.shape[1], U - 1)
        fixed[:, :L] = labels[:, :L]
        labels = fixed
    il = np.ascontiguousarray(input_lengths, dtype=np.int32)
    ll = np.ascontiguousarray(label_lengths, dtype=np.int32)
    return e, p, W, bias, labels, il, ll, B, T, U, H, V, dt


def rnnt_loss_multiblank_fused_native(
    e, p, W, bias, labels, input_lengths, label_lengths,
    big_blank_durations, blank=0, big_blank_indices=None, sigma=0.0,
    num_threads=0, compute_grads=True, fastemit_lambda=0.0,
    delay_penalty=0.0,
):
    """Fused multi-blank joint+loss on the native CPU engine: returns
    (costs, (de, dp, dW, db)) — gradients None when compute_grads=False.
    Semantics match ``rnnt_loss_multiblank_fused_joint``."""
    lib = _load()
    (e, p, W, bias, labels, il, ll,
     B, T, U, H, V, dt) = _fused_common(e, p, W, bias, labels,
                                        input_lengths, label_lengths)
    durs = np.ascontiguousarray(list(big_blank_durations), dtype=np.int32)
    K = len(durs)
    if big_blank_indices is None:
        big_blank_indices = range(V - K, V)
    idx = np.ascontiguousarray(list(big_blank_indices), dtype=np.int32)
    costs = np.zeros((B,), dt)
    gs = ([np.zeros_like(e), np.zeros_like(p), np.zeros_like(W),
           np.zeros_like(bias)] if compute_grads else None)
    vp = lambda a: a.ctypes.data_as(ctypes.c_void_p)
    gptrs = ([vp(g) for g in gs] if compute_grads else [None] * 4)
    opts = _Options(blank, num_threads, 0, float(fastemit_lambda),
                    float(delay_penalty))
    fn = (lib.wtt_rnnt_loss_multiblank_fused if dt == np.float32
          else lib.wtt_rnnt_loss_multiblank_fused_fp64)
    status = fn(e, p, W, bias, *gptrs, labels, ll, il, H, V, B, T, U,
                durs.ctypes.data_as(ctypes.c_void_p) if K else None,
                idx.ctypes.data_as(ctypes.c_void_p) if K else None,
                K, sigma, costs, opts)
    if status != 0:
        raise RuntimeError(
            f"native fused multiblank loss failed: "
            f"{_STATUS_STRINGS.get(status, status)}")
    return costs, (tuple(gs) if compute_grads else None)


def rnnt_loss_tdt_fused_native(
    e, p, W, bias, Wd, bias_d, labels, input_lengths, label_lengths,
    durations, blank=0, sigma=0.0, num_threads=0, compute_grads=True,
    fastemit_lambda=0.0, delay_penalty=0.0,
):
    """Fused TDT joint+loss on the native CPU engine: returns
    (costs, (de, dp, dW, db, dWd, dbd)) — gradients None when
    compute_grads=False. Semantics match ``rnnt_loss_tdt_fused_joint``."""
    lib = _load()
    (e, p, W, bias, labels, il, ll,
     B, T, U, H, V, dt) = _fused_common(e, p, W, bias, labels,
                                        input_lengths, label_lengths)
    Wd = np.ascontiguousarray(Wd, dtype=dt)
    bias_d = np.ascontiguousarray(bias_d, dtype=dt)
    durs = np.ascontiguousarray(list(durations), dtype=np.int32)
    D = len(durs)
    if Wd.shape != (H, D) or bias_d.shape != (D,):
        raise ValueError(
            f"duration head must be ({H},{D})/({D},); got {Wd.shape}, "
            f"{bias_d.shape}")
    costs = np.zeros((B,), dt)
    gs = ([np.zeros_like(e), np.zeros_like(p), np.zeros_like(W),
           np.zeros_like(bias), np.zeros_like(Wd), np.zeros_like(bias_d)]
          if compute_grads else None)
    vp = lambda a: a.ctypes.data_as(ctypes.c_void_p)
    gptrs = ([vp(g) for g in gs] if compute_grads else [None] * 6)
    opts = _Options(blank, num_threads, 0, float(fastemit_lambda),
                    float(delay_penalty))
    fn = (lib.wtt_rnnt_loss_tdt_fused if dt == np.float32
          else lib.wtt_rnnt_loss_tdt_fused_fp64)
    status = fn(e, p, W, bias, Wd, bias_d, *gptrs, labels, ll, il,
                H, V, D, B, T, U, durs, sigma, costs, opts)
    if status != 0:
        raise RuntimeError(
            f"native fused tdt loss failed: "
            f"{_STATUS_STRINGS.get(status, status)}")
    return costs, (tuple(gs) if compute_grads else None)
