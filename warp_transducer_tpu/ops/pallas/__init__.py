"""Pallas TPU kernels for the RNN-T lattice recursions.

Two variants with identical semantics:
* ``wavefront`` — batch-tiled panels resident in VMEM (simple; used in
  interpreter mode and for small problems);
* ``wavefront_stream`` — one invocation for the whole batch with
  HBM-streamed panels and double-buffered DMA (the fast path on hardware).
"""
import jax

from . import wavefront, wavefront_stream
from ..lattice import LatticeResult


def forward_backward(lpb, lpe, input_lengths, label_lengths,
                     compute_betas: bool = True) -> LatticeResult:
    if jax.default_backend() == "tpu":
        return wavefront_stream.forward_backward(
            lpb, lpe, input_lengths, label_lengths, compute_betas=compute_betas
        )
    return wavefront.forward_backward(
        lpb, lpe, input_lengths, label_lengths, compute_betas=compute_betas
    )
