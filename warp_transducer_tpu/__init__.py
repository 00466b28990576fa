"""warp_transducer_tpu — TPU-native RNN-Transducer loss library.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
HawkAaron/warp-transducer: the RNN-T negative log-likelihood and its
analytic gradient over the (B, T, U, V) joint lattice, with fused
log-softmax, per-utterance lengths, configurable blank, none|sum|mean
reductions, a loss-only scoring path, and first-class data-parallel
sharding over TPU meshes.
"""

from .ops.alignment import (MultiblankViterbiAlignment,
                            TDTViterbiAlignment, ViterbiAlignment,
                            multiblank_viterbi_align, rnnt_viterbi_align,
                            tdt_viterbi_align)
from .ops.fused_joint import rnnt_loss_fused_joint
from .ops.multiblank import rnnt_loss_multiblank
from .ops.multiblank_fused import rnnt_loss_multiblank_fused_joint
from .ops.pruned import gather_banded, rnnt_loss_pruned, rnnt_prune_ranges
from .ops.pruned_fused import rnnt_loss_pruned_fused
from .ops.rnnt import RNNTLoss, rnnt_loss, rnnt_loss_and_grad, rnnt_score
from .ops.simple import rnnt_loss_simple
from .ops.tdt import rnnt_loss_tdt
from .ops.tdt_fused import rnnt_loss_tdt_fused_joint
from .utils.options import RNNTOptions

__version__ = "0.2.0"

__all__ = [
    "RNNTLoss",
    "rnnt_loss",
    "rnnt_loss_and_grad",
    "rnnt_loss_simple",
    "rnnt_loss_multiblank",
    "rnnt_loss_multiblank_fused_joint",
    "rnnt_loss_tdt",
    "rnnt_loss_tdt_fused_joint",
    "rnnt_loss_pruned",
    "rnnt_loss_fused_joint",
    "rnnt_loss_pruned_fused",
    "rnnt_prune_ranges",
    "gather_banded",
    "rnnt_score",
    "rnnt_viterbi_align",
    "ViterbiAlignment",
    "multiblank_viterbi_align",
    "MultiblankViterbiAlignment",
    "tdt_viterbi_align",
    "TDTViterbiAlignment",
    "RNNTOptions",
    "__version__",
]
