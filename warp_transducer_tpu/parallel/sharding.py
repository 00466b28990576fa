"""First-class distributed layer: data-parallel RNN-T loss over TPU meshes.

The reference has no multi-device story at all — its only concurrency is
OpenMP across utterances and a caller-provided CUDA stream
(/root/reference/include/detail/cpu_rnnt.h:290, include/rnnt.h:50-51).
On TPU the utterance batch shards across a ``jax.sharding.Mesh`` axis:
each device runs the wavefront engine on its local shard and scalar
reductions ride ICI via ``psum`` — multi-host (DCN) is handled
transparently by GSPMD once ``jax.distributed`` is initialised.

Two entry points:

* ``data_parallel_rnnt_loss`` — explicit ``shard_map`` wrapper (predictable
  per-device program, collectives only for the final reduction).
* ``auto_sharded_rnnt_loss`` — GSPMD path: annotate inputs with
  ``NamedSharding`` and let ``jit`` partition the op (the batch dimension of
  every internal array is batch-parallel, so XLA shards it cleanly).
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import rnnt as _rnnt

DATA_AXIS = "data"


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    axis_names: Sequence[str] = (DATA_AXIS,),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """Build a device mesh; defaults to a 1-D data-parallel mesh over all
    devices (single-host or multi-host alike)."""
    devices = list(devices) if devices is not None else jax.devices()
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    dev_array = np.array(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def initialize_distributed(**kwargs) -> None:
    """Multi-host bring-up: thin wrapper over ``jax.distributed.initialize``.

    On TPU pods the coordinator/process id/count are discovered from the
    environment, so a bare call is usually enough."""
    jax.distributed.initialize(**kwargs)


def data_parallel_rnnt_loss(
    acts: jax.Array,
    labels: jax.Array,
    input_lengths: jax.Array,
    label_lengths: jax.Array,
    mesh: Mesh,
    axis: str = DATA_AXIS,
    blank: int = 0,
    reduction: str = "mean",
    log_probs_input: bool = False,
    implementation: str = "auto",
) -> jax.Array:
    """RNN-T loss with the utterance batch sharded over ``mesh[axis]``.

    Per-shard costs/grads are computed locally by the wavefront engine;
    'sum'/'mean' reduce across devices with ``psum`` over ICI.  The global
    batch must divide the axis size.  Differentiable w.r.t. ``acts`` (the
    gradient stays sharded like ``acts``).
    """
    if reduction not in ("none", "sum", "mean"):
        raise ValueError(f"reduction must be none|sum|mean, got {reduction!r}")
    n_shards = mesh.shape[axis]
    B = acts.shape[0]
    if B % n_shards:
        raise ValueError(f"batch {B} not divisible by mesh axis {axis!r} size {n_shards}")

    in_specs = (P(axis), P(axis), P(axis), P(axis))
    out_specs = P(axis) if reduction == "none" else P()

    @functools.partial(
        # check_vma=False: the lattice scan builds its initial carry from
        # constants, which trips shard_map's varying-axis inference even
        # though the computation is purely batch-local.
        jax.shard_map, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    )
    def _local(a, l, il, ll):
        costs = _rnnt.rnnt_loss(
            a, l, il, ll, blank=blank, reduction="none",
            log_probs_input=log_probs_input, implementation=implementation,
        )
        if reduction == "none":
            return costs
        total = jax.lax.psum(jnp.sum(costs), axis)
        if reduction == "mean":
            total = total / B
        return total

    return _local(acts, labels, input_lengths, label_lengths)


def data_parallel_fused_joint_loss(
    e: jax.Array,
    p: jax.Array,
    W: jax.Array,
    bias: jax.Array,
    labels: jax.Array,
    input_lengths: jax.Array,
    label_lengths: jax.Array,
    mesh: Mesh,
    axis: str = DATA_AXIS,
    blank: int = 0,
    reduction: str = "mean",
    implementation: str = "auto",
) -> jax.Array:
    """Fused joint+loss with the batch sharded over ``mesh[axis]``.

    e/p/labels/lengths shard on batch; W and bias are replicated (the
    usual data-parallel layout for an output projection). Differentiable:
    de/dp stay batch-sharded, and dW/db are automatically ``psum``-reduced
    across shards by shard_map's transpose of replicated inputs — the
    all-reduce rides ICI exactly like any data-parallel weight gradient.
    """
    from ..ops.fused_joint import rnnt_loss_fused_joint

    if reduction not in ("none", "sum", "mean"):
        raise ValueError(f"reduction must be none|sum|mean, got {reduction!r}")
    n_shards = mesh.shape[axis]
    B = e.shape[0]
    if B % n_shards:
        raise ValueError(f"batch {B} not divisible by mesh axis {axis!r} size {n_shards}")

    in_specs = (P(axis), P(axis), P(), P(), P(axis), P(axis), P(axis))
    out_specs = P(axis) if reduction == "none" else P()

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    )
    def _local(e, p, W, bias, l, il, ll):
        costs = rnnt_loss_fused_joint(
            e, p, W, bias, l, il, ll, blank=blank, reduction="none",
            implementation=implementation,
        )
        if reduction == "none":
            return costs
        total = jax.lax.psum(jnp.sum(costs), axis)
        if reduction == "mean":
            total = total / B
        return total

    return _local(e, p, W, bias, labels, input_lengths, label_lengths)


def auto_sharded_rnnt_loss(
    acts, labels, input_lengths, label_lengths, mesh: Mesh,
    axis: str = DATA_AXIS, **kwargs
):
    """GSPMD path: place inputs batch-sharded and call the op under jit.

    The output sharding is pinned explicitly (batch-sharded costs for
    ``reduction='none'``, replicated scalar otherwise) rather than left to
    placement inference, so the contract holds even when a caller passes
    differently-placed inputs.
    """
    shard = lambda x, spec: jax.device_put(x, NamedSharding(mesh, spec))
    acts = shard(acts, P(axis, None, None, None))
    labels = shard(labels, P(axis, None))
    input_lengths = shard(input_lengths, P(axis))
    label_lengths = shard(label_lengths, P(axis))
    # options.reduction overrides the kwarg inside rnnt_loss — resolve the
    # same way here or a 'none' via options would get a replicated out-spec
    reduction = kwargs.get("reduction", "mean")
    if kwargs.get("options") is not None:
        reduction = kwargs["options"].reduction
    out_spec = P(axis) if reduction == "none" else P()
    f = jax.jit(
        functools.partial(_rnnt.rnnt_loss, **kwargs),
        out_shardings=NamedSharding(mesh, out_spec),
    )
    return f(acts, labels, input_lengths, label_lengths)


def data_parallel_pruned_fused_loss(
    e: jax.Array,
    p: jax.Array,
    W: jax.Array,
    bias: jax.Array,
    ranges: jax.Array,
    labels: jax.Array,
    input_lengths: jax.Array,
    label_lengths: jax.Array,
    s_range: int,
    mesh: Mesh,
    axis: str = DATA_AXIS,
    blank: int = 0,
    reduction: str = "mean",
    implementation: str = "auto",
    fastemit_lambda: float = 0.0,
) -> jax.Array:
    """Pruned fused joint+loss with the batch sharded over ``mesh[axis]``.

    Same layout contract as ``data_parallel_fused_joint_loss``: e/p/ranges/
    labels/lengths shard on batch, W/bias replicate, dW/db all-reduce via
    shard_map's transpose. The production-scale configuration: banded
    logits never materialise anywhere, on any shard.
    """
    from ..ops.pruned_fused import rnnt_loss_pruned_fused

    if reduction not in ("none", "sum", "mean"):
        raise ValueError(f"reduction must be none|sum|mean, got {reduction!r}")
    n_shards = mesh.shape[axis]
    B = e.shape[0]
    if B % n_shards:
        raise ValueError(f"batch {B} not divisible by mesh axis {axis!r} size {n_shards}")

    in_specs = (P(axis), P(axis), P(), P(), P(axis), P(axis), P(axis), P(axis))
    out_specs = P(axis) if reduction == "none" else P()

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    )
    def _local(e, p, W, bias, r, l, il, ll):
        costs = rnnt_loss_pruned_fused(
            e, p, W, bias, r, l, il, ll, s_range=s_range, blank=blank,
            reduction="none", implementation=implementation,
            fastemit_lambda=fastemit_lambda,
        )
        if reduction == "none":
            return costs
        total = jax.lax.psum(jnp.sum(costs), axis)
        if reduction == "mean":
            total = total / B
        return total

    return _local(e, p, W, bias, ranges, labels, input_lengths, label_lengths)


def data_parallel_multiblank_loss(
    acts: jax.Array,
    labels: jax.Array,
    input_lengths: jax.Array,
    label_lengths: jax.Array,
    big_blank_durations,
    mesh: Mesh,
    axis: str = DATA_AXIS,
    blank: int = 0,
    big_blank_indices=None,
    sigma: float = 0.0,
    reduction: str = "mean",
    fastemit_lambda: float = 0.0,
    delay_penalty: float = 0.0,
    implementation: str = "auto",
) -> jax.Array:
    """Multi-blank transducer loss (arXiv 2211.03541) with the utterance
    batch sharded over ``mesh[axis]``; same contract as
    ``data_parallel_rnnt_loss``."""
    from ..ops.multiblank import rnnt_loss_multiblank

    if reduction not in ("none", "sum", "mean"):
        raise ValueError(f"reduction must be none|sum|mean, got {reduction!r}")
    n_shards = mesh.shape[axis]
    B = acts.shape[0]
    if B % n_shards:
        raise ValueError(
            f"batch {B} not divisible by mesh axis {axis!r} size {n_shards}")

    in_specs = (P(axis), P(axis), P(axis), P(axis))
    out_specs = P(axis) if reduction == "none" else P()
    durs = tuple(int(m) for m in big_blank_durations)
    idx = (None if big_blank_indices is None
           else tuple(int(i) for i in big_blank_indices))

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    )
    def _local(a, l, il, ll):
        costs = rnnt_loss_multiblank(
            a, l, il, ll, durs, blank=blank, big_blank_indices=idx,
            sigma=sigma, reduction="none", fastemit_lambda=fastemit_lambda,
            delay_penalty=delay_penalty, implementation=implementation,
        )
        if reduction == "none":
            return costs
        total = jax.lax.psum(jnp.sum(costs), axis)
        if reduction == "mean":
            total = total / B
        return total

    return _local(acts, labels, input_lengths, label_lengths)


def data_parallel_tdt_loss(
    token_logits: jax.Array,
    duration_logits: jax.Array,
    labels: jax.Array,
    input_lengths: jax.Array,
    label_lengths: jax.Array,
    durations,
    mesh: Mesh,
    axis: str = DATA_AXIS,
    blank: int = 0,
    sigma: float = 0.0,
    reduction: str = "mean",
    fastemit_lambda: float = 0.0,
    delay_penalty: float = 0.0,
    implementation: str = "auto",
) -> jax.Array:
    """Token-and-Duration Transducer loss (arXiv 2304.06795) with the
    utterance batch sharded over ``mesh[axis]``; differentiable w.r.t.
    both logits tensors (gradients stay sharded like their inputs)."""
    from ..ops.tdt import rnnt_loss_tdt

    if reduction not in ("none", "sum", "mean"):
        raise ValueError(f"reduction must be none|sum|mean, got {reduction!r}")
    n_shards = mesh.shape[axis]
    B = token_logits.shape[0]
    if B % n_shards:
        raise ValueError(
            f"batch {B} not divisible by mesh axis {axis!r} size {n_shards}")

    in_specs = (P(axis),) * 5
    out_specs = P(axis) if reduction == "none" else P()
    durs = tuple(int(d) for d in durations)

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    )
    def _local(t, d, l, il, ll):
        costs = rnnt_loss_tdt(
            t, d, l, il, ll, durs, blank=blank, sigma=sigma,
            reduction="none", fastemit_lambda=fastemit_lambda,
            delay_penalty=delay_penalty, implementation=implementation,
        )
        if reduction == "none":
            return costs
        total = jax.lax.psum(jnp.sum(costs), axis)
        if reduction == "mean":
            total = total / B
        return total

    return _local(token_logits, duration_logits, labels, input_lengths,
                  label_lengths)


def data_parallel_tdt_fused_loss(
    e: jax.Array,
    p: jax.Array,
    W: jax.Array,
    bias: jax.Array,
    Wd: jax.Array,
    bias_d: jax.Array,
    labels: jax.Array,
    input_lengths: jax.Array,
    label_lengths: jax.Array,
    durations,
    mesh: Mesh,
    axis: str = DATA_AXIS,
    blank: int = 0,
    sigma: float = 0.0,
    reduction: str = "mean",
    fastemit_lambda: float = 0.0,
    delay_penalty: float = 0.0,
    implementation: str = "auto",
) -> jax.Array:
    """Fused TDT joint+loss with the batch sharded over ``mesh[axis]``;
    W/bias/Wd/bias_d replicated, their gradients psum-reduced by
    shard_map's transpose (cf. ``data_parallel_fused_joint_loss``)."""
    from ..ops.tdt_fused import rnnt_loss_tdt_fused_joint

    if reduction not in ("none", "sum", "mean"):
        raise ValueError(f"reduction must be none|sum|mean, got {reduction!r}")
    n_shards = mesh.shape[axis]
    B = e.shape[0]
    if B % n_shards:
        raise ValueError(
            f"batch {B} not divisible by mesh axis {axis!r} size {n_shards}")
    durs = tuple(int(d) for d in durations)
    in_specs = (P(axis), P(axis), P(), P(), P(), P(),
                P(axis), P(axis), P(axis))
    out_specs = P(axis) if reduction == "none" else P()

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    )
    def _local(e, p, W, bias, Wd, bd, l, il, ll):
        costs = rnnt_loss_tdt_fused_joint(
            e, p, W, bias, Wd, bd, l, il, ll, durs, blank=blank,
            sigma=sigma, reduction="none", fastemit_lambda=fastemit_lambda,
            delay_penalty=delay_penalty, implementation=implementation,
        )
        if reduction == "none":
            return costs
        total = jax.lax.psum(jnp.sum(costs), axis)
        if reduction == "mean":
            total = total / B
        return total

    return _local(e, p, W, bias, Wd, bias_d, labels, input_lengths,
                  label_lengths)


def data_parallel_multiblank_fused_loss(
    e: jax.Array,
    p: jax.Array,
    W: jax.Array,
    bias: jax.Array,
    labels: jax.Array,
    input_lengths: jax.Array,
    label_lengths: jax.Array,
    big_blank_durations,
    mesh: Mesh,
    axis: str = DATA_AXIS,
    blank: int = 0,
    big_blank_indices=None,
    sigma: float = 0.0,
    reduction: str = "mean",
    fastemit_lambda: float = 0.0,
    delay_penalty: float = 0.0,
    implementation: str = "auto",
) -> jax.Array:
    """Fused multi-blank joint+loss, batch sharded over ``mesh[axis]``."""
    from ..ops.multiblank_fused import rnnt_loss_multiblank_fused_joint

    if reduction not in ("none", "sum", "mean"):
        raise ValueError(f"reduction must be none|sum|mean, got {reduction!r}")
    n_shards = mesh.shape[axis]
    B = e.shape[0]
    if B % n_shards:
        raise ValueError(
            f"batch {B} not divisible by mesh axis {axis!r} size {n_shards}")
    durs = tuple(int(m) for m in big_blank_durations)
    idx = (None if big_blank_indices is None
           else tuple(int(i) for i in big_blank_indices))
    in_specs = (P(axis), P(axis), P(), P(), P(axis), P(axis), P(axis))
    out_specs = P(axis) if reduction == "none" else P()

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    )
    def _local(e, p, W, bias, l, il, ll):
        costs = rnnt_loss_multiblank_fused_joint(
            e, p, W, bias, l, il, ll, durs, blank=blank,
            big_blank_indices=idx, sigma=sigma, reduction="none",
            fastemit_lambda=fastemit_lambda, delay_penalty=delay_penalty,
            implementation=implementation,
        )
        if reduction == "none":
            return costs
        total = jax.lax.psum(jnp.sum(costs), axis)
        if reduction == "mean":
            total = total / B
        return total

    return _local(e, p, W, bias, labels, input_lengths, label_lengths)
