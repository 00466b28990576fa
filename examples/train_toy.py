#!/usr/bin/env python
"""End-to-end toy training demo for warp_transducer_tpu.

Trains the flagship Transducer model (Conformer-lite encoder + LSTM
prediction + additive joint) on a synthetic copy task three ways:

  1. dense    — rnnt_loss on the full (B, T, U, V) joint;
  2. pruned   — two-stage pruned-transducer training (simple loss on the
                factorised heads + banded loss on an S-wide lattice band);
  3. fused    — the joint projection fused into the loss kernels (the
                (B, T, U, V) tensor never exists).

then greedy- and beam-decodes a batch. Runs on CPU in ~a minute
(`JAX_PLATFORMS=cpu python examples/train_toy.py`); on TPU the same code
uses the Pallas kernels automatically.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from warp_transducer_tpu.models.decoding import beam_search_decode, greedy_decode
from warp_transducer_tpu.models.transducer import (
    TransducerConfig,
    init_params,
    loss_fn,
    make_fused_train_step,
    make_model,
    make_pruned_train_step,
    make_train_step,
)


def synthetic_batch(cfg, B, T, L, seed):
    """Copy task: the labels are drawn per-utterance; features encode them."""
    rng = np.random.RandomState(seed)
    labels = rng.randint(1, cfg.vocab_size, size=(B, L)).astype(np.int32)
    # features: each label smeared over T/L frames + noise
    feats = np.zeros((B, T, cfg.input_dim), np.float32)
    for b in range(B):
        for i, y in enumerate(labels[b]):
            lo = (i * T) // L
            hi = ((i + 1) * T) // L
            feats[b, lo:hi, y % cfg.input_dim] = 1.0
    feats += 0.05 * rng.randn(B, T, cfg.input_dim).astype(np.float32)
    return {
        "feats": jnp.asarray(feats),
        "feat_lengths": jnp.full((B,), T, jnp.int32),
        "labels": jnp.asarray(labels),
        "label_lengths": jnp.full((B,), L, jnp.int32),
    }


def main():
    cfg = TransducerConfig(
        vocab_size=16, encoder_dim=64, encoder_layers=1, encoder_heads=2,
        prediction_dim=64, joint_dim=64, input_dim=16, conv_kernel=5,
        dtype=jnp.float32,
    )
    model = make_model(cfg)
    B, T, L = 4, 24, 6
    batch = synthetic_batch(cfg, B, T, L, seed=0)
    opt = optax.adam(3e-3)

    steps = {
        "dense": make_train_step(model, opt),
        "pruned": make_pruned_train_step(model, opt, s_range=3),
        "fused": make_fused_train_step(model, opt),
    }
    for name, step in steps.items():
        params = init_params(cfg, jax.random.PRNGKey(0), B=B, T=T, U=L + 1)
        opt_state = opt.init(params)
        jstep = jax.jit(step)
        losses = []
        for i in range(40):
            params, opt_state, loss = jstep(params, opt_state, batch)
            losses.append(float(loss))
        print(f"{name:6s}: loss {losses[0]:.3f} -> {losses[-1]:.3f}")
        assert losses[-1] < losses[0], f"{name} did not learn"

    # decode with the dense-trained parameters
    params = init_params(cfg, jax.random.PRNGKey(0), B=B, T=T, U=L + 1)
    opt_state = opt.init(params)
    jstep = jax.jit(steps["dense"])
    for i in range(150):
        params, opt_state, loss = jstep(params, opt_state, batch)
    gt, gn = greedy_decode(model, params, batch["feats"],
                           batch["feat_lengths"], max_symbols=L + 2)
    bt, bn, bs = beam_search_decode(model, params, batch["feats"],
                                    batch["feat_lengths"], max_symbols=L + 2,
                                    beam=4, expansions=3)
    ref = np.asarray(batch["labels"])
    greedy_ok = sum(
        np.array_equal(np.asarray(gt[b, : int(gn[b])]), ref[b])
        for b in range(B)
    )
    beam_ok = sum(
        np.array_equal(np.asarray(bt[b, 0, : int(bn[b, 0])]), ref[b])
        for b in range(B)
    )
    print(f"decode: greedy exact-match {greedy_ok}/{B}, "
          f"beam exact-match {beam_ok}/{B} (loss {float(loss):.3f})")

    # --- Token-and-Duration Transducer (arXiv 2304.06795) ---------------
    # A duration head on the joint decides how many frames each emission
    # consumes; greedy decode then skips frames by the duration argmax.
    import dataclasses

    from warp_transducer_tpu.models.decoding import greedy_decode_tdt
    from warp_transducer_tpu.models.transducer import make_tdt_train_step

    tdt_cfg = dataclasses.replace(cfg, tdt_durations=(0, 1, 2, 4))
    tdt_model = make_model(tdt_cfg)
    params = init_params(tdt_cfg, jax.random.PRNGKey(0), B=B, T=T, U=L + 1)
    opt_state = opt.init(params)
    jstep = jax.jit(make_tdt_train_step(tdt_model, opt, sigma=0.02))
    losses = []
    for i in range(150):
        params, opt_state, loss = jstep(params, opt_state, batch)
        losses.append(float(loss))
    tt, tn = greedy_decode_tdt(tdt_model, params, batch["feats"],
                               batch["feat_lengths"], max_symbols=L + 2)
    tdt_ok = sum(
        np.array_equal(np.asarray(tt[b, : int(tn[b])]), ref[b])
        for b in range(B)
    )
    # ALSD beam search over the duration arcs (per-beam time pointers)
    from warp_transducer_tpu.models.decoding import beam_search_decode_tdt

    tbt, tbn, _ = beam_search_decode_tdt(
        tdt_model, params, batch["feats"], batch["feat_lengths"],
        max_symbols=L + 2, beam=4, sigma=0.02)
    tdt_beam_ok = sum(
        np.array_equal(np.asarray(tbt[b, 0, : int(tbn[b, 0])]), ref[b])
        for b in range(B)
    )
    print(f"tdt   : loss {losses[0]:.3f} -> {losses[-1]:.3f}, "
          f"greedy exact-match {tdt_ok}/{B}, beam {tdt_beam_ok}/{B}")
    assert losses[-1] < losses[0], "tdt did not learn"
    assert tdt_beam_ok >= tdt_ok, "beam should not decode worse than greedy"


if __name__ == "__main__":
    main()
