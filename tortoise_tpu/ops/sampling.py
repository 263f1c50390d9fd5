"""Logit post-processing and sampling.

Replicates the reference sampler's exact decision pipeline
(process_logits_and_sample, main.cpp:4562-4806):

    gather logits at previous-token ids -> CTRL repetition penalty
    (x*p if x<0 else x/p, p=2.0) -> scatter back -> /temperature (0.8)
    -> top-k (50): strictly-below-kth-largest set to float32 lowest
    -> "top-p": sort ascending, UNSHIFTED softmax over sorted values,
       cumulative sum, zero every position whose ascending cumsum <= 0.2
       except the final (largest) element (main.cpp:4685-4692) — this is
       nucleus sampling keeping the top 0.8 probability mass
    -> softmax -> multinomial (first index whose cumulative probability
       reaches the draw; the reference draws two uniforms and keeps the
       second, main.cpp:4708-4709).

Two planes:

- jit plane (this module's jnp functions): vectorized over the candidate
  batch, used inside the jitted decode loop with ``jax.random``.
- host parity plane (``host_process_logits_and_sample``): numpy float32 with
  the reference's exact operation order (sequential cumsums, unshifted
  softmax) driven by the mt19937 ``ReferenceRng`` so seeded reference runs
  reproduce decision-for-decision.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

F32_LOWEST = float(np.finfo(np.float32).min)


# --------------------------------------------------------------------------
# jit plane
# --------------------------------------------------------------------------

def apply_repetition_penalty(logits: jax.Array, prev_ids: jax.Array,
                             penalty: float = 2.0) -> jax.Array:
    """logits (B, V); prev_ids (B, K) int32. Gather/penalize/scatter
    (main.cpp:4562-4613). Duplicate ids are idempotent here because the
    penalized value depends only on the original value."""
    gathered = jnp.take_along_axis(logits, prev_ids, axis=-1)
    penalized = jnp.where(gathered < 0, gathered * penalty, gathered / penalty)
    out = logits
    # scatter: later duplicates overwrite with identical values
    b = jnp.arange(logits.shape[0])[:, None]
    out = out.at[b, prev_ids].set(penalized)
    return out


def top_k_filter(logits: jax.Array, k: int) -> jax.Array:
    """Keep values >= the kth largest (ties at the threshold survive,
    matching top_k_inplace, main.cpp:4640-4654)."""
    k = min(k, logits.shape[-1])
    vals = jax.lax.top_k(logits, k)[0]
    thresh = vals[..., -1:]
    return jnp.where(logits < thresh, F32_LOWEST, logits)


def top_p_filter(logits: jax.Array, p_drop: float = 0.2) -> jax.Array:
    """The reference's ascending-cumsum nucleus filter (main.cpp:4656-4693):
    drop tokens in the low tail whose cumulative probability is <= p_drop,
    never dropping the largest element."""
    order = jnp.argsort(logits, axis=-1)  # ascending
    s = jnp.take_along_axis(logits, order, axis=-1)
    probs = jax.nn.softmax(s, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    drop_sorted = cum <= p_drop
    drop_sorted = drop_sorted.at[..., -1].set(False)  # largest never dropped
    # rank-generic inverse permutation (gather beats scatter on TPU and
    # works for any batch shape): drop[..., tok] = drop_sorted[..., pos]
    # with order[..., pos] = tok
    inv = jnp.argsort(order, axis=-1)
    drop = jnp.take_along_axis(drop_sorted, inv, axis=-1)
    return jnp.where(drop, F32_LOWEST, logits)


def process_logits(logits: jax.Array, prev_ids: jax.Array,
                   temperature: float = 0.8, top_k: int = 50,
                   top_p_drop: float = 0.2,
                   repetition_penalty: float = 2.0) -> jax.Array:
    """Full filter pipeline -> probabilities (B, V)."""
    x = apply_repetition_penalty(logits, prev_ids, repetition_penalty)
    x = x / temperature
    x = top_k_filter(x, top_k)
    x = top_p_filter(x, top_p_drop)
    return jax.nn.softmax(x, axis=-1)


def sample_from_probs(key: jax.Array, probs: jax.Array) -> jax.Array:
    """Inverse-CDF draw matching the reference's multinomial semantics:
    first index whose cumulative probability reaches u (main.cpp:4703-4720).
    Vectorized over the batch."""
    cum = jnp.cumsum(probs, axis=-1)
    u = jax.random.uniform(key, (probs.shape[0], 1), dtype=probs.dtype)
    idx = jnp.sum(cum < u, axis=-1)
    return jnp.minimum(idx, probs.shape[-1] - 1).astype(jnp.int32)


# --------------------------------------------------------------------------
# host parity plane (numpy float32, reference operation order)
# --------------------------------------------------------------------------

def _host_softmax_unshifted(x: np.ndarray) -> np.ndarray:
    # the reference exponentiates raw values with no max subtraction and
    # accumulates the sum sequentially in float32 (softmax_inplace,
    # main.cpp:4656-4668); np.add.accumulate is the same sequential order
    e = np.exp(x, dtype=np.float32)
    return e / np.add.accumulate(e)[-1]


def host_process_logits_and_sample(
    logits: np.ndarray,
    prev_ids_per_seq,
    rng,
    temperature: float = 0.8,
    top_k: int = 50,
    top_p_drop: float = 0.2,
    repetition_penalty: float = 2.0,
):
    """Reference-exact host sampler.

    logits: (B, V) float32; prev_ids_per_seq: list of B int lists (the
    reference passes the full previous mel_transformer_inputs_vector);
    rng: ReferenceRng (mt19937 plane). Returns (B,) sampled ids.
    """
    logits = np.array(logits, dtype=np.float32)
    bsz, v = logits.shape
    samples = np.zeros(bsz, dtype=np.int64)
    # gather/penalty/scatter over the whole batch first (reference order)
    for b in range(bsz):
        ids = np.asarray(prev_ids_per_seq[b], dtype=np.int64)
        g = logits[b, ids]
        g = np.where(g < 0, g * np.float32(repetition_penalty),
                     g / np.float32(repetition_penalty))
        logits[b, ids] = g
    for b in range(bsz):
        row = logits[b].copy()
        row /= np.float32(temperature)
        # top-k
        kth = np.sort(row)[-min(top_k, v)]
        row[row < kth] = F32_LOWEST
        # reference top-p: ascending sort, unshifted softmax, seq cumsum
        order = np.argsort(row, kind="stable")
        s = row[order]
        p = _host_softmax_unshifted(s)
        cum = np.cumsum(p, dtype=np.float32)
        drop = cum <= np.float32(top_p_drop)
        drop[-1] = False
        row[order[drop]] = F32_LOWEST
        probs = _host_softmax_unshifted(row)
        samples[b] = rng.multinomial(probs)
    return samples


# --------------------------------------------------------------------------
# fused top-k-domain pipeline (fast in-loop path)
# --------------------------------------------------------------------------

def process_logits_topk(logits: jax.Array, prev_ids: jax.Array,
                        temperature: float = 0.8, top_k: int = 50,
                        top_p_drop: float = 0.2,
                        repetition_penalty: float = 2.0):
    """Equivalent of process_logits() computed in the k-candidate domain:
    after the top-k filter only k values can carry probability mass, so the
    nucleus rule reduces to suffix sums over the descending top-k values —
    no O(V log V) argsort in the decode loop. Returns (probs (B, k),
    ids (B, k)).

    (Exactness caveat vs the host plane: ties exactly at the kth value keep
    every tied token there but only k survive here; float-identical logits
    from a real model are vanishingly rare.)"""
    x = apply_repetition_penalty(logits, prev_ids, repetition_penalty)
    x = x / temperature
    top_k = min(top_k, logits.shape[-1])
    vals, ids = jax.lax.top_k(x, top_k)  # descending
    p = jax.nn.softmax(vals, axis=-1)
    # ascending-inclusive cumsum of a token == suffix sum in descending
    # order; the reference drops tokens with that mass <= p_drop, never
    # dropping the overall largest (main.cpp:4685-4692)
    suffix = jnp.cumsum(p[..., ::-1], axis=-1)[..., ::-1]
    drop = suffix <= top_p_drop
    drop = drop.at[..., 0].set(False)
    vals = jnp.where(drop, F32_LOWEST, vals)
    return jax.nn.softmax(vals, axis=-1), ids


def sample_from_topk_u(u: jax.Array, probs: jax.Array, ids: jax.Array,
                       ) -> jax.Array:
    """Inverse-CDF draw over the top-k candidates against a pre-drawn
    uniform u (B, 1), mapped back to vocab ids."""
    cum = jnp.cumsum(probs, axis=-1)
    pos = jnp.minimum(jnp.sum(cum < u, axis=-1), probs.shape[-1] - 1)
    return jnp.take_along_axis(ids, pos[:, None], axis=-1)[:, 0].astype(
        jnp.int32
    )


def sample_from_topk(key: jax.Array, probs: jax.Array, ids: jax.Array,
                     ) -> jax.Array:
    """Inverse-CDF draw over the top-k candidates, mapped back to vocab
    ids."""
    u = jax.random.uniform(key, (probs.shape[0], 1), dtype=probs.dtype)
    return sample_from_topk_u(u, probs, ids)
