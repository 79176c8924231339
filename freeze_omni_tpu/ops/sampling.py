"""Samplers, parity with the reference's decode order.

- `sample_top_k_top_p`: temperature -> softmax -> top-k (zero others, renorm)
  -> top-p over the descending-sorted survivors (always keep the argmax) ->
  renorm -> categorical. Matches AudioLLM._post_decode (models/audioLLM.py:431-477).
- `sample_top_k`: softmax -> top-k -> renorm -> categorical, matching the
  speech decoder's sampler (models/decoder/decoder.py:353-359).
- `apply_repetition_penalty`: divide logits of tokens present in the last-W
  window by `penalty` (models/decoder/decoder.py:349-351).

All are pure jittable functions over [..., vocab] logits.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("top_k",))
def sample_top_k(key, logits: jnp.ndarray, top_k: int) -> jnp.ndarray:
    """logits: [B, V]. Returns [B] int32."""
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    vals, idx = jax.lax.top_k(probs, top_k)  # descending
    vals = vals / jnp.sum(vals, axis=-1, keepdims=True)
    choice = jax.random.categorical(key, jnp.log(jnp.maximum(vals, 1e-30)), axis=-1)
    return jnp.take_along_axis(idx, choice[..., None], axis=-1)[..., 0]


@partial(jax.jit, static_argnames=("top_k", "top_p", "temperature"))
def sample_top_k_top_p(key, logits: jnp.ndarray, temperature: float = 1.0,
                       top_k: int = 0, top_p: float = 0.0) -> jnp.ndarray:
    """logits: [B, V]. Order matches audioLLM.py:431-477 exactly."""
    x = logits.astype(jnp.float32)
    x = jnp.where(temperature != 1.0, x / temperature, x)
    probs = jax.nn.softmax(x, axis=-1)

    k = top_k if top_k > 0 else probs.shape[-1]
    vals, idx = jax.lax.top_k(probs, k)  # descending
    vals = vals / jnp.sum(vals, axis=-1, keepdims=True)

    if top_p > 0.0:
        cum = jnp.cumsum(vals, axis=-1)
        remove = cum > top_p
        # keep the first (highest-prob) token unconditionally (audioLLM.py:468-470)
        remove = jnp.concatenate(
            [jnp.zeros_like(remove[..., :1]), remove[..., :-1]], axis=-1)
        vals = jnp.where(remove, 0.0, vals)
        vals = vals / jnp.sum(vals, axis=-1, keepdims=True)

    choice = jax.random.categorical(key, jnp.log(jnp.maximum(vals, 1e-30)), axis=-1)
    return jnp.take_along_axis(idx, choice[..., None], axis=-1)[..., 0]


def apply_repetition_penalty(logits: jnp.ndarray, window: jnp.ndarray,
                             penalty: float) -> jnp.ndarray:
    """logits: [B, V]; window: [B, W] int32 token ids of the recent window
    (use an out-of-range id, e.g. V, for empty slots). Tokens appearing in the
    window get their logit divided by `penalty` (once, set semantics)."""
    V = logits.shape[-1]
    present = jnp.any(jax.nn.one_hot(window, V, dtype=jnp.float32) > 0, axis=-2)
    return jnp.where(present, logits / penalty, logits)
