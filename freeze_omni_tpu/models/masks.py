"""Attention mask builders (parity with models/masks.py semantics).

All masks are boolean with True = attend, built as pure functions of static
shapes (jit-safe). The dynamic-chunk *training* mask (masks.py:125-183) samples
a chunk size per batch — randomness is passed in explicitly as a JAX key.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def make_pad_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """[B] lengths -> [B, T] True at PADDED positions (masks.py:3-21)."""
    return jnp.arange(max_len)[None, :] >= lengths[:, None]


def make_valid_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """[B, T] True at valid positions (the reference always uses ~pad)."""
    return ~make_pad_mask(lengths, max_len)


def subsequent_mask(size: int) -> jnp.ndarray:
    """[T, T] lower-triangular causal mask (masks.py:23-57)."""
    idx = jnp.arange(size)
    return idx[None, :] <= idx[:, None]


def subsequent_chunk_mask(size: int, chunk_size: int,
                          num_left_chunks: int = -1) -> jnp.ndarray:
    """[T, T]: position i attends within its chunk (incl. lookahead to the
    chunk end) and up to num_left_chunks previous chunks (masks.py:59-123)."""
    idx = jnp.arange(size)
    chunk_of = idx // chunk_size
    hi = (chunk_of + 1) * chunk_size
    if num_left_chunks < 0:
        lo = jnp.zeros_like(idx)
    else:
        lo = jnp.maximum((chunk_of - num_left_chunks) * chunk_size, 0)
    j = idx[None, :]
    return (j >= lo[:, None]) & (j < hi[:, None])


def add_optional_chunk_mask(size: int, pad_mask: jnp.ndarray,
                            use_dynamic_chunk: bool,
                            decoding_chunk_size: int,
                            num_left_chunks: int,
                            key: Optional[jax.Array] = None,
                            max_dynamic_chunk: int = 25) -> jnp.ndarray:
    """[B, T, T] combined chunk+pad mask (masks.py:125-151 semantics).

    use_dynamic_chunk=True samples chunk in [1, max_dynamic_chunk] (training
    augmentation for streaming robustness); otherwise the static
    (decoding_chunk_size, num_left_chunks) mask is applied."""
    if use_dynamic_chunk:
        assert key is not None, "dynamic chunking needs a PRNG key"
        # one sampled chunk size per call (the reference samples per batch)
        chunk = int(jax.random.randint(key, (), 1, max_dynamic_chunk + 1))
        cm = subsequent_chunk_mask(size, chunk, -1)
    elif decoding_chunk_size > 0:
        cm = subsequent_chunk_mask(size, decoding_chunk_size, num_left_chunks)
    else:
        cm = jnp.ones((size, size), bool)
    return cm[None] & pad_mask[:, None, :] & pad_mask[:, :, None]


def target_mask(ys_lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """[B, T, T] causal & valid decoder-target mask (masks.py:185-195)."""
    valid = make_valid_mask(ys_lengths, max_len)
    return subsequent_mask(max_len)[None] & valid[:, None, :] & valid[:, :, None]
