"""Ring attention over a context-parallel mesh axis.

The TPU-native replacement for the reference's dormant ring P2P context
parallelism (models/longcat/modules/block_sparse_attention/communicate.py:4
p2p_communicate — batched NCCL isend/irecv KV exchange): K/V shards rotate
around the 'cp' ring via `jax.lax.ppermute` while each device accumulates
online-softmax partials for its local Q shard.  Communication overlaps with
the next block's compute under XLA's latency-hiding scheduler.

Use inside shard_map with sequence-sharded q/k/v:
    shard_map(lambda q, k, v: ring_attention(q, k, v, axis_name="cp"),
              mesh, in_specs=P(None, "cp", None, None), ...)
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp


def ring_attention(q, k, v, axis_name: str = "cp",
                   scale: float | None = None, kv_mask=None):
    """q, k, v: local shards [B, L_loc, N, D] (sequence-sharded on axis 1).
    Returns the local output shard [B, L_loc, N, D], numerically equal to
    full attention over the gathered sequence.

    kv_mask: optional [B, S_loc] LOCAL key-validity shard (False = padded
    key, e.g. zero-padded text or packed sequences on krea2-style models);
    it rotates around the ring together with its K/V shard so every query
    sees the correct global mask.
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    n_dev = jax.lax.axis_size(axis_name)
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

    qf = q.astype(jnp.float32) * scale
    b, l, n, d = q.shape
    if kv_mask is not None:
        mask0 = kv_mask.astype(jnp.float32)          # [B, S_loc]
    else:
        # derived from k so it carries the same shard_map "varying over
        # cp" type as the ppermute outputs in the loop carry
        mask0 = jnp.ones_like(k[..., 0, 0], jnp.float32)

    def block(k_blk, v_blk, m_valid):
        s = jnp.einsum("blnd,bsnd->bnls", qf, k_blk.astype(jnp.float32))
        s = jnp.where(m_valid[:, None, None, :] > 0, s,
                      jnp.finfo(jnp.float32).min)
        m_blk = jnp.max(s, axis=-1, keepdims=True)           # [B,N,L,1]
        p = jnp.exp(s - m_blk)
        # fully-masked blocks: zero contributions, neutral max
        p = p * m_valid[:, None, None, :]
        l_blk = jnp.sum(p, axis=-1, keepdims=True)
        o_blk = jnp.einsum("bnls,bsnd->bnld", p,
                           v_blk.astype(jnp.float32))
        return m_blk, l_blk, o_blk

    def body(i, carry):
        m, l_sum, acc, k_cur, v_cur, m_cur = carry
        m_blk, l_blk, o_blk = block(k_cur, v_cur, m_cur)
        m_new = jnp.maximum(m, m_blk)
        alpha = jnp.exp(m - m_new)
        beta = jnp.exp(m_blk - m_new)
        l_sum = l_sum * alpha + l_blk * beta
        acc = acc * alpha + o_blk * beta
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        m_nxt = jax.lax.ppermute(m_cur, axis_name, perm)
        return m_new, l_sum, acc, k_nxt, v_nxt, m_nxt

    # derive initial stats from q so they carry the same shard_map
    # "varying over cp" type as the loop outputs
    z = jnp.zeros_like(qf).transpose(0, 2, 1, 3)     # [B, N, L, D]
    m0 = z[..., :1] - 1e30
    l0 = z[..., :1]
    acc0 = z
    m, l_sum, acc, _, _, _ = jax.lax.fori_loop(
        0, n_dev, body, (m0, l0, acc0, k, v, mask0))
    out = acc / jnp.maximum(l_sum, 1e-30)
    return out.transpose(0, 2, 1, 3).astype(q.dtype)
