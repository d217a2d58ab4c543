"""Ulysses sequence parallelism: all-to-all head/sequence exchange.

TPU-native implementation of the strategy vendored (dormant) in the
reference (/root/reference/models/magi_human/upstream/inference/infra/
parallelism/ulysses_scheduler.py:27, all_to_all_primitive.py:32
scatter_head_gather_seqlen / :66 scatter_seqlen_gather_head): attention
inputs arrive sequence-sharded [B, L/n, N, D]; an all-to-all regroups them
head-sharded [B, L, N/n, D] so each device runs FULL-sequence attention
over its head subset, and a reverse all-to-all restores sequence sharding.

Compared to ring attention (ring_attention.py) this trades 2 all-to-alls
for the n-step ppermute pipeline — on ICI meshes the all-to-all is usually
cheaper when heads divide evenly; ring wins when N < n or memory for the
full K/V per device is tight.  Use inside shard_map over the 'sp'/'cp'
axis; the `attention` op runs unchanged on the regrouped tensors.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.attention import attention as _attention


def scatter_heads_gather_seq(x, axis_name: str):
    """[B, L/n, N, D] (seq-sharded) -> [B, L, N/n, D] (head-sharded)."""
    # all_to_all with tiled=True: split axis 2 (heads) into n chunks,
    # concatenate received chunks along axis 1 (sequence)
    return jax.lax.all_to_all(x, axis_name, split_axis=2, concat_axis=1,
                              tiled=True)


def scatter_seq_gather_heads(x, axis_name: str):
    """[B, L, N/n, D] (head-sharded) -> [B, L/n, N, D] (seq-sharded)."""
    return jax.lax.all_to_all(x, axis_name, split_axis=1, concat_axis=2,
                              tiled=True)


def ulysses_attention(q, k, v, axis_name: str = "sp", scale=None,
                      backend: str = "auto", kv_mask=None):
    """Full-sequence attention over sequence-sharded q/k/v [B, L/n, N, D].

    Must run inside shard_map with the sequence axis sharded over
    `axis_name`; heads must be divisible by the axis size."""
    n = jax.lax.psum(1, axis_name)
    if q.shape[2] % n:
        raise ValueError(f"heads {q.shape[2]} not divisible by axis {n}")
    qh = scatter_heads_gather_seq(q, axis_name)
    kh = scatter_heads_gather_seq(k, axis_name)
    vh = scatter_heads_gather_seq(v, axis_name)
    oh = _attention(qh, kh, vh, scale=scale, backend=backend,
                    kv_mask=kv_mask)
    return scatter_seq_gather_heads(oh, axis_name)
