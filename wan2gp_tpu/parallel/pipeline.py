"""Pipeline parallelism over a 'pp' mesh axis — GPipe-style inference
schedule (SURVEY §2.7 P7; reference analog: the dormant
pipeline-parallel inventory in models/magi_human/upstream/inference/
infra/parallelism/ and the PipeFusion lineage of patch-level DiT
pipelining, arXiv:2405.14430).

TPU-native design: `shard_map` over the 'pp' axis gives every device
the SAME program; each device applies only its own contiguous slice of
the layer stack (selected by `jax.lax.axis_index`), and activations
hop stage->stage with `ppermute` over ICI.  Microbatches stream
through the classic S+M-1 tick schedule; device s computes microbatch
(t - s) at tick t.  The result equals running all layers on one
device — verified bit-for-bit in tests on the virtual CPU mesh.

Inference-oriented: no 1F1B, no recompute — just the fill-drain
schedule, which for S stages and M microbatches reaches M/(S+M-1)
utilization (choose M >= S for >=50%).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:                      # older jax
    from jax.experimental.shard_map import shard_map


def split_stages(stacked_params, n_stages: int):
    """Split a scan-stacked layer pytree [L, ...] into [S, L/S, ...]
    so stage s's slice rides the 'pp' axis."""
    def resh(a):
        l = a.shape[0]
        assert l % n_stages == 0, (l, n_stages)
        return a.reshape(n_stages, l // n_stages, *a.shape[1:])
    return jax.tree.map(resh, stacked_params)


def pipeline_apply(mesh: Mesh, stage_params, x, stage_fn: Callable,
                   n_microbatches: int, axis: str = "pp"):
    """Run `stage_fn` over all pipeline stages.

    stage_params: pytree with leading axes [S, L/S, ...] (split_stages)
    x:            [M * mb, ...] batch to stream in M microbatches
    stage_fn(layer_params_slice, x_mb) -> x_mb, applying ONE stage's
    layers (e.g. an inner lax.scan over the [L/S, ...] slice).

    Returns the fully-processed batch, identical to applying all L
    layers sequentially on one device."""
    s = mesh.shape[axis]
    m = n_microbatches
    assert x.shape[0] % m == 0, (x.shape, m)
    mb = x.shape[0] // m
    xm = x.reshape(m, mb, *x.shape[1:])

    p_params = jax.tree.map(
        lambda a: jax.device_put(
            a, NamedSharding(mesh, P(axis))), stage_params)
    x_rep = jax.device_put(xm, NamedSharding(mesh, P()))

    def per_device(params_slice, xm):
        # params_slice: [1, L/S, ...] (this device's stage)
        params_local = jax.tree.map(lambda a: a[0], params_slice)
        idx = jax.lax.axis_index(axis)
        n_dev = jax.lax.psum(1, axis)
        zero = jnp.zeros_like(xm[0])
        n_ticks = s + m - 1

        def tick(carry, t):
            outputs, incoming = carry
            # stage 0 reads microbatch t from the input stream; others
            # read what arrived from the previous stage
            feed = jnp.where(
                idx == 0,
                xm[jnp.clip(t, 0, m - 1)], incoming)
            active = jnp.logical_and(t - idx >= 0, t - idx < m)
            out = stage_fn(params_local, feed)
            out = jnp.where(active, out, zero)
            # last stage writes its finished microbatch
            done_mb = jnp.clip(t - (n_dev - 1), 0, m - 1)
            is_done = jnp.logical_and(idx == n_dev - 1, active)
            outputs = jax.lax.dynamic_update_index_in_dim(
                outputs,
                jnp.where(is_done, out,
                          jax.lax.dynamic_index_in_dim(
                              outputs, done_mb, 0, keepdims=False)),
                done_mb, 0)
            # ship activations to the next stage over ICI
            shifted = jax.lax.ppermute(
                out, axis,
                [(i, (i + 1) % n_dev) for i in range(n_dev)])
            return (outputs, shifted), None

        outputs0 = jnp.zeros_like(xm)
        # the carries become device-varying after ppermute; mark them
        # varying over 'pp' up front (shard_map scan-vma rule)
        try:
            outputs0 = jax.lax.pvary(outputs0, (axis,))
            zero0 = jax.lax.pvary(zero, (axis,))
        except AttributeError:
            outputs0 = jax.lax.pcast(outputs0, (axis,), to="varying")
            zero0 = jax.lax.pcast(zero, (axis,), to="varying")
        (outputs, _), _ = jax.lax.scan(
            tick, (outputs0, zero0), jnp.arange(n_ticks))
        # every device returns its `outputs`; only the last stage's is
        # real — broadcast it back
        final = jax.lax.ppermute(
            outputs, axis,
            [(i, (i + 1) % n_dev) for i in range(n_dev)])
        # after one rotation, stage 0 holds the last stage's buffer;
        # psum a masked copy so every device agrees
        mine = jnp.where(idx == 0, final, jnp.zeros_like(final))
        return jax.lax.psum(mine, axis)

    fn = shard_map(per_device, mesh=mesh,
                   in_specs=(P(axis), P()), out_specs=P())
    out = fn(p_params, x_rep)
    return out.reshape(m * mb, *x.shape[1:])
