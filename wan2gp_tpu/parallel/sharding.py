"""GSPMD sharding rules for the Wan DiT.

Tensor-parallel layout (Megatron-style column/row split, expressed as
NamedShardings — XLA inserts the psum on the row-parallel outputs):

  q/k/v kernels  [L, dim, dim]      -> shard output dim over 'tp' (heads)
  o kernel       [L, dim, dim]      -> shard input dim over 'tp'
  ffn fc1        [L, dim, ffn]      -> shard ffn over 'tp'
  ffn fc2        [L, ffn, dim]      -> shard ffn (input) over 'tp'
  q/k/v biases   [L, dim]           -> shard over 'tp'
  everything else                    -> replicated

Activations:
  latents/tokens [B, ...]           -> batch over 'dp', tokens over 'cp'
  context        [B, text_len, d]   -> batch over 'dp' (text is short)
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _spec_for_path(path: str) -> P:
    """PartitionSpec for a Wan DiT param, keyed by its tree path.

    Quantized variants: int8 `w_q` [L, K, N] shards like `w`; its per-output
    `scale` [L, N] shards with the output dim.  (Packed int4 `w_q4` is
    deliberately replicated: its Pallas kernel is not GSPMD-partitionable
    and the split-K nibble packing does not survive a K split.)"""
    if "blocks" not in path:
        return P()
    for name in ("q", "k", "v"):
        if path.endswith((f"{name}/w", f"{name}/w_q")):
            return P(None, None, "tp")       # [L, dim, dim] column-parallel
        if path.endswith((f"{name}/b", f"{name}/scale")):
            return P(None, "tp")             # [L, dim]
    if path.endswith(("o/w", "o/w_q")):      # [L, dim, dim] row-parallel
        return P(None, "tp", None)
    if path.endswith(("ffn/fc1/w", "ffn/fc1/w_q")):
        return P(None, None, "tp")
    if path.endswith(("ffn/fc1/b", "ffn/fc1/scale")):
        return P(None, "tp")
    if path.endswith(("ffn/fc2/w", "ffn/fc2/w_q")):
        return P(None, "tp", None)
    return P()


def _path_str(path) -> str:
    parts = []
    for e in path:
        if isinstance(e, jax.tree_util.DictKey):
            parts.append(str(e.key))
        else:
            parts.append(str(e))
    return "/".join(parts)


def wan_dit_param_specs(params):
    """Pytree of PartitionSpecs matching `params`."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: _spec_for_path(_path_str(path)), params)


def shard_wan_dit_params(params, mesh: Mesh):
    specs = wan_dit_param_specs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)


def dit_data_shardings(mesh: Mesh):
    """(latents, t, context) NamedShardings for the denoiser inputs."""
    return (
        NamedSharding(mesh, P("dp", None, None, "cp", None)),  # B,C,F,H,W
        NamedSharding(mesh, P("dp")),                          # t
        NamedSharding(mesh, P("dp", None, None)),              # context
    )


# ---------------------------------------------------------------------------
# Generic per-family tensor-parallel rules (SURVEY §2.7 P2: the reference's
# dormant DTensor col/row parallelize.py, kandinsky parallelize.py:12,
# expressed as NamedShardings — XLA inserts the psum on row-parallel
# outputs).  A rule maps a param-path suffix inside a block stack to a
# PartitionSpec; anything unmatched (and any dim that does not divide the
# mesh axis) stays replicated.
# ---------------------------------------------------------------------------

# LTX-2 (models/ltx2/dit.py): unfused to_q/k/v + to_out, fc1/fc2 — full
# Megatron column/row split, both video and audio streams.
LTX2_BLOCK_RULES = (
    (("to_q/w", "to_k/w", "to_v/w", "fc1/w", "to_gate_logits/w"),
     P(None, None, "tp")),
    (("to_q/b", "to_k/b", "to_v/b", "fc1/b", "to_gate_logits/b"),
     P(None, "tp")),
    (("to_out/w", "fc2/w"), P(None, "tp", None)),
)

# HunyuanVideo / Flux (models/hyvideo/dit.py, models/flux/dit.py): the
# attention qkv is a FUSED [h, 3h] linear whose column split does not align
# with the (3, heads, head_dim) decomposition, so it stays replicated; the
# MLP (2/3 of the linear FLOPs) and the row-parallel projections shard.
FUSED_QKV_BLOCK_RULES = (
    (("mlp1/w",), P(None, None, "tp")),
    (("mlp1/b",), P(None, "tp")),
    (("mlp2/w", "linear2/w", "proj/w"), P(None, "tp", None)),
)

_BLOCK_CONTAINERS = ("blocks/", "double_blocks/", "single_blocks/")


def rule_param_specs(params, rules, mesh: Mesh | None = None,
                     containers=_BLOCK_CONTAINERS):
    """PartitionSpec pytree from suffix rules; dims that do not divide
    their mesh axis fall back to replicated (small audio streams etc.)."""
    axis_sizes = dict(mesh.shape) if mesh is not None else {}

    def spec_for(path, leaf):
        ps = _path_str(path)
        if not any(c in ps for c in containers):
            return P()
        for suffixes, spec in rules:
            if ps.endswith(suffixes):
                for dim, name in enumerate(spec):
                    if name is None:
                        continue
                    size = axis_sizes.get(name, 1)
                    if dim >= leaf.ndim or leaf.shape[dim] % size != 0:
                        return P()
                return spec
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_params_with_rules(params, mesh: Mesh, rules):
    specs = rule_param_specs(params, rules, mesh)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, specs)
