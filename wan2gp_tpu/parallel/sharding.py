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

# Full-coverage rules for the UNFUSED layout produced by
# `unfuse_fused_linears` below: attention q/k/v column-parallel over
# 'tp' (heads), projections and mlp2 row-parallel — the reference's
# dormant DTensor plan (kandinsky parallelize.py:12 shards attn + MLP)
# with none of the fused-qkv boundary misalignment.
UNFUSED_BLOCK_RULES = (
    (("q/w", "k/w", "v/w", "q/w_q", "k/w_q", "v/w_q",
      "l1_q/w", "l1_k/w", "l1_v/w", "l1_q/w_q", "l1_k/w_q", "l1_v/w_q",
      "l1_mlp/w", "l1_mlp/w_q",
      "l1_mlp_gate/w", "l1_mlp_val/w",
      "l1_mlp_gate/w_q", "l1_mlp_val/w_q",
      "mlp1/w", "mlp1/w_q",
      "mlp_gate/w", "mlp_val/w", "mlp_gate/w_q", "mlp_val/w_q",
      "to_q/w", "to_k/w", "to_v/w", "fc1/w", "to_gate_logits/w",
      "mod/w", "ada/w"),
     P(None, None, "tp")),
    (("q/b", "k/b", "v/b", "q/scale", "k/scale", "v/scale",
      "l1_q/b", "l1_k/b", "l1_v/b",
      "l1_q/scale", "l1_k/scale", "l1_v/scale",
      "l1_mlp/b", "l1_mlp/scale",
      "l1_mlp_gate/b", "l1_mlp_val/b",
      "l1_mlp_gate/scale", "l1_mlp_val/scale",
      "mlp1/b", "mlp1/scale",
      "mlp_gate/b", "mlp_val/b", "mlp_gate/scale", "mlp_val/scale",
      "to_q/b", "to_k/b", "to_v/b", "fc1/b", "to_gate_logits/b",
      "mod/b", "ada/b"),
     P(None, "tp")),
    (("proj/w", "mlp2/w", "l2_attn/w", "l2_mlp/w", "proj/w_q",
      "mlp2/w_q", "l2_attn/w_q", "l2_mlp/w_q",
      "to_out/w", "fc2/w"),
     P(None, "tp", None)),
)


def _split_linear_cols(p: dict, bounds):
    """Split a (possibly stacked / quantized) linear param dict on its
    OUTPUT dim: w/w_q/w_q4 [..., K(or Kp/2), N] and b/scale [..., N]."""
    outs = []
    for j, (n0, n1) in enumerate(bounds):
        q = {}
        for k, v in p.items():
            if k in ("w", "w_q", "w_q4", "b", "scale"):
                q[k] = v[..., n0:n1]
            else:
                q[k] = v
        outs.append(q)
    return outs


def _split_linear_rows(p: dict, bounds):
    """Split a linear param dict on its INPUT dim (w [..., K, N] only;
    packed w_q4 cannot split on K — callers must keep those fused).
    The bias belongs to the SUM of the parts: it stays on part 0."""
    outs = []
    for j, (k0, k1) in enumerate(bounds):
        q = {}
        for k, v in p.items():
            if k in ("w", "w_q"):
                q[k] = v[..., k0:k1, :]
            elif k == "b":
                if j == 0:
                    q[k] = v
            elif k == "scale":
                q[k] = v          # per-output scale: same for every part
            else:
                q[k] = v
        outs.append(q)
    return outs


def unfuse_fused_linears(block_params, hidden_size: int,
                         swiglu: bool = False):
    """Rewrite a block-stack pytree from the FUSED flux/hyvideo layout to
    an unfused one whose tensor-parallel column/row splits align with
    heads (consumed by UNFUSED_BLOCK_RULES):

      qkv   [.., h, 3h]       -> q, k, v                  [.., h, h]
      mlp1  [.., h, 2M] swiglu -> mlp_gate, mlp_val        [.., h, M]
      linear1 [.., h, 3h + M] -> l1_q/k/v + l1_mlp
                                 (swiglu: l1_mlp_gate/val  [.., h, M/2])
      linear2 [.., h + K, h]  -> l2_attn [.., h, h] + l2_mlp [.., K, h]
                                 (outputs summed; bias on l2_attn)

    Identity on numerics: the forward recombines the parts with the same
    matmul math (a column/row split of one matmul).  Packed-int4 leaves
    (w_q4) split fine on columns; a linear2 holding w_q4 is left fused
    (row split would break the K-nibble packing) — callers keep the
    fused-path forward for it."""
    h = hidden_size

    def rec(node):
        if not isinstance(node, dict):
            return node
        node = {k: rec(v) for k, v in node.items()}
        if "qkv" in node and isinstance(node["qkv"], dict):
            q, k_, v = _split_linear_cols(
                node.pop("qkv"), [(0, h), (h, 2 * h), (2 * h, 3 * h)])
            node["q"], node["k"], node["v"] = q, k_, v
        if swiglu and "mlp1" in node and isinstance(node["mlp1"], dict):
            w = node["mlp1"].get("w", node["mlp1"].get("w_q"))
            if w is not None:
                m2 = w.shape[-1]
                gate, val = _split_linear_cols(
                    node.pop("mlp1"), [(0, m2 // 2), (m2 // 2, m2)])
                node["mlp_gate"], node["mlp_val"] = gate, val
        if "linear1" in node and isinstance(node["linear1"], dict):
            w = node["linear1"].get("w", node["linear1"].get("w_q"))
            if w is not None and w.shape[-1] > 3 * h:
                m = w.shape[-1] - 3 * h
                parts = _split_linear_cols(
                    node.pop("linear1"),
                    [(0, h), (h, 2 * h), (2 * h, 3 * h), (3 * h, 3 * h + m)])
                node["l1_q"], node["l1_k"], node["l1_v"] = parts[:3]
                if swiglu:
                    g, val = _split_linear_cols(
                        parts[3], [(0, m // 2), (m // 2, m)])
                    node["l1_mlp_gate"], node["l1_mlp_val"] = g, val
                else:
                    node["l1_mlp"] = parts[3]
        if "linear2" in node and isinstance(node["linear2"], dict) \
                and "w_q4" not in node["linear2"]:
            w = node["linear2"].get("w", node["linear2"].get("w_q"))
            if w is not None and w.shape[-2] > h:
                att, mlp = _split_linear_rows(
                    node.pop("linear2"), [(0, h), (h, w.shape[-2])])
                node["l2_attn"], node["l2_mlp"] = att, mlp
        return node

    return rec(block_params)


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
