"""LTX-2 transformer checkpoint loading (LTXModel key space).

Keys (/root/reference/models/ltx2/ltx_core/model/transformer/model.py:139-206,
transformer.py:70-153, attention.py:160-190, feed_forward.py:6-15,
adaln.py:18-44):
  patchify_proj / audio_patchify_proj
  caption_projection.linear_{1,2} / audio_caption_projection.linear_{1,2}
  {adaln_single, audio_adaln_single, av_ca_video_scale_shift_adaln_single,
   av_ca_audio_scale_shift_adaln_single, av_ca_a2v_gate_adaln_single,
   av_ca_v2a_gate_adaln_single, prompt_adaln_single,
   audio_prompt_adaln_single}.{emb.timestep_embedder.linear_{1,2}, linear}
  transformer_blocks.N.{attn1, attn2, audio_attn1, audio_attn2,
   audio_to_video_attn, video_to_audio_attn}.{to_q,to_k,to_v,to_out.0,
   q_norm,k_norm[,to_gate_logits]}
  transformer_blocks.N.{ff,audio_ff}.net.{0.proj,2}
  transformer_blocks.N.{scale_shift_table, audio_scale_shift_table,
   scale_shift_table_a2v_ca_audio, scale_shift_table_a2v_ca_video
   [, prompt_scale_shift_table, audio_prompt_scale_shift_table]}
  scale_shift_table / audio_scale_shift_table, proj_out / audio_proj_out
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .ltxv_checkpoint import _lin, _w


def _table(sd, name):
    return jnp.asarray(np.asarray(sd.pop(name), np.float32))


def _adaln(sd, pre, dtype):
    return {"t1": _lin(sd, f"{pre}.emb.timestep_embedder.linear_1", dtype),
            "t2": _lin(sd, f"{pre}.emb.timestep_embedder.linear_2", dtype),
            "linear": _lin(sd, f"{pre}.linear", dtype)}


def load_ltx2_params(sd: Dict[str, np.ndarray], cfg,
                     dtype=jnp.bfloat16) -> Tuple[dict, List[str]]:
    """cfg: LTX2Config.  Returns (params, leftover_keys)."""
    sd = dict(sd)
    for pre in ("model.diffusion_model.", "transformer.", "model."):
        if any(k.startswith(pre + "transformer_blocks.") for k in sd):
            sd = {k[len(pre):] if k.startswith(pre) else k: v
                  for k, v in sd.items()}
            break

    def attn(pre):
        p = {"to_q": _lin(sd, f"{pre}.to_q", dtype),
             "to_k": _lin(sd, f"{pre}.to_k", dtype),
             "to_v": _lin(sd, f"{pre}.to_v", dtype),
             "to_out": _lin(sd, f"{pre}.to_out.0", dtype),
             "q_norm": _w(sd, f"{pre}.q_norm"),
             "k_norm": _w(sd, f"{pre}.k_norm")}
        if f"{pre}.to_gate_logits.weight" in sd:
            p["to_gate_logits"] = _lin(sd, f"{pre}.to_gate_logits", dtype)
        return p

    def ff(pre):
        return {"fc1": _lin(sd, f"{pre}.net.0.proj", dtype),
                "fc2": _lin(sd, f"{pre}.net.2", dtype)}

    blocks = []
    for i in range(cfg.num_layers):
        pre = f"transformer_blocks.{i}"
        b = {
            "attn1": attn(f"{pre}.attn1"),
            "attn2": attn(f"{pre}.attn2"),
            "ff": ff(f"{pre}.ff"),
            "scale_shift_table": _table(sd, f"{pre}.scale_shift_table"),
            "audio_attn1": attn(f"{pre}.audio_attn1"),
            "audio_attn2": attn(f"{pre}.audio_attn2"),
            "audio_ff": ff(f"{pre}.audio_ff"),
            "audio_scale_shift_table": _table(
                sd, f"{pre}.audio_scale_shift_table"),
            "audio_to_video_attn": attn(f"{pre}.audio_to_video_attn"),
            "video_to_audio_attn": attn(f"{pre}.video_to_audio_attn"),
            "sst_av_audio": _table(sd, f"{pre}.scale_shift_table_a2v_ca_audio"),
            "sst_av_video": _table(sd, f"{pre}.scale_shift_table_a2v_ca_video"),
        }
        if cfg.cross_attention_adaln:
            b["prompt_scale_shift_table"] = _table(
                sd, f"{pre}.prompt_scale_shift_table")
            b["audio_prompt_scale_shift_table"] = _table(
                sd, f"{pre}.audio_prompt_scale_shift_table")
        blocks.append(b)

    params = {
        "patchify_proj": _lin(sd, "patchify_proj", jnp.float32),
        "audio_patchify_proj": _lin(sd, "audio_patchify_proj", jnp.float32),
        "caption_projection": {
            "linear_1": _lin(sd, "caption_projection.linear_1", dtype),
            "linear_2": _lin(sd, "caption_projection.linear_2", dtype)},
        "audio_caption_projection": {
            "linear_1": _lin(sd, "audio_caption_projection.linear_1", dtype),
            "linear_2": _lin(sd, "audio_caption_projection.linear_2", dtype)},
        "adaln_single": _adaln(sd, "adaln_single", dtype),
        "audio_adaln_single": _adaln(sd, "audio_adaln_single", dtype),
        "av_ca_video_ss": _adaln(
            sd, "av_ca_video_scale_shift_adaln_single", dtype),
        "av_ca_audio_ss": _adaln(
            sd, "av_ca_audio_scale_shift_adaln_single", dtype),
        "av_ca_a2v_gate": _adaln(sd, "av_ca_a2v_gate_adaln_single", dtype),
        "av_ca_v2a_gate": _adaln(sd, "av_ca_v2a_gate_adaln_single", dtype),
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "scale_shift_table": _table(sd, "scale_shift_table"),
        "audio_scale_shift_table": _table(sd, "audio_scale_shift_table"),
        "proj_out": _lin(sd, "proj_out", jnp.float32),
        "audio_proj_out": _lin(sd, "audio_proj_out", jnp.float32),
    }
    if cfg.cross_attention_adaln:
        params["prompt_adaln_single"] = _adaln(sd, "prompt_adaln_single",
                                               dtype)
        params["audio_prompt_adaln_single"] = _adaln(
            sd, "audio_prompt_adaln_single", dtype)
    return params, sorted(sd.keys())
