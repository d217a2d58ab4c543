"""ACE-Step 1.5 checkpoint loading (reference
models/TTS/ace_step15/models/modeling_acestep_v15_turbo.py HF key
space).

  decoder.proj_in.1.{weight,bias}          Conv1d k=patch s=patch
  decoder.time_embed{,_r}.{linear_1,linear_2,time_proj}
  decoder.condition_embedder
  decoder.layers.N.{self_attn_norm, self_attn.{q,k,v,o}_proj,
      self_attn.{q,k}_norm, cross_attn_norm, cross_attn.*, mlp_norm,
      mlp.{gate,up,down}_proj, scale_shift_table [1,6,D]}
  decoder.norm_out / decoder.scale_shift_table [1,2,D]
  decoder.proj_out.1.{weight,bias}         ConvTranspose1d k=p s=p
  null_condition_emb
  encoder.text_projector
  encoder.{lyric,timbre}_encoder.{embed_tokens, layers.N.{
      input_layernorm, self_attn.*, post_attention_layernorm, mlp.*},
      norm}  (+ timbre special_token)
  tokenizer.audio_acoustic_proj
  tokenizer.attention_pooler.{embed_tokens, special_token, layers, norm}
  tokenizer.quantizer.layers.0.{project_in, project_out}
  detokenizer.{embed_tokens, special_tokens, layers, norm, proj_out}
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np
import jax
import jax.numpy as jnp


def _lin(sd, name, dtype):
    w = np.asarray(sd.pop(f"{name}.weight"), np.float32)
    p = {"w": jnp.asarray(w.T).astype(dtype)}
    b = sd.pop(f"{name}.bias", None)
    if b is not None:
        p["b"] = jnp.asarray(np.asarray(b, np.float32)).astype(dtype)
    return p


def _vec(sd, name):
    return jnp.asarray(np.asarray(sd.pop(name), np.float32))


def _enc_layer(sd, pre, dtype):
    return {"in_norm": _vec(sd, f"{pre}.input_layernorm.weight"),
            "attn": {
                "q": _lin(sd, f"{pre}.self_attn.q_proj", dtype),
                "k": _lin(sd, f"{pre}.self_attn.k_proj", dtype),
                "v": _lin(sd, f"{pre}.self_attn.v_proj", dtype),
                "o": _lin(sd, f"{pre}.self_attn.o_proj", dtype),
                "qn": _vec(sd, f"{pre}.self_attn.q_norm.weight"),
                "kn": _vec(sd, f"{pre}.self_attn.k_norm.weight")},
            "post_norm": _vec(
                sd, f"{pre}.post_attention_layernorm.weight"),
            "mlp": {
                "gate": _lin(sd, f"{pre}.mlp.gate_proj", dtype),
                "up": _lin(sd, f"{pre}.mlp.up_proj", dtype),
                "down": _lin(sd, f"{pre}.mlp.down_proj", dtype)}}


def _enc_stack(sd, pre, n, dtype, embed=True, norm=True):
    out = {}
    if embed:
        out["embed"] = _lin(sd, f"{pre}.embed_tokens", dtype)
    out["layers"] = [_enc_layer(sd, f"{pre}.layers.{i}", dtype)
                     for i in range(n)]
    if norm:
        out["norm"] = _vec(sd, f"{pre}.norm.weight")
    return out


def load_ace15_params(sd: Dict[str, np.ndarray], cfg,
                      dtype=jnp.bfloat16) -> Tuple[dict, List[str]]:
    """Map the HF state dict onto init_ace15's tree."""
    sd = dict(sd)
    for pre in ("model.", "transformer."):
        if any(k.startswith(pre + "decoder.layers.") for k in sd):
            sd = {k[len(pre):] if k.startswith(pre) else k: v
                  for k, v in sd.items()}
            break
    ecfg = cfg.encoder_cfg()
    p_ch = cfg.patch_size

    def t_embed(pre):
        return {"l1": _lin(sd, f"{pre}.linear_1", dtype),
                "l2": _lin(sd, f"{pre}.linear_2", dtype),
                "proj": _lin(sd, f"{pre}.time_proj", dtype)}

    def dit_layer(i):
        b = f"decoder.layers.{i}"
        return {
            "sa_norm": _vec(sd, f"{b}.self_attn_norm.weight"),
            "sa": {"q": _lin(sd, f"{b}.self_attn.q_proj", dtype),
                   "k": _lin(sd, f"{b}.self_attn.k_proj", dtype),
                   "v": _lin(sd, f"{b}.self_attn.v_proj", dtype),
                   "o": _lin(sd, f"{b}.self_attn.o_proj", dtype),
                   "qn": _vec(sd, f"{b}.self_attn.q_norm.weight"),
                   "kn": _vec(sd, f"{b}.self_attn.k_norm.weight")},
            "ca_norm": _vec(sd, f"{b}.cross_attn_norm.weight"),
            "ca": {"q": _lin(sd, f"{b}.cross_attn.q_proj", dtype),
                   "k": _lin(sd, f"{b}.cross_attn.k_proj", dtype),
                   "v": _lin(sd, f"{b}.cross_attn.v_proj", dtype),
                   "o": _lin(sd, f"{b}.cross_attn.o_proj", dtype),
                   "qn": _vec(sd, f"{b}.cross_attn.q_norm.weight"),
                   "kn": _vec(sd, f"{b}.cross_attn.k_norm.weight")},
            "mlp_norm": _vec(sd, f"{b}.mlp_norm.weight"),
            "mlp": {"gate": _lin(sd, f"{b}.mlp.gate_proj", dtype),
                    "up": _lin(sd, f"{b}.mlp.up_proj", dtype),
                    "down": _lin(sd, f"{b}.mlp.down_proj", dtype)},
            "sst": _vec(sd, f"{b}.scale_shift_table")
            .reshape(6, -1).astype(dtype),
        }

    layers = [dit_layer(i) for i in range(cfg.layers)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)

    # proj_in Conv1d [D, Cin, p] -> dense [(k*Cin), D]
    w = np.asarray(sd.pop("decoder.proj_in.1.weight"), np.float32)
    proj_in = {"w": jnp.asarray(
        w.transpose(2, 1, 0).reshape(-1, w.shape[0])).astype(dtype),
        "b": _vec(sd, "decoder.proj_in.1.bias").astype(dtype)}
    # proj_out ConvTranspose1d [D, Cout, p] -> dense [D, (k*Cout)]
    w = np.asarray(sd.pop("decoder.proj_out.1.weight"), np.float32)
    proj_out = {"w": jnp.asarray(
        w.transpose(0, 2, 1).reshape(w.shape[0], -1)).astype(dtype),
        "b": jnp.asarray(np.tile(np.asarray(
            sd.pop("decoder.proj_out.1.bias"), np.float32), p_ch)
        ).astype(dtype)}

    dit = {
        "proj_in": proj_in,
        "time": t_embed("decoder.time_embed"),
        "time_r": t_embed("decoder.time_embed_r"),
        "cond_embed": _lin(sd, "decoder.condition_embedder", dtype),
        "layers": stacked,
        "norm_out": _vec(sd, "decoder.norm_out.weight"),
        "proj_out": proj_out,
        "out_sst": _vec(sd, "decoder.scale_shift_table")
        .reshape(2, -1).astype(dtype),
        "null_cond": jnp.asarray(np.asarray(
            sd.pop("null_condition_emb"), np.float32)).astype(dtype),
    }

    lyric = _enc_stack(sd, "encoder.lyric_encoder", cfg.lyric_layers,
                       dtype)
    timbre = _enc_stack(sd, "encoder.timbre_encoder",
                        cfg.timbre_layers, dtype)
    st = sd.pop("encoder.timbre_encoder.special_token", None)
    if st is not None:
        timbre["special"] = jnp.asarray(
            np.asarray(st, np.float32).reshape(1, -1)).astype(dtype)

    pooler = _enc_stack(sd, "tokenizer.attention_pooler",
                        cfg.pooler_layers, dtype)
    pooler["special"] = jnp.asarray(np.asarray(
        sd.pop("tokenizer.attention_pooler.special_token"),
        np.float32)[0]).astype(dtype)
    detok = _enc_stack(sd, "detokenizer", cfg.pooler_layers, dtype)
    detok["special"] = jnp.asarray(np.asarray(
        sd.pop("detokenizer.special_tokens"),
        np.float32)).astype(dtype)
    detok["proj_out"] = _lin(sd, "detokenizer.proj_out", dtype)

    fsq = {"proj_in": _lin(sd, "tokenizer.quantizer.layers.0"
                           ".project_in", dtype),
           "proj_out": _lin(sd, "tokenizer.quantizer.layers.0"
                            ".project_out", dtype)}
    # quantizer buffers (scales / implicit codebook) are derived
    for k in list(sd):
        if k.startswith("tokenizer.quantizer."):
            sd.pop(k)

    params = {
        "dit": dit,
        "text_proj": _lin(sd, "encoder.text_projector", dtype),
        "lyric": lyric,
        "timbre": timbre,
        "tok_proj": _lin(sd, "tokenizer.audio_acoustic_proj", dtype),
        "pooler": pooler,
        "fsq": fsq,
        "detok": detok,
    }
    return params, sorted(sd.keys())


def export_ace15_state(params, cfg) -> Dict[str, np.ndarray]:
    """Inverse mapping (round-trip tests / save-quantized parity)."""
    sd: Dict[str, np.ndarray] = {}
    p_ch = cfg.patch_size

    def put_lin(name, p):
        sd[f"{name}.weight"] = np.asarray(p["w"], np.float32).T
        if "b" in p:
            sd[f"{name}.bias"] = np.asarray(p["b"], np.float32)

    def put_vec(name, v, extra_shape=None):
        a = np.asarray(v, np.float32)
        if extra_shape is not None:
            a = a.reshape(extra_shape)
        sd[name] = a

    def put_enc_layer(pre, lp):
        put_vec(f"{pre}.input_layernorm.weight", lp["in_norm"])
        put_lin(f"{pre}.self_attn.q_proj", lp["attn"]["q"])
        put_lin(f"{pre}.self_attn.k_proj", lp["attn"]["k"])
        put_lin(f"{pre}.self_attn.v_proj", lp["attn"]["v"])
        put_lin(f"{pre}.self_attn.o_proj", lp["attn"]["o"])
        put_vec(f"{pre}.self_attn.q_norm.weight", lp["attn"]["qn"])
        put_vec(f"{pre}.self_attn.k_norm.weight", lp["attn"]["kn"])
        put_vec(f"{pre}.post_attention_layernorm.weight",
                lp["post_norm"])
        put_lin(f"{pre}.mlp.gate_proj", lp["mlp"]["gate"])
        put_lin(f"{pre}.mlp.up_proj", lp["mlp"]["up"])
        put_lin(f"{pre}.mlp.down_proj", lp["mlp"]["down"])

    def put_enc_stack(pre, st, embed=True, norm=True):
        if embed:
            put_lin(f"{pre}.embed_tokens", st["embed"])
        for i, lp in enumerate(st["layers"]):
            put_enc_layer(f"{pre}.layers.{i}", lp)
        if norm:
            put_vec(f"{pre}.norm.weight", st["norm"])

    dit = params["dit"]
    w = np.asarray(dit["proj_in"]["w"], np.float32)
    d = w.shape[1]
    cin = w.shape[0] // p_ch
    sd["decoder.proj_in.1.weight"] = \
        w.reshape(p_ch, cin, d).transpose(2, 1, 0)
    sd["decoder.proj_in.1.bias"] = np.asarray(dit["proj_in"]["b"],
                                              np.float32)
    w = np.asarray(dit["proj_out"]["w"], np.float32)
    cout = w.shape[1] // p_ch
    sd["decoder.proj_out.1.weight"] = \
        w.reshape(w.shape[0], p_ch, cout).transpose(0, 2, 1)
    sd["decoder.proj_out.1.bias"] = np.asarray(
        dit["proj_out"]["b"], np.float32)[:cout]
    for tag, tp in (("decoder.time_embed", dit["time"]),
                    ("decoder.time_embed_r", dit["time_r"])):
        put_lin(f"{tag}.linear_1", tp["l1"])
        put_lin(f"{tag}.linear_2", tp["l2"])
        put_lin(f"{tag}.time_proj", tp["proj"])
    put_lin("decoder.condition_embedder", dit["cond_embed"])
    put_vec("decoder.norm_out.weight", dit["norm_out"])
    put_vec("decoder.scale_shift_table", dit["out_sst"], (1, 2, -1))
    put_vec("null_condition_emb", dit["null_cond"])
    import jax as _jax
    n = dit["layers"]["sst"].shape[0]
    for i in range(n):
        lp = _jax.tree.map(lambda a: a[i], dit["layers"])
        b = f"decoder.layers.{i}"
        put_vec(f"{b}.self_attn_norm.weight", lp["sa_norm"])
        for sub, tag in (("sa", "self_attn"), ("ca", "cross_attn")):
            put_lin(f"{b}.{tag}.q_proj", lp[sub]["q"])
            put_lin(f"{b}.{tag}.k_proj", lp[sub]["k"])
            put_lin(f"{b}.{tag}.v_proj", lp[sub]["v"])
            put_lin(f"{b}.{tag}.o_proj", lp[sub]["o"])
            put_vec(f"{b}.{tag}.q_norm.weight", lp[sub]["qn"])
            put_vec(f"{b}.{tag}.k_norm.weight", lp[sub]["kn"])
        put_vec(f"{b}.cross_attn_norm.weight", lp["ca_norm"])
        put_vec(f"{b}.mlp_norm.weight", lp["mlp_norm"])
        put_lin(f"{b}.mlp.gate_proj", lp["mlp"]["gate"])
        put_lin(f"{b}.mlp.up_proj", lp["mlp"]["up"])
        put_lin(f"{b}.mlp.down_proj", lp["mlp"]["down"])
        put_vec(f"{b}.scale_shift_table", lp["sst"], (1, 6, -1))

    put_lin("encoder.text_projector", params["text_proj"])
    put_enc_stack("encoder.lyric_encoder", params["lyric"])
    put_enc_stack("encoder.timbre_encoder", params["timbre"])
    if "special" in params["timbre"]:
        put_vec("encoder.timbre_encoder.special_token",
                params["timbre"]["special"], (1, 1, -1))
    put_lin("tokenizer.audio_acoustic_proj", params["tok_proj"])
    put_enc_stack("tokenizer.attention_pooler", params["pooler"])
    put_vec("tokenizer.attention_pooler.special_token",
            params["pooler"]["special"], (1, 1, -1))
    put_enc_stack("detokenizer", params["detok"])
    sd["detokenizer.special_tokens"] = np.asarray(
        params["detok"]["special"], np.float32)
    put_lin("detokenizer.proj_out", params["detok"]["proj_out"])
    put_lin("tokenizer.quantizer.layers.0.project_in",
            params["fsq"]["proj_in"])
    put_lin("tokenizer.quantizer.layers.0.project_out",
            params["fsq"]["proj_out"])
    return sd
