"""Ideogram 4 family handler (text-to-image, typography-focused).

Mirrors /root/reference/models/ideogram4/ideogram4_handler.py +
ideogram4_main.py model_factory: two transformer checkpoints (conditional
+ unconditional — CFG mixes the two models' velocities), a Qwen3-VL-8B
text encoder tapped at 13 hidden layers, and the Flux2 VAE (32-channel)
for decoding.  ``ideogram4_turbotime`` is the conditional-only variant.
"""
from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp

from ..models.ideogram4.dit import Ideogram4Config, init_ideogram4
from ..models.ideogram4.pipeline import Ideogram4Pipeline, PRESETS

_TYPES = ["ideogram4", "ideogram4_turbotime"]

# reference constants.py QWEN3_VL_ACTIVATION_LAYERS — outputs of decoder
# layers (0, 3, ..., 33, 35); +1 converts to HF hidden_states indexing
# used by qwen_lm_forward(collect_layers=...)
ACTIVATION_LAYERS = (0, 3, 6, 9, 12, 15, 18, 21, 24, 27, 30, 33, 35)

# Qwen/Qwen3-VL-8B-Instruct text tower
QWEN3_VL_8B = dict(vocab_size=151936, dim=4096, n_layers=36, n_heads=32,
                   n_kv_heads=8, head_dim=128, ffn_dim=12288,
                   rope_theta=5_000_000.0, qkv_bias=False, qk_norm=True)

IDEOGRAM_TEMPLATE = ("<|im_start|>user\n{}<|im_end|>\n"
                     "<|im_start|>assistant\n")


class Ideogram4FamilyHandler:
    family = "ideogram4"

    @staticmethod
    def query_supported_types() -> List[str]:
        return list(_TYPES)

    @staticmethod
    def query_family_infos():
        return {"ideogram4": (1130, "Ideogram 4")}

    # Magic Prompt (reference models/ideogram4/prompt_enhancer.py +
    # magic_prompt_system_prompts/v1.txt): rewrite the idea into the
    # structured JSON caption Ideogram 4 was trained on.  Restated in
    # our own words with the same output contract.
    MAGIC_PROMPT = (
        "You turn a short image idea into the structured JSON caption "
        "this renderer was trained on.  Output exactly one minified "
        "single-line JSON object with three keys in order: "
        "aspect_ratio (a W:H string such as 1:1 or 16:9 — pick one "
        "that suits the subject, never the word auto), "
        "high_level_description (one vivid sentence summarizing the "
        "whole image), and compositional_deconstruction (an object "
        "with a background description string and an elements array; "
        "each element describes one subject, object or piece of text "
        "with its appearance, position and styling).  Any words the "
        "user put in quotes must appear verbatim as the text field of "
        "a text element.  Keep non-ASCII characters as-is.  Output "
        "only the JSON object — no markdown, labels or commentary.")

    @classmethod
    def query_model_def(cls, base_model_type, model_def):
        return {"image_outputs": True, "group": "ideogram4",
                "text_prompt_enhancer_instructions": cls.MAGIC_PROMPT,
                "prompt_enhancer_button_label": "Magic Prompt"}

    @staticmethod
    def default_settings(base_model_type: str) -> Dict[str, Any]:
        turbo = base_model_type == "ideogram4_turbotime"
        return {"prompt": "", "resolution": "1024x1024",
                "num_inference_steps": 12 if turbo else 20,
                "guidance_scale": 7.0, "sample_solver": "euler",
                "model_mode": "V4_TURBO_12" if turbo else "V4_DEFAULT_20",
                "seed": -1, "batch_size": 1}

    @staticmethod
    def query_model_files(base_model_type, model_def):
        base = "https://huggingface.co/DeepBeepMeep/Ideogram4/resolve/main/"
        files = [{"role": "transformer", "urls": model_def.get("URLs", [])}]
        if base_model_type != "ideogram4_turbotime":
            files.append({"role": "transformer2",
                          "urls": model_def.get("URLs2", [])})
        files += [{"role": "text_encoder", "urls": [
                      base + "Qwen3-VL-8B-Instruct_bf16.safetensors"]},
                  {"role": "vae", "urls": [
                      "https://huggingface.co/DeepBeepMeep/Flux2/resolve/"
                      "main/flux2_vae.safetensors"]}]
        return files

    @classmethod
    def load_model(cls, base_model_type, model_def, checkpoints=None,
                   dtype=jnp.bfloat16, attn_backend="auto",
                   init_random=False, tokenizer=None, seed=0):
        cfg = Ideogram4Config(compute_dtype=dtype)
        text_fn = vae_fn = params_uncond = None
        if init_random:
            params = init_ideogram4(jax.random.key(seed), cfg, dtype)

            def text_fn(prompts, _seed=seed):
                k = jax.random.key(hash((prompts[0], _seed)) & 0x7FFFFFFF)
                emb = jax.random.normal(
                    k, (1, 32, cfg.llm_features_dim), jnp.float32)
                return emb, jnp.ones((1, 32), jnp.int32)
        else:
            from ..io.safetensors_reader import load_weights
            from ..io.ideogram_checkpoint import load_ideogram4_params
            params, left = load_ideogram4_params(
                load_weights(checkpoints["transformer"]), cfg, dtype)
            if left:
                raise ValueError(f"unconsumed ideogram4 keys: {left[:8]}")
            if checkpoints.get("transformer2"):
                params_uncond, _ = load_ideogram4_params(
                    load_weights(checkpoints["transformer2"]), cfg, dtype)
            if checkpoints.get("text_encoder"):
                text_fn = cls._load_text_encoder(checkpoints, tokenizer,
                                                 dtype)
            if checkpoints.get("vae"):
                vae_fn = cls._load_vae(checkpoints)
        return Ideogram4Pipeline(params, cfg, params_uncond=params_uncond,
                                 text_encode_fn=text_fn,
                                 vae_decode_fn=vae_fn,
                                 attn_backend=attn_backend)

    @classmethod
    def _load_text_encoder(cls, checkpoints, tokenizer, dtype):
        """Qwen3-VL-8B text tower; features = the 13 tapped hidden states
        concatenated hidden-major (ideogram4_main.py:268-279: stacked as
        [B, L, hidden, taps] then flattened, so feature = h * 13 + tap)."""
        from ..io.safetensors_reader import load_weights
        from ..models.qwen.text_encoder import (
            QwenLMConfig, load_qwen_lm_params, make_qwen_text_encode_fn)
        lm_cfg = QwenLMConfig(**QWEN3_VL_8B, compute_dtype=dtype)
        lm_params, _ = load_qwen_lm_params(
            load_weights(checkpoints["text_encoder"]), lm_cfg, dtype)
        collect = [l + 1 for l in ACTIVATION_LAYERS]
        inner = make_qwen_text_encode_fn(
            lm_params, lm_cfg, tokenizer, template=IDEOGRAM_TEMPLATE,
            drop_idx=0, max_len=2048, collect_layers=collect)

        def encode(prompts):
            emb, mask = inner(prompts)          # [B, L, taps, hidden]
            b, l, n, h = emb.shape
            emb = emb.transpose(0, 1, 3, 2).reshape(b, l, h * n)
            return emb, mask
        return encode

    @staticmethod
    def _load_vae(checkpoints):
        """Flux2 VAE decoder (32-channel BFL AutoencoderKL with folded
        quant convs)."""
        from ..io.safetensors_reader import load_weights
        from ..io.ideogram_checkpoint import normalize_flux2_vae_sd
        from ..io.flux_checkpoint import load_flux_vae_params
        from ..models.flux.vae import FluxVAEConfig, flux_vae_decode
        vcfg = FluxVAEConfig(z_channels=32)
        sd, _bn = normalize_flux2_vae_sd(load_weights(checkpoints["vae"]))
        params, _ = load_flux_vae_params(sd, vcfg)

        def decode(lat):                        # [B, h, w, 32] NHWC
            img = flux_vae_decode(params, vcfg, lat)
            return jnp.clip(img[0], -1.0, 1.0)
        return decode

    @staticmethod
    def generate_image(pipe, merged: Dict[str, Any], width: int,
                       height: int, seed: int):
        mode = merged.get("model_mode")
        preset = mode if mode in PRESETS else None
        return pipe.generate(
            prompt=merged.get("prompt", ""),
            height=height, width=width,
            num_steps=int(merged.get("num_inference_steps", 20)),
            guidance_scale=float(merged.get("guidance_scale", 7.0)),
            guidance2_scale=float(merged.get("guidance2_scale", 3.0)),
            switch_threshold=int(merged.get("switch_threshold", 0)),
            guide_phases=int(merged.get("guide_phases", 1)),
            preset=preset,
            sample_solver=str(merged.get("sample_solver", "euler")),
            flow_shift=float(merged.get("flow_shift", 1.0)),
            seed=seed)
