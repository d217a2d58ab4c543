"""Hunyuan Video family handler."""
from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp

from ..models.hyvideo.dit import (make_hunyuan_config, init_hunyuan,
                                  HUNYUAN_VIDEO_CONFIGS)
from ..models.hyvideo.pipeline import HunyuanPipeline


class HunyuanFamilyHandler:
    family = "hunyuan"

    @staticmethod
    def query_supported_types() -> List[str]:
        return list(HUNYUAN_VIDEO_CONFIGS.keys())

    @staticmethod
    def query_family_infos():
        return {"hunyuan": (20, "Hunyuan Video"),
                "hunyuan_1_5": (21, "Hunyuan Video 1.5")}

    @staticmethod
    def query_model_def(base_model_type, model_def):
        hv15 = "1_5" in base_model_type
        return {"image_outputs": False,
                "group": "hunyuan_1_5" if hv15 else "hunyuan",
                "vae_stride": (4, 16, 16) if hv15 else (4, 8, 8),
                "i2v_class": "i2v" in base_model_type}

    @staticmethod
    def default_settings(base_model_type: str) -> Dict[str, Any]:
        hv15 = "1_5" in base_model_type
        return {"prompt": "", "resolution": "832x480",
                "video_length": 97, "num_inference_steps": 30,
                "guidance_scale": 6.0 if hv15 else 1.0,
                "embedded_guidance_scale": 0.0 if hv15 else 6.0,
                "flow_shift": 5.0 if hv15 else 7.0, "seed": -1}

    @staticmethod
    def query_model_files(base_model_type, model_def):
        base = "https://huggingface.co/DeepBeepMeep/HunyuanVideo/resolve/main/"
        vae_file = ("hunyuan_video_custom_VAE_fp32.safetensors"
                    if "custom" in base_model_type
                    or "avatar" in base_model_type
                    else "hunyuan_video_VAE_fp32.safetensors")
        files = [{"role": "transformer", "urls": model_def.get("URLs", [])},
                 {"role": "vae", "urls": [base + vae_file]},
                 {"role": "text_encoder", "urls": [
                     base + "llava-llama-3-8b/llava_llama3_fp16.safetensors"]},
                 {"role": "clip", "urls": [
                     base + "clip_vit_large_patch14/model.safetensors"]}]
        if "1_5" in base_model_type:
            # HV1.5 glyph byT5 (hunyuan_handler.py:215-217 Glyph-SDXL-v2)
            files.append({"role": "byt5", "urls": [
                base + "Glyph-SDXL-v2/byt5_model.safetensors"]})
        if base_model_type == "hunyuan_1_5_upsampler":
            files.append({"role": "sr_upsampler", "urls": [
                base + "hunyuan_video_1.5_upsampler_720p_sr_distilled"
                ".safetensors"]})
        return files

    @classmethod
    def load_model(cls, base_model_type: str, model_def: Dict[str, Any],
                   checkpoints: Optional[Dict[str, str]] = None,
                   dtype=jnp.bfloat16, attn_backend: str = "auto",
                   init_random: bool = False, tokenizer=None,
                   seed: int = 0) -> HunyuanPipeline:
        cfg = make_hunyuan_config(base_model_type, compute_dtype=dtype)
        vae_fn = None
        text_fn = None
        byt5_fn = None
        sr_extras = {}
        if init_random:
            params = init_hunyuan(jax.random.key(seed), cfg, dtype)
        else:
            from ..io.safetensors_reader import load_weights
            from ..io.hyvideo_dit_checkpoint import load_hunyuan_dit_params
            params, left = load_hunyuan_dit_params(
                load_weights(checkpoints["transformer"]), cfg, dtype)
            if left:
                raise ValueError(f"unconsumed hunyuan keys: {left[:8]}")
            if checkpoints.get("text_encoder"):
                text_fn = cls._load_text_encoder(
                    base_model_type, checkpoints, tokenizer, dtype)
            if checkpoints.get("byt5") and params.get("byt5_in") is not None:
                byt5_fn = cls._load_byt5(checkpoints, dtype)
            if checkpoints.get("sr_upsampler"):
                from ..models.hyvideo.upsampler import (SR720Config,
                                                        load_sr720_params)
                scfg = SR720Config()
                sp, _ = load_sr720_params(
                    load_weights(checkpoints["sr_upsampler"]), scfg)
                sr_extras = {"sr_params": sp, "sr_cfg": scfg}
        if not init_random and checkpoints and checkpoints.get("vae"):
            if "1_5" in base_model_type:
                vae_fn = cls._load_vae15(checkpoints)
            else:
                vae_fn = cls._load_vae(checkpoints)
        vae_stride = (4, 16, 16) if "1_5" in base_model_type else (4, 8, 8)
        pipe = HunyuanPipeline(params, cfg, vae_stride=vae_stride,
                               vae_decode_fn=vae_fn,
                               text_encode_fn=text_fn,
                               byt5_encode_fn=byt5_fn,
                               attn_backend=attn_backend)
        for k, v in sr_extras.items():
            setattr(pipe, k, v)
        return pipe

    @classmethod
    def generate_video(cls, pipe, merged, width, height, frame_num, seed):
        """Service adapter (handler protocol): map reference task settings
        onto the Hunyuan sampler (hunyuan_handler.py defaults: HV1
        distilled embedded guidance, HV1.5 true CFG)."""
        import numpy as np
        from ..models.hyvideo.pipeline import HunyuanSamplingConfig
        sampling = HunyuanSamplingConfig(
            steps=int(merged.get("num_inference_steps", 30)),
            shift=float(merged.get("flow_shift", 7.0)),
            guide_scale=float(merged.get("guidance_scale", 1.0)),
            embedded_guidance=float(
                merged.get("embedded_guidance_scale", 6.0)),
            cfg_star_switch=bool(merged.get("cfg_star_switch", False)))
        kw = {}
        ts = merged.get("_text_states")
        if ts is None and pipe.text_encode_fn is None:
            # synthetic runs (no text encoder attached): zero states
            import jax.numpy as jnp
            cfg = pipe.dit_cfg
            ts = jnp.zeros((1, 64, cfg.text_states_dim), jnp.float32)
            kw.update(text_states=ts,
                      text_mask=jnp.ones((1, 64), jnp.int32),
                      text_pooled=jnp.zeros((1, cfg.text_states_dim_2),
                                            jnp.float32))
        elif ts is not None:
            kw.update(text_states=ts,
                      text_mask=merged.get("_text_mask"),
                      text_states_null=merged.get("_text_states_null"),
                      text_mask_null=merged.get("_text_mask_null"),
                      text_pooled=merged.get("_text_pooled"))
        out = pipe.generate(
            prompt=merged.get("prompt", ""), width=width, height=height,
            frame_num=frame_num, seed=seed, sampling=sampling, **kw)
        return {"video": np.asarray(out),
                "fps": int(merged.get("fps", 24) or 24)}

    @staticmethod
    def _load_byt5(checkpoints, dtype):
        """Glyph-SDXL-v2 byt5-small encoder for the HV1.5 glyph branch
        (text_encoder/byT5/__init__.py:67-97 — T5EncoderModel weights)."""
        import dataclasses
        from ..io.safetensors_reader import load_weights
        from ..io.wan_checkpoint import load_hf_t5_params
        from ..models.hyvideo.glyph import BYT5_SMALL, make_byt5_encode_fn
        sd = load_weights(checkpoints["byt5"])
        cfg = BYT5_SMALL
        if "shared.weight" in sd:
            # Glyph-SDXL-v2 grows the embedding table with color/font
            # special tokens (byT5/__init__.py:61 byt5_config additions)
            cfg = dataclasses.replace(
                cfg, vocab_size=sd["shared.weight"].shape[0])
        params, _ = load_hf_t5_params(sd, cfg, dtype)
        return make_byt5_encode_fn(params, cfg)

    # llava-llama-3 text tower, video chat template with the system prompt
    # cropped off (constants.py:99-102: crop_start 95)
    HV_TEMPLATE = (
        "<|start_header_id|>system<|end_header_id|>\n\nDescribe the video "
        "by detailing the following aspects: "
        "1. The main content and theme of the video."
        "2. The color, shape, size, texture, quantity, text, and spatial "
        "relationships of the objects."
        "3. Actions, events, behaviors temporal relationships, physical "
        "movement changes of the objects."
        "4. background environment, light, style and atmosphere."
        "5. camera angles, movements, and transitions used in the video:"
        "<|eot_id|><|start_header_id|>user<|end_header_id|>\n\n{}<|eot_id|>")
    HV_CROP_START = 95

    @classmethod
    def _load_text_encoder(cls, base_model_type, checkpoints, tokenizer,
                           dtype):
        from ..io.safetensors_reader import load_weights
        from ..models.qwen.text_encoder import (
            QwenLMConfig, load_qwen_lm_params, make_qwen_text_encode_fn,
            LLAMA3_8B)
        from ..utils.tokenizer import load_tokenizer
        lm_cfg = QwenLMConfig(**LLAMA3_8B, compute_dtype=dtype)
        lm_params, _ = load_qwen_lm_params(
            load_weights(checkpoints["text_encoder"]), lm_cfg, dtype)
        tok = tokenizer or load_tokenizer(checkpoints.get("tokenizer"))
        llm_enc = make_qwen_text_encode_fn(
            lm_params, lm_cfg, tok, template=cls.HV_TEMPLATE,
            drop_idx=cls.HV_CROP_START, max_len=256)
        clip_fn = None
        if checkpoints.get("clip"):
            from ..io.flux_checkpoint import load_clip_text_params
            from ..models.flux.clip import ClipTextConfig, clip_text_encode
            ccfg = ClipTextConfig()
            cparams, _ = load_clip_text_params(
                load_weights(checkpoints["clip"]), ccfg)
            ctok = load_tokenizer(checkpoints.get("tokenizer_clip"))

            def clip_fn(prompts):
                ids, _ = ctok(prompts, ccfg.max_len)
                _, pooled = clip_text_encode(cparams, ccfg,
                                             jnp.asarray(ids))
                return pooled.astype(jnp.float32)

        def enc(prompts):
            states, mask = llm_enc(prompts)
            pooled = (clip_fn(prompts) if clip_fn is not None
                      else jnp.zeros((len(prompts), 768), jnp.float32))
            return states, mask, pooled
        return enc

    @staticmethod
    def _load_vae15(checkpoints):
        """HV1.5 AutoencoderKLConv3D (models/hyvideo/vae15.py)."""
        from ..io.safetensors_reader import load_weights
        from ..models.hyvideo.vae15 import (Hunyuan15VAEConfig,
                                            load_hunyuan15_vae_params,
                                            hunyuan15_vae_decode)
        cfg = Hunyuan15VAEConfig()
        params, _ = load_hunyuan15_vae_params(
            load_weights(checkpoints["vae"]), cfg)

        def decode(z):
            return jnp.clip(hunyuan15_vae_decode(params, cfg, z),
                            -1.0, 1.0)
        return decode

    @staticmethod
    def _load_vae(checkpoints):
        """Hunyuan 884-16c causal VAE (models/hyvideo/vae.py)."""
        from ..io.safetensors_reader import load_weights
        from ..io.hyvideo_checkpoint import load_hunyuan_vae_params
        from ..models.hyvideo.vae import (HunyuanVAEConfig,
                                          hunyuan_vae_decode)
        cfg = HunyuanVAEConfig()
        params, _ = load_hunyuan_vae_params(
            load_weights(checkpoints["vae"]), cfg)

        def decode(z):
            return jnp.clip(hunyuan_vae_decode(params, cfg, z), -1.0, 1.0)
        return decode
