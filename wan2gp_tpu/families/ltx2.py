"""LTX-2 family handler (19B / 22B dev + distilled, joint audio+video).

Reference: /root/reference/models/ltx2/ltx2_handler.py (_ARCH_SPECS:66,
model-type table), configs/ltx2_19b_config.json / ltx2_22b_config.json.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp

from ..models.ltx2.dit import LTX2Config, init_ltx2_dit
from ..models.ltx2.pipeline import (LTX2Pipeline, LTX2SamplingConfig,
                                    DISTILLED_SIGMA_VALUES)

# transformer.* of configs/ltx2_{19b,22b}_config.json
_ARCH: Dict[str, Dict[str, Any]] = {
    "ltx2_19B": dict(num_layers=48, num_heads=32, head_dim=128,
                     audio_num_heads=32, audio_head_dim=64),
    "ltx2_22B": dict(num_layers=48, num_heads=32, head_dim=128,
                     audio_num_heads=32, audio_head_dim=64,
                     gated_attention=True, cross_attention_adaln=True),
}
_TYPES = {
    "ltx2_19B": ("ltx2_19B", False),
    "ltx2_distilled": ("ltx2_19B", True),
    "ltx2_22B": ("ltx2_22B", False),
    "ltx2_22B_distilled": ("ltx2_22B", True),
    # EditAnything reference V2V (models/ltx2/editanything.py): base 22B
    # weights + LoRA'd ref_attn sidecar module
    "ltx2_22B_edit_anything": ("ltx2_22B", False),
    "ltx2_22B_distilled_edit_anything": ("ltx2_22B", True),
}


class LTX2FamilyHandler:
    family = "ltx2"

    @staticmethod
    def query_supported_types() -> List[str]:
        return list(_TYPES.keys())

    @staticmethod
    def query_family_infos():
        return {"ltx2": (9, "LTX-2")}

    @staticmethod
    def query_model_def(base_model_type, model_def):
        arch, distilled = _TYPES[base_model_type]
        out = {"image_outputs": False, "group": "ltx2",
               "vae_stride": (8, 32, 32), "audio_outputs": True,
               "distilled": distilled,
               "fps": 24}
        if "edit_anything" in base_model_type:
            # reference V2V: one reference image drives ref_attn tokens
            # + appended reference latent (ltx2_handler.py:46-50)
            out["image_ref_choices"] = {
                "choices": [("Reference Image", "I")],
                "letters_filter": "I"}
            out["video_guide_outpainting"] = False
        return out

    @staticmethod
    def default_settings(base_model_type: str) -> Dict[str, Any]:
        _, distilled = _TYPES[base_model_type]
        return {"prompt": "", "resolution": "768x512",
                "video_length": 121,
                "num_inference_steps": 8 if distilled else 40,
                "guidance_scale": 1.0 if distilled else 4.0,
                "audio_guidance_scale": 1.0 if distilled else 7.0,
                "seed": -1}

    @staticmethod
    def query_model_files(base_model_type, model_def):
        base = "https://huggingface.co/DeepBeepMeep/LTX-2/resolve/main/"
        pre = "ltx-2.3-22b" if "22B" in base_model_type else "ltx-2-19b"
        files = []
        if "edit_anything" in base_model_type:
            files.append({"role": "module",
                          "urls": model_def.get("modules", [])})
        return files + [
            {"role": "transformer", "urls": model_def.get("URLs", [])},
            {"role": "video_vae", "urls": [base + f"{pre}_vae.safetensors"]},
            {"role": "audio_vae",
             "urls": [base + f"{pre}_audio_vae.safetensors"]},
            {"role": "vocoder",
             "urls": [base + f"{pre}_vocoder.safetensors"]},
            {"role": "text_encoder",
             "urls": [base + "gemma3_12b_text_bf16.safetensors"]},
            {"role": "text_projection",
             "urls": [base + f"{pre}_text_embedding_projection"
                      ".safetensors"]},
        ]

    @classmethod
    def generate_video(cls, pipe, merged, width, height, frame_num, seed):
        """Service adapter: latent grid from the (8, 32, 32) VAE stride;
        audio tokens sized to the clip duration when the model def has
        audio outputs (ltx2_handler.py AV generation)."""
        import numpy as np
        import dataclasses
        model_def = merged.get("_model_def") or {}
        fps = float(merged.get("fps", 24) or 24)
        f = (frame_num - 1) // 8 + 1
        grid = (f, height // 32, width // 32)
        audio_tokens = 0
        if model_def.get("audio_outputs") or model_def.get("ltx2_audio"):
            # audio latent rate: 16 kHz mel hop -> ~25 latents/s
            audio_tokens = max(1, int(frame_num / fps * 25))
        sampling = dataclasses.replace(
            pipe.sampling,
            guide_scale=float(merged.get("guidance_scale", 1.0)),
            audio_guide_scale=float(merged.get("audio_guidance_scale",
                                               1.0) or 1.0),
            fps=fps)
        ref_latent = None
        if "editanything" in pipe.params:
            refs = merged.get("_image_refs") or merged.get("image_refs")
            if refs:
                ref_latent = cls._image_to_ref_latent(
                    pipe, refs[0], grid[1], grid[2])
        out = pipe.generate(
            prompt=merged.get("prompt", ""),
            negative_prompt=merged.get("negative_prompt", ""),
            latent_grid=grid, audio_tokens=audio_tokens, seed=seed,
            ref_video_latent=ref_latent,
            sampling=sampling, fps=fps)
        video = out.get("video")
        if video is None:
            video = out["video_latent"]    # [B, C, F, H, W] latents
        result = {"video": np.asarray(video), "fps": int(fps)}
        if out.get("audio") is not None:
            result.update(audio=np.asarray(out["audio"]),
                          audio_sample_rate=16000)
        return result

    @staticmethod
    def _image_to_ref_latent(pipe, image, h_lat, w_lat):
        """EditAnything reference image -> [1, C, 1, h, w] latent
        (editanything.py build_editanything_reference_conditioning:
        resized to the generation size and VAE-encoded).  Without an
        attached encoder (random-weight runs) the RGB image is
        average-pooled into the latent grid and tiled across channels —
        a deterministic stand-in that keeps the ref path exercisable."""
        import numpy as np
        arr = np.asarray(image)
        if arr.dtype == np.uint8:
            arr = arr.astype(np.float32) / 127.5 - 1.0
        if arr.ndim == 2:
            arr = arr[..., None]
        if getattr(pipe, "vae_encode", None) is not None:
            return pipe.vae_encode(arr[None])
        h, w, c = arr.shape
        ys = np.linspace(0, h, h_lat + 1).astype(int)
        xs = np.linspace(0, w, w_lat + 1).astype(int)
        pooled = np.stack(
            [[arr[ys[i]:max(ys[i + 1], ys[i] + 1),
                  xs[j]:max(xs[j + 1], xs[j] + 1)].mean(axis=(0, 1))
              for j in range(w_lat)] for i in range(h_lat)])
        lat_c = pipe.cfg.in_channels
        reps = (lat_c + c - 1) // c
        lat = np.tile(pooled, (1, 1, reps))[:, :, :lat_c]
        return jnp.asarray(lat.transpose(2, 0, 1)[None, :, None],
                           jnp.float32)

    @classmethod
    def load_model(cls, base_model_type: str, model_def: Dict[str, Any],
                   checkpoints: Optional[Dict[str, str]] = None,
                   dtype=jnp.bfloat16, attn_backend: str = "auto",
                   init_random: bool = False, tokenizer=None,
                   seed: int = 0) -> LTX2Pipeline:
        arch_name, distilled = _TYPES[base_model_type]
        cfg = LTX2Config(compute_dtype=dtype, **_ARCH[arch_name])
        text_fn = None
        if init_random:
            params = init_ltx2_dit(jax.random.key(seed), cfg, dtype)
        else:
            from ..io.safetensors_reader import load_state_dict
            from ..io.ltx2_checkpoint import load_ltx2_params
            sd = load_state_dict(checkpoints["transformer"])
            params, leftover = load_ltx2_params(sd, cfg, dtype)
            core = [k for k in leftover if "transformer_blocks" in k]
            if core:
                raise ValueError(f"unmapped transformer keys: {core[:8]}")
        if "edit_anything" in base_model_type:
            from ..models.ltx2.editanything import (
                init_editanything, install_editanything,
                load_editanything_module)
            if init_random or not (checkpoints
                                   and checkpoints.get("module")):
                ea = init_editanything(
                    jax.random.key(seed + 3), cfg,
                    rank=int(model_def.get("editanything_rank", 8)))
            else:
                from ..io.safetensors_reader import load_state_dict
                ea, _ = load_editanything_module(
                    load_state_dict(checkpoints["module"]), cfg)
            params = install_editanything(
                params, ea, cfg,
                start_block=int(model_def.get(
                    "ltx2_edit_anything_ref_start_block", 12)),
                end_block=int(model_def.get(
                    "ltx2_edit_anything_ref_end_block", 35)),
                context_scale=float(model_def.get(
                    "ltx2_edit_anything_ref_context_scale", 0.01)))
        vae_decode = cls._load_video_vae(arch_name, checkpoints)
        audio_decode, vocoder = cls._load_audio_vae(checkpoints)
        if text_fn is None and checkpoints \
                and checkpoints.get("text_encoder"):
            text_fn = cls._load_text_encoder(checkpoints, tokenizer,
                                             dtype, arch_name)
        sampling = LTX2SamplingConfig(
            sigmas=DISTILLED_SIGMA_VALUES if distilled else
            tuple(__import__("numpy").linspace(1.0, 0.0, 41).tolist()),
            guide_scale=1.0 if distilled else 4.0,
            audio_guide_scale=1.0 if distilled else 7.0)
        return LTX2Pipeline(params, cfg, text_fn=text_fn,
                            vae_decode=vae_decode,
                            audio_vae_decode=audio_decode, vocoder=vocoder,
                            sampling=sampling, attn_backend=attn_backend)

    @staticmethod
    def _load_video_vae(arch_name, checkpoints):
        if not checkpoints or "video_vae" not in checkpoints:
            return None
        from ..io.safetensors_reader import load_state_dict
        from ..models.ltx2.vae import (LTX2_19B_VAE, LTX2_22B_VAE,
                                       load_ltx2_vae_params,
                                       ltx2_vae_decode)
        vcfg = LTX2_19B_VAE if arch_name == "ltx2_19B" else LTX2_22B_VAE
        sd = load_state_dict(checkpoints["video_vae"])
        vp = load_ltx2_vae_params(sd, vcfg)

        def decode(z):
            return ltx2_vae_decode(vp, vcfg, z)
        return decode

    @staticmethod
    def _load_audio_vae(checkpoints):
        if not checkpoints or "audio_vae" not in checkpoints:
            return None, None
        from ..io.safetensors_reader import load_state_dict
        from ..models.ltx2.audio_vae import (
            LTX2AudioVAEConfig, LTX2VocoderConfig, ltx2_audio_decode,
            ltx2_vocoder, load_ltx2_audio_vae_params,
            load_ltx2_vocoder_params)
        acfg = LTX2AudioVAEConfig()
        ap = load_ltx2_audio_vae_params(
            load_state_dict(checkpoints["audio_vae"]), acfg)

        def decode(z):
            return ltx2_audio_decode(ap, acfg, z)

        voc = None
        if "vocoder" in checkpoints:
            vcfg = LTX2VocoderConfig()
            vparams = load_ltx2_vocoder_params(
                load_state_dict(checkpoints["vocoder"]), vcfg)

            def voc(mel):
                return ltx2_vocoder(vparams, vcfg, mel)
        return decode, voc

    @staticmethod
    def _load_text_encoder(checkpoints, tokenizer, dtype, arch_name):
        """Gemma-3 caption stack (ltx_core/text_encoders/gemma/): all
        hidden states stacked -> per-token-RMS (22B) / batch-range (19B)
        normalization -> aggregate projection to caption_dim."""
        from ..io.safetensors_reader import load_state_dict
        from ..models.ltx2.gemma import (Gemma3Config, load_gemma3_params,
                                         gemma3_forward,
                                         extract_caption_features)
        gcfg = Gemma3Config(compute_dtype=dtype)
        gparams, _ = load_gemma3_params(
            load_state_dict(checkpoints["text_encoder"]), gcfg, dtype)
        mode = ("per_token_rms" if "22B" in arch_name or "22b" in arch_name
                else "batch_range")
        proj_sd = {}
        if checkpoints.get("text_projection"):
            proj_sd = load_state_dict(checkpoints["text_projection"])
        proj_key = next((k for k in proj_sd if "aggregate" in k
                         and k.endswith("weight")), None)
        import numpy as _np
        import jax.numpy as _jnp
        proj_w = (_jnp.asarray(_np.asarray(proj_sd[proj_key],
                                           _np.float32).T)
                  if proj_key else None)

        def encode(prompts, max_len=256):
            if tokenizer is not None:
                ids, mask = tokenizer(prompts, max_len)
            else:
                raws = [(p.encode()[:max_len] or b"\x00") for p in prompts]
                n = max(len(r) for r in raws)
                ids = _np.zeros((len(raws), n), _np.int32)
                mask = _np.zeros((len(raws), n), _np.int32)
                for i, r in enumerate(raws):
                    ids[i, :len(r)] = _np.frombuffer(r, _np.uint8)
                    mask[i, :len(r)] = 1
            _, stack = gemma3_forward(gparams, gcfg, _jnp.asarray(ids),
                                      _jnp.asarray(mask),
                                      collect_hidden=True)
            if proj_w is None:
                # no projection checkpoint: mean over layers as fallback
                return stack.mean(axis=2).astype(_jnp.float32)
            return extract_caption_features(stack, _jnp.asarray(mask),
                                            proj_w, mode=mode)
        return encode
