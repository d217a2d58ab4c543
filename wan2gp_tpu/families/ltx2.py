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
    # JoyAI-Echo: 22B distilled AV with multi-window memory bank
    # (models/ltx2/joyai_echo.py; ltx2_handler.py:492-501)
    "joyai_echo": ("ltx2_22B", True),
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
        if base_model_type == "joyai_echo":
            # ltx2_handler.py:492-501
            out.update({
                "joyai_echo": True, "joyai_audio_memory": True,
                "joyai_memory_max_size": 7,
                "joyai_memory_num_fix_frames": 3,
                "joyai_memory_downscale_factor": 1,
                "joyai_audio_memory_window_size": 96,
                "multi_prompts_gen_type": "PW",
                "custom_settings": {
                    "joyai_control_memory_positions": ""}})
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
        base = merged.get("_model_def", {}).get("architecture") \
            or merged.get("model_type", "")
        if "joyai" in str(base) or "joyai" in str(
                merged.get("model_type", "")):
            return cls._generate_joyai_video(pipe, merged, width,
                                             height, frame_num, seed,
                                             sampling, fps)
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

    @classmethod
    def _generate_joyai_video(cls, pipe, merged, width, height,
                              frame_num, seed, sampling, fps):
        """JoyAI-Echo multi-window story loop (joyai_echo.py
        prepare_joyai_echo_context / record_joyai_echo_memory +
        ltx2.py:1202-1216, 1776-1778): one window per prompt paragraph;
        active memory slots are appended as reference latents (video
        pinned at t=0, audio appended with mask 0); /store_mem samples
        new slots from the window's result; /load_mem, /drop_mem edit
        the bank.  Windows continue via latent-prefix pinning unless
        /new_shot."""
        import numpy as np
        import dataclasses as _dc
        from ..models.ltx2.joyai_echo import (
            JoyAIEchoMemoryBank, parse_joyai_window_commands,
            duration_to_frames, parse_control_memory_positions,
            CONTROL_MEMORY_SETTING)
        model_def = merged.get("_model_def") or {}
        cs = merged.get("custom_settings") or {}
        bank = JoyAIEchoMemoryBank(
            max_size=int(model_def.get("joyai_memory_max_size", 7)),
            num_fix_frames=int(model_def.get(
                "joyai_memory_num_fix_frames", 3)),
            audio_window_size=int(model_def.get(
                "joyai_audio_memory_window_size", 96)))
        h_lat, w_lat = height // 32, width // 32
        # control-video memory pre-seed (build_control_video_memory):
        # frames at the parsed positions become video slots; without a
        # VAE encoder the pooled-RGB fallback stands in
        control = merged.get("_control_video")
        if control is not None:
            positions = parse_control_memory_positions(
                str(cs.get(CONTROL_MEMORY_SETTING, "") or ""), fps)
            frames = np.asarray(control)
            if not positions:
                positions = [(None, frames.shape[0] // 2)]
            slots, names = [], []
            for name, fidx in positions:
                fidx = min(max(0, fidx), frames.shape[0] - 1)
                slots.append(np.asarray(cls._image_to_ref_latent(
                    pipe, frames[fidx], h_lat, w_lat)))
                names.append(name)
            bank.add_artificial_memory(
                {"video": np.concatenate(slots, axis=2),
                 "audio": [], "names": names})
        # window plan: one window per paragraph (PW), blank-line split
        paragraphs = [p.strip() for p in
                      str(merged.get("prompt", "")).split("\n\n")
                      if p.strip()] or [""]
        windows = [parse_joyai_window_commands(p) for p in paragraphs]
        default_frames = max(1, frame_num // len(windows))
        overlap_default = 9
        audio_latents_ps = 25.0
        vids, auds = [], []
        prev_latent = None
        z_mel = None
        for wi, (text, opts) in enumerate(windows):
            wf = duration_to_frames(opts.get("duration", ""), fps,
                                    frame_num, default_frames)
            wf = max(9, (wf - 1) // 8 * 8 + 1)
            f_lat = (wf - 1) // 8 + 1
            if opts.get("drop_mem"):
                bank.drop(opts["drop_mem"])
            if "load_mem" in opts:
                bank.load(opts["load_mem"])
            ref_v = bank.video_latent()
            ref_a_lat = bank.audio_latent()
            paired = None
            if ref_v is not None and ref_a_lat is not None \
                    and bank.paired_audio_memory() \
                    and model_def.get("joyai_audio_memory", True):
                paired = {"num_slots": ref_v.shape[2],
                          "audio_segment_lengths":
                              bank.audio_segment_lengths()}
            ref_a_tokens = None
            if ref_a_lat is not None:
                b, z, t_a, m = ref_a_lat.shape
                ref_a_tokens = ref_a_lat.transpose(0, 2, 1, 3).reshape(
                    b, t_a, z * m)
                if ref_a_tokens.shape[2] != pipe.cfg.audio_in_channels:
                    ref_a_tokens = None          # layout mismatch guard
            ov = 0
            prefix = None
            if wi > 0 and not opts.get("new_shot") \
                    and prev_latent is not None:
                ov = min(int(opts.get("overlap") or overlap_default),
                         wf - 1)
                lat_ov = max(1, (ov - 1) // 8 + 1) if ov > 0 else 0
                if lat_ov > 0:
                    prefix = prev_latent[:, :, -lat_ov:]
            audio_tokens = max(1, int(wf / fps * audio_latents_ps))
            out = pipe.generate(
                prompt=text,
                negative_prompt=merged.get("negative_prompt", ""),
                latent_grid=(f_lat, h_lat, w_lat),
                audio_tokens=audio_tokens, seed=seed + wi * 101,
                sampling=sampling, fps=fps,
                ref_video_latent=None if ref_v is None
                else jnp.asarray(ref_v),
                ref_audio_tokens=None if ref_a_tokens is None
                else jnp.asarray(ref_a_tokens),
                prefix_latent=prefix,
                paired_memory=paired if ref_a_tokens is not None
                else None)
            vl = np.asarray(out["video_latent"])
            al = out.get("audio_latent")
            al_np = None if al is None else np.asarray(al)
            # audio latent in bank layout [1, z, T, m']
            a_mem = None
            if al_np is not None:
                t_a = al_np.shape[1]
                if z_mel is None:
                    # (z, m') split of the token channels; the audio
                    # VAE default is z=8 — any consistent factorization
                    # round-trips through the bank
                    ch = al_np.shape[2]
                    zz = 8 if ch % 8 == 0 else 1
                    z_mel = (zz, ch // zz)
                z, m = z_mel
                a_mem = al_np.reshape(1, t_a, z, m).transpose(0, 2, 1, 3)
            if opts.get("store_mem"):
                bank.add_generation(
                    vl, a_mem, store_selectors=opts["store_mem"],
                    audio_cfg=None)
            lat_trim = 0
            if ov > 0:
                lat_trim = max(1, (ov - 1) // 8 + 1)
            vids.append(vl[:, :, lat_trim:] if lat_trim else vl)
            if al_np is not None:
                a_trim = int(lat_trim * 8 / fps * audio_latents_ps)
                auds.append(al_np[:, a_trim:] if a_trim else al_np)
            prev_latent = vl
        video_latent = np.concatenate(vids, axis=2)
        result = {"video_latent": video_latent, "fps": int(fps)}
        if pipe.vae_decode is not None:
            result["video"] = np.asarray(
                pipe.vae_decode(jnp.asarray(video_latent)))
        else:
            result["video"] = video_latent
        if auds:
            al = jnp.asarray(np.concatenate(auds, axis=1))
            if pipe.audio_vae_decode is not None:
                mel = pipe.audio_vae_decode(al)
                if pipe.vocoder is not None:
                    result["audio"] = np.asarray(pipe.vocoder(mel))
                    result["audio_sample_rate"] = 16000
        result["memory_labels"] = bank.labels()
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
