"""LongCat-Video family handler (t2v / i2v / video continuation).

Mirrors /root/reference/models/longcat/longcat_handler.py (non-avatar
core): UMT5-XXL text encoder (shared with the Wan family), the Wan 2.1
16-channel VAE with AutoencoderKLWan latents_mean/std normalization
(configs/longcat_vae.json), per-frame-timestep DiT, and the
default / enhance_hf / distill schedules.  The audio-driven Avatar
variants (wav2vec / whisper conditioning) are a later round.
"""
from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp

from ..models.longcat.dit import LongCatConfig, init_longcat
from ..models.longcat.pipeline import LongCatPipeline, LongCatSamplingConfig

_TYPES = ["longcat_video", "longcat_video_i2v", "longcat_avatar",
          "longcat_avatar_v1_5"]

# configs/longcat_vae.json latents_mean / latents_std (release stats)
LATENTS_MEAN = (-0.7571, -0.7089, -0.9113, 0.1075, -0.1745, 0.9653,
                -0.1517, 1.5508, 0.4134, -0.0715, 0.5517, -0.3632,
                -0.1922, -0.9497, 0.2503, -0.2921)
LATENTS_STD = (2.8184, 1.4541, 2.3275, 2.6558, 1.2196, 1.7708,
               2.6052, 2.0743, 3.2687, 2.1526, 2.8652, 1.5579,
               1.6382, 1.1253, 2.8251, 1.916)


class LongCatFamilyHandler:
    family = "longcat"

    @staticmethod
    def query_supported_types() -> List[str]:
        return list(_TYPES)

    @staticmethod
    def query_family_infos():
        return {"longcat": (1140, "LongCat Video")}

    @staticmethod
    def query_model_def(base_model_type, model_def):
        avatar = "avatar" in base_model_type
        out = {"group": "longcat",
               "avatar_class": avatar,
               "image_prompt_types_allowed":
                   "TSV" if base_model_type == "longcat_video_i2v"
                   or avatar else ""}
        if avatar:
            out["audio_guide_label"] = "Speaker Audio"
            if model_def.get("multi_speakers_only"):
                out["audio_guide2_label"] = "Second Speaker Audio"
        return out

    @staticmethod
    def default_settings(base_model_type: str) -> Dict[str, Any]:
        return {"prompt": "", "resolution": "832x480",
                "video_length": 93, "num_inference_steps": 50,
                "guidance_scale": 4.0, "sample_solver": "auto",
                "seed": -1, "batch_size": 1}

    @staticmethod
    def query_model_files(base_model_type, model_def):
        base = "https://huggingface.co/DeepBeepMeep/LongCat/resolve/main/"
        wan = "https://huggingface.co/DeepBeepMeep/Wan2.1/resolve/main/"
        files = [{"role": "transformer", "urls": model_def.get("URLs", [])},
                 {"role": "vae", "urls": [base + "longcat_vae.safetensors"]},
                 {"role": "text_encoder", "urls": [
                     wan + "models_t5_umt5-xxl-enc-bf16.safetensors"]}]
        if "avatar" in base_model_type:
            files.append({"role": "wav2vec", "urls": [
                wan + "chinese-wav2vec2-base/model.safetensors"]})
        return files

    @classmethod
    def load_model(cls, base_model_type, model_def, checkpoints=None,
                   dtype=jnp.bfloat16, attn_backend="auto",
                   init_random=False, tokenizer=None, seed=0):
        cfg = LongCatConfig(compute_dtype=dtype,
                            avatar="avatar" in base_model_type)
        text_fn = vae_dec = vae_enc = None
        if init_random:
            params = init_longcat(jax.random.key(seed), cfg, dtype)
            if cfg.avatar:
                from ..models.wan.multitalk import init_audio_proj
                params["audio_proj"] = init_audio_proj(
                    jax.random.key(seed + 2))

            def text_fn(prompts, _seed=seed):
                k = jax.random.key(hash((prompts[0], _seed)) & 0x7FFFFFFF)
                return (jax.random.normal(k, (1, 48, cfg.caption_dim),
                                          jnp.float32),
                        jnp.ones((1, 48), jnp.int32))
        else:
            from ..io.safetensors_reader import load_weights
            from ..io.longcat_checkpoint import load_longcat_params
            params, left = load_longcat_params(
                load_weights(checkpoints["transformer"]), cfg, dtype)
            if left:
                raise ValueError(f"unconsumed longcat keys: {left[:8]}")
            if checkpoints.get("text_encoder"):
                text_fn = cls._load_text_encoder(checkpoints, tokenizer,
                                                 dtype)
            if checkpoints.get("vae"):
                vae_dec, vae_enc = cls._load_vae(checkpoints)
        wav2vec = None
        if cfg.avatar and not init_random and checkpoints \
                and checkpoints.get("wav2vec"):
            from ..io.safetensors_reader import load_weights
            from ..models.wan.multitalk import (Wav2Vec2Config,
                                                load_wav2vec2_params)
            w2v_cfg = Wav2Vec2Config()
            w2v, _ = load_wav2vec2_params(
                load_weights(checkpoints["wav2vec"]), w2v_cfg)
            wav2vec = (w2v, w2v_cfg)
        pipe = LongCatPipeline(params, cfg, text_encode_fn=text_fn,
                               vae_decode_fn=vae_dec, vae_encode_fn=vae_enc,
                               latents_mean=LATENTS_MEAN,
                               latents_std=LATENTS_STD,
                               attn_backend=attn_backend)
        pipe.wav2vec = wav2vec
        pipe.multi_speakers_only = bool(
            model_def.get("multi_speakers_only"))
        return pipe

    @staticmethod
    def _load_text_encoder(checkpoints, tokenizer, dtype):
        """UMT5-XXL shared with the Wan family (longcat_main.py:89-104)."""
        from ..io.safetensors_reader import load_weights
        from ..io.wan_checkpoint import load_t5_params
        from ..models.wan.t5 import T5Config, t5_encode
        t5_cfg = T5Config()
        t5_params, _ = load_t5_params(
            load_weights(checkpoints["text_encoder"]), t5_cfg, dtype)

        def encode(prompts, max_len: int = 512):
            ids, mask = tokenizer(prompts, max_len)
            emb = t5_encode(t5_params, t5_cfg, jnp.asarray(ids),
                            jnp.asarray(mask))
            return emb.astype(jnp.float32), jnp.asarray(mask)
        return encode

    @staticmethod
    def _load_vae(checkpoints):
        """Wan 2.1 VAE, wan-native key layout (the reference converts the
        shipped file TO diffusers for its AutoencoderKLWan class,
        longcat_main.py:151-156; we consume it directly)."""
        from ..io.safetensors_reader import load_weights
        from ..io.wan_checkpoint import load_wan_vae_params
        from ..models.wan.vae import (WanVAEConfig, vae_decode, vae_encode)
        vcfg = WanVAEConfig()
        params, _ = load_wan_vae_params(load_weights(checkpoints["vae"]),
                                        vcfg)

        def decode(z):
            return jnp.clip(vae_decode(params, vcfg, z), -1.0, 1.0)

        def encode(pix):
            return vae_encode(params, vcfg, pix)
        return decode, encode

    @staticmethod
    def generate_video(pipe, merged: Dict[str, Any], width: int,
                       height: int, frame_num: int, seed: int, **kw):
        sampling = LongCatSamplingConfig(
            steps=int(merged.get("num_inference_steps", 50)),
            guidance=float(merged.get("guidance_scale", 4.0)),
            solver=str(merged.get("sample_solver", "auto") or "auto"),
            cfg_star=bool(merged.get("cfg_star_switch", False)),
            cfg_zero_step=int(merged.get("cfg_zero_step", -1)))
        if pipe.cfg.avatar and (merged.get("audio_guide") is not None
                                or merged.get("_audio_windows")):
            return LongCatFamilyHandler._generate_avatar_video(
                pipe, merged, width, height, frame_num, seed, sampling)
        return pipe.generate(
            prompt=merged.get("prompt", ""),
            negative_prompt=merged.get("negative_prompt", ""),
            height=height, width=width,
            frame_num=frame_num or int(merged.get("video_length", 93)),
            sampling=sampling,
            image_cond=merged.get("_image_cond"),
            video_cond=merged.get("_video_cond"),
            num_cond_frames=int(merged.get("_num_cond_frames", 0)),
            seed=seed)

    @staticmethod
    def _audio_features(pipe, audio, frame_num: int):
        """Audio guide (path or array) -> ([T_frames, blocks, 768]
        wav2vec features, waveform, sr).  Without a wav2vec checkpoint
        (random-weight runs) a deterministic per-frame energy embedding
        stands in so the avatar path stays exercisable
        (longcat_main.py:528-548 _build_audio_windows)."""
        import numpy as np
        from ..utils import media
        if isinstance(audio, str):
            wave, sr = media.read_wav(audio)
        else:
            wave, sr = np.asarray(audio), 16000
        mono = wave.astype(np.float32)
        if mono.ndim == 2:
            mono = mono.mean(axis=1)
        if mono.dtype == np.int16 or np.abs(mono).max() > 4.0:
            mono = mono / 32767.0
        if getattr(pipe, "wav2vec", None) is not None:
            from ..models.wan.multitalk import wav2vec2_extract
            w2v, w2v_cfg = pipe.wav2vec
            norm = (mono - mono.mean()) / (mono.std() + 1e-7)
            emb = np.asarray(wav2vec2_extract(
                w2v, w2v_cfg, jnp.asarray(norm[None]), frame_num)[0])
        else:
            spf = max(1, len(mono) // frame_num)
            frames = np.resize(mono, frame_num * spf).reshape(
                frame_num, spf)
            rms = np.sqrt((frames ** 2).mean(axis=1, keepdims=True))
            phase = np.linspace(0, 1, 768, dtype=np.float32)[None]
            emb = np.repeat((rms * np.cos(2 * np.pi * rms * phase))
                            [:, None], 12, axis=1)
        return emb, wave, sr

    @staticmethod
    def _generate_avatar_video(pipe, merged, width, height, frame_num,
                               seed, sampling):
        """LongCat Avatar service route (longcat_main.py:857-878):
        wav2vec windows per speaker, dual-speaker concat + region
        routing for Avatar Multi, reference image pinned."""
        import numpy as np
        from ..models.wan.multitalk import get_window_audio_embeddings
        if frame_num % 4 != 1:
            frame_num = max(frame_num // 4 * 4 + 1, 1)
        emb, wave, sr = LongCatFamilyHandler._audio_features(
            pipe, merged["audio_guide"], frame_num)
        windows = get_window_audio_embeddings(emb,
                                              clip_length=frame_num)
        windows2 = None
        second = merged.get("audio_guide2")
        if second is None and getattr(pipe, "multi_speakers_only",
                                      False):
            raise ValueError("LongCat Avatar Multi requires a second "
                             "audio guide")
        if second is not None:
            emb2, _, _ = LongCatFamilyHandler._audio_features(
                pipe, second, frame_num)
            windows2 = get_window_audio_embeddings(
                emb2, clip_length=frame_num)
        ref = merged.get("_image_start")
        if ref is None:
            refs = merged.get("_image_refs") or merged.get("image_refs")
            ref = refs[0] if refs else None
        ref_image = None
        if ref is not None and pipe.vae_encode_fn is not None:
            arr = np.asarray(ref)
            if arr.dtype == np.uint8:
                arr = arr.astype(np.float32) / 127.5 - 1.0
            ref_image = jnp.asarray(arr.transpose(2, 0, 1)[None])
        video = pipe.generate_avatar(
            prompt=merged.get("prompt", ""),
            negative_prompt=merged.get("negative_prompt", ""),
            audio_windows=windows, audio_windows2=windows2,
            audio_proj_params=pipe.params.get("audio_proj"),
            ref_image=ref_image, height=height, width=width,
            frame_num=frame_num, sampling=sampling, seed=seed,
            speakers_bboxes=merged.get("speakers_locations")
            or merged.get("speakers_bboxes"))
        return {"video": video, "audio": wave,
                "audio_sample_rate": sr,
                "fps": int(merged.get("fps", 25) or 25)}
