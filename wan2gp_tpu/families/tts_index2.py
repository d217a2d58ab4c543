"""IndexTTS-2 family handler (reference
models/TTS/index_tts2_handler.py + index_tts2/infer_v2.py): zero-shot
voice cloning with disentangled emotion control.

Stage wiring (infer_v2.py:700-770):
  ref wav -> w2v-bert feats -> speaker conformer+perceiver cond
           -> RepCodec codes (prompt condition)
           -> CAMPPlus style + 22.05 kHz ref mel
  text (+ emotion audio / 8-vector / text-described emotion)
           -> UnifiedVoice GPT -> semantic codes + gpt latents
  codes -> vq2emb + gpt_layer(latents) -> length regulator (x1.72)
        -> seed-vc CFM DiT (style-conditioned) -> mel -> BigVGAN 22k.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..models.tts.index_tts2 import (
    IndexGPTConfig, RepCodecConfig, init_unified_voice, init_repcodec,
    repcodec_encode, repcodec_vq2emb, get_speaker_conditioning,
    get_emo_vector, emo_vector_from_weights, unified_voice_generate,
    _lin, _dense)
from ..postprocessing.seedvc import (SeedVCConfig, seedvc_mel,
                                     whisper_mel, WhisperEncConfig,
                                     init_length_regulator,
                                     length_regulate, init_seedvc_dit,
                                     cfm_convert)
from ..models.tts.s3gen import S3GenConfig, init_campplus, \
    campplus_embed
from ..postprocessing.mmaudio_vae import (BigVGANConfig,
                                          init_bigvgan_vocoder,
                                          bigvgan_vocode)

_TYPES = ["index_tts2"]

# 8 emotion axes (infer_v2 emotion vector UI order)
EMOTIONS = ["happy", "angry", "sad", "afraid", "disgusted",
            "melancholic", "surprised", "calm"]


class IndexTTS2Pipeline:
    def __init__(self, gpt_params, gpt_cfg: IndexGPTConfig,
                 codec_params, codec_cfg: RepCodecConfig, s2mel,
                 s2mel_cfg: SeedVCConfig, tokenizer=None,
                 w2v_feat_fn=None, qwen_emo_fn=None):
        self.gpt_params = gpt_params
        self.gpt_cfg = gpt_cfg
        self.codec_params = codec_params
        self.codec_cfg = codec_cfg
        self.s2mel = s2mel
        self.s2mel_cfg = s2mel_cfg
        self.tokenizer = tokenizer
        # w2v-bert 2.0 feature hook: wav 16 kHz [B, T] ->
        # [B, T/320, w2v_dim] (infer_v2.py:178-186; checkpoint-gated)
        self.w2v_feat_fn = w2v_feat_fn or self._w2v_stub
        # Qwen-emo hook: emotion text -> 8 weights
        # (qwen0.6bemo4-merge, infer_v2 qwen_emo_path)
        self.qwen_emo_fn = qwen_emo_fn or self._qwen_emo_stub
        self.sample_rate = s2mel_cfg.sample_rate

    # -- hooks -------------------------------------------------------

    def _w2v_stub(self, wav16):
        """Deterministic stand-in for w2v-bert: mel-like features
        projected to w2v_dim (keeps the path runnable without the
        checkpoint)."""
        cfg = self.gpt_cfg
        wcfg = WhisperEncConfig()
        mels = whisper_mel(jnp.asarray(wav16), wcfg)    # [B, T, 80]
        k = jax.random.key(0)
        proj = jax.random.normal(k, (mels.shape[-1], cfg.w2v_dim),
                                 jnp.float32) * 0.1
        return mels[:, ::2] @ proj                      # ~50 Hz

    @staticmethod
    def _qwen_emo_stub(text: str):
        t = (text or "").lower()
        w = np.zeros(8, np.float32)
        for i, e in enumerate(EMOTIONS):
            if e in t:
                w[i] = 1.0
        if w.sum() == 0:
            w[-1] = 1.0        # calm
        return w / w.sum()

    def _text_tokens(self, text: str, max_len: int = 256):
        cfg = self.gpt_cfg
        if self.tokenizer is not None:
            ids, _ = self.tokenizer([text], max_len)
            ids = np.asarray(ids, np.int32) % (cfg.text_vocab - 2)
            ids = ids[:, np.any(ids != 0, axis=0)]
        else:
            raw = text.encode()[:max_len] or b"\x00"
            ids = (np.frombuffer(raw, np.uint8).astype(np.int32)
                   % (cfg.text_vocab - 2))[None]
        return jnp.asarray(2 + ids)     # clear of start/stop ids

    # -- generation --------------------------------------------------

    def generate(self, text: str, ref_wav, emo_wav=None,
                 emo_text: Optional[str] = None, emo_vector=None,
                 emo_alpha: float = 1.0, use_random: bool = False,
                 max_new_tokens: int = 128, temperature: float = 0.8,
                 top_k: int = 30, diffusion_steps: int = 10,
                 cfg_rate: float = 0.7, seed: int = 0
                 ) -> Dict[str, Any]:
        gcfg, ccfg, scfg = self.gpt_cfg, self.codec_cfg, self.s2mel_cfg
        key = jax.random.PRNGKey(seed)

        ref = np.asarray(ref_wav, np.float32)
        if ref.ndim == 2:
            ref = ref.mean(axis=-1)
        ref16 = self._resample(ref, scfg.sample_rate, 16000)
        feats = self.w2v_feat_fn(ref16[None])
        spk_cond = get_speaker_conditioning(self.gpt_params, gcfg,
                                            feats)

        # emotion vector: audio > explicit vector > text > reference
        if emo_wav is not None:
            ew = np.asarray(emo_wav, np.float32)
            if ew.ndim == 2:
                ew = ew.mean(axis=-1)
            efeats = self.w2v_feat_fn(
                self._resample(ew, scfg.sample_rate, 16000)[None])
            emo_vec = get_emo_vector(self.gpt_params, gcfg, efeats)
        elif emo_vector is not None:
            emo_vec = emo_vector_from_weights(self.gpt_params, gcfg,
                                              emo_vector)
        elif emo_text:
            emo_vec = emo_vector_from_weights(
                self.gpt_params, gcfg, self.qwen_emo_fn(emo_text))
        else:
            emo_vec = get_emo_vector(self.gpt_params, gcfg, feats)
        if emo_alpha != 1.0:
            base = get_emo_vector(self.gpt_params, gcfg, feats)
            emo_vec = emo_alpha * emo_vec + (1.0 - emo_alpha) * base

        ids = self._text_tokens(text)
        key, kg = jax.random.split(key)
        codes, valid, latents = unified_voice_generate(
            self.gpt_params, gcfg, ids, spk_cond, emo_vec,
            max_new_tokens=max_new_tokens, temperature=temperature,
            top_k=top_k, key=kg if temperature > 0 else None)
        codes = np.asarray(codes)
        valid = np.asarray(valid)
        n = max(int(valid.sum()), 1)
        gen_codes = jnp.asarray(
            codes[:n] % ccfg.codebook_size, jnp.int32)[None]
        gen_lat = jnp.asarray(np.asarray(latents)[:n])[None]

        # s2mel (infer_v2.py:724-758)
        ref_codes = repcodec_encode(self.codec_params, ccfg, feats)
        ref_mel = seedvc_mel(jnp.asarray(ref)[None], scfg)
        prompt_cond = length_regulate(
            self.s2mel["regulator"], scfg,
            repcodec_vq2emb(self.codec_params, ccfg, ref_codes),
            ref_mel.shape[1])
        s_infer = repcodec_vq2emb(self.codec_params, ccfg, gen_codes)
        s_infer = s_infer + _dense(gen_lat, self.s2mel["gpt_layer"])
        tgt_len = max(4, int(n * 1.72))
        cond = length_regulate(self.s2mel["regulator"], scfg, s_infer,
                               tgt_len)
        cat_cond = jnp.concatenate([prompt_cond, cond], axis=1)

        cam_cfg = self.s2mel["_cam_cfg"]
        fb = whisper_mel(jnp.asarray(ref16)[None],
                         dataclasses.replace(WhisperEncConfig(),
                                             n_mels=cam_cfg.mel_dim))
        fb = fb - jnp.mean(fb, axis=1, keepdims=True)
        style = campplus_embed(self.s2mel["campplus"], cam_cfg, fb)

        key, kc = jax.random.split(key)
        mel = cfm_convert(self.s2mel["dit"], scfg, cat_cond, ref_mel,
                          style, diffusion_steps, cfg_rate, kc)
        wav = bigvgan_vocode(self.s2mel["vocoder"],
                             self.s2mel["_voc_cfg"], mel)
        out = np.asarray(wav)[0]
        peak = np.abs(out).max()
        if peak > 1.0:
            out = out * (0.95 / peak)
        return {"audio": out, "sample_rate": scfg.sample_rate,
                "codes": codes[:n], "n_codes": n}

    @staticmethod
    def _resample(wav, sr_from, sr_to):
        if sr_from == sr_to:
            return wav
        n = int(round(wav.shape[-1] * sr_to / sr_from))
        xi = np.linspace(0, wav.shape[-1] - 1, n)
        return np.interp(xi, np.arange(wav.shape[-1]),
                         wav).astype(np.float32)


class IndexTTS2FamilyHandler:
    family = "tts_index2"

    @staticmethod
    def query_supported_types() -> List[str]:
        return list(_TYPES)

    @staticmethod
    def query_family_infos():
        return {"tts": (24, "Audio & TTS")}

    @staticmethod
    def query_model_def(base_model_type, model_def):
        return {"audio_outputs": True, "image_outputs": False,
                "audio_only": True, "group": "tts",
                "no_negative_prompt": True,
                "any_audio_prompt": True,
                "audio_guide_label": "Voice to clone",
                "audio_guide2_label": "Emotion reference audio",
                "custom_settings": {
                    "emo_alpha": 1.0, "emo_text": "",
                    **{f"emo_{e}": 0.0 for e in EMOTIONS}},
                "duration_slider": {"label": "Max duration (seconds)",
                                    "min": 1, "max": 120,
                                    "default": 10}}

    @staticmethod
    def default_settings(base_model_type: str) -> Dict[str, Any]:
        return {"prompt": "Hello, this is IndexTTS two speaking.",
                "duration_seconds": 10, "temperature": 0.8,
                "emo_alpha": 1.0, "seed": -1}

    @staticmethod
    def query_model_files(base_model_type, model_def):
        base = "https://huggingface.co/DeepBeepMeep/TTS/resolve/main/"
        return [{"role": "transformer", "urls": model_def.get(
                    "URLs",
                    [base + "index_tts2/index_tts2_gpt_fp16"
                     ".safetensors"])},
                {"role": "semantic_codec", "urls": [
                    base + "index_tts2_semantic_codec.safetensors"]},
                {"role": "s2mel", "urls": [base + "s2mel.safetensors"]},
                {"role": "campplus", "urls": [
                    base + "campplus_cn_common.bin"]},
                {"role": "vocoder", "urls": [
                    base + "bigvgan_v2_22khz_80band_256x/"
                    "bigvgan_generator.pt"]},
                {"role": "w2v_bert", "urls": [
                    base + "w2v-bert-2.0/model_fp16.safetensors"]}]

    @classmethod
    def load_model(cls, base_model_type, model_def,
                   checkpoints: Optional[Dict[str, str]] = None,
                   dtype=jnp.bfloat16, attn_backend: str = "auto",
                   init_random: bool = False, tokenizer=None,
                   seed: int = 0) -> IndexTTS2Pipeline:
        tiny = bool(model_def.get("tiny"))
        gcfg = IndexGPTConfig.tiny() if tiny else IndexGPTConfig()
        ccfg = RepCodecConfig.tiny() if tiny else RepCodecConfig()
        # s2mel == seed-vc arch with codec-feature content
        # (configs/config.yaml s2mel)
        scfg = (dataclasses.replace(SeedVCConfig.tiny(),
                                    content_dim=ccfg.hidden)
                if tiny else
                dataclasses.replace(SeedVCConfig(),
                                    content_dim=ccfg.hidden))
        keys = jax.random.split(jax.random.key(seed), 8)
        gpt = init_unified_voice(keys[0], gcfg, jnp.float32)
        if checkpoints and checkpoints.get("transformer") \
                and not init_random:
            from ..io.safetensors_reader import load_weights
            from ..io.index_tts2_checkpoint import \
                load_unified_voice_params
            gpt, _left = load_unified_voice_params(
                load_weights(checkpoints["transformer"]), gcfg,
                base_params=gpt, dtype=jnp.float32)
        codec = init_repcodec(keys[1], ccfg, jnp.float32)

        cam_cfg = (S3GenConfig(mel_dim=80, spk_dim=scfg.style_dim,
                               cam_channels=32, cam_growth=32,
                               cam_init=128, cam_layers=(12, 24, 16),
                               cam_dilations=(1, 2, 2))
                   if scfg.style_dim >= 192 else S3GenConfig.tiny())
        voc_cfg = (BigVGANConfig(sample_rate=scfg.sample_rate,
                                 num_mels=scfg.n_mels)
                   if scfg.n_mels >= 80 else
                   BigVGANConfig(num_mels=scfg.n_mels,
                                 upsample_initial_channel=32,
                                 upsample_rates=(4, 4, 4),
                                 upsample_kernel_sizes=(8, 8, 8),
                                 resblock_kernel_sizes=(3,),
                                 resblock_dilation_sizes=((1, 3, 5),),
                                 sample_rate=scfg.sample_rate))
        s2mel = {
            "regulator": init_length_regulator(keys[2], scfg,
                                               jnp.float32),
            "dit": init_seedvc_dit(keys[3], scfg, jnp.float32),
            "campplus": init_campplus(keys[4], cam_cfg, jnp.float32),
            "vocoder": init_bigvgan_vocoder(keys[5], voc_cfg,
                                            jnp.float32),
            "gpt_layer": _lin(keys[6], gcfg.dim, ccfg.hidden,
                              jnp.float32),
            "_cam_cfg": cam_cfg, "_voc_cfg": voc_cfg,
        }
        w2v_fn = None
        if checkpoints and checkpoints.get("w2v_bert") \
                and not init_random:
            w2v_fn = cls._load_w2v_bert(checkpoints["w2v_bert"])
        return IndexTTS2Pipeline(gpt, gcfg, codec, ccfg, s2mel, scfg,
                                 tokenizer=tokenizer,
                                 w2v_feat_fn=w2v_fn)

    @staticmethod
    def _load_w2v_bert(path):
        """Real w2v-bert 2.0 tower (models/tts/w2v_bert.py,
        HF-oracle-verified) replacing the mel-projection stub."""
        from ..io.safetensors_reader import load_weights
        from ..models.tts.w2v_bert import (W2VBertConfig,
                                           load_w2v_bert_params,
                                           w2v_bert_encode,
                                           stack_fbanks)
        wcfg = W2VBertConfig()
        params, _ = load_w2v_bert_params(load_weights(path), wcfg)

        def feat_fn(wav16):
            mels = whisper_mel(jnp.asarray(wav16),
                               dataclasses.replace(WhisperEncConfig(),
                                                   n_mels=80))
            return w2v_bert_encode(params, wcfg, stack_fbanks(mels))

        return feat_fn

    @staticmethod
    def generate_audio(pipe: IndexTTS2Pipeline, merged: Dict[str, Any],
                       seed: int, **kw):
        def load(x):
            if isinstance(x, str):
                from ..utils.media import read_wav
                wav, _sr = read_wav(x)
                return wav if wav.ndim == 1 else wav.mean(axis=-1)
            return None if x is None else np.asarray(x, np.float32)

        ref = load(merged.get("audio_guide"))
        if ref is None:
            # neutral voice: half a second of silence
            ref = np.zeros(pipe.s2mel_cfg.sample_rate // 2, np.float32)
        cs = merged.get("custom_settings") or {}
        vec = [float(cs.get(f"emo_{e}",
                            merged.get(f"emo_{e}", 0.0)) or 0.0)
               for e in EMOTIONS]
        emo_vector = vec if any(v > 0 for v in vec) else None
        max_toks = max(16, int(float(merged.get("duration_seconds", 10))
                               * 25))
        return pipe.generate(
            merged.get("prompt", ""), ref,
            emo_wav=load(merged.get("audio_guide2")),
            emo_text=(cs.get("emo_text")
                      or merged.get("emo_text") or None),
            emo_vector=emo_vector,
            emo_alpha=float(cs.get("emo_alpha",
                                   merged.get("emo_alpha", 1.0))),
            max_new_tokens=min(max_toks, pipe.gpt_cfg.max_mel_tokens),
            temperature=float(merged.get("temperature", 0.8)),
            diffusion_steps=int(merged.get("num_inference_steps")
                                or 10),
            seed=seed)
