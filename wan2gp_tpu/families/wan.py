"""Wan 2.1 / 2.2 family handler.

Architecture constants per base model type (reference:
models/wan/configs/wan_t2v_1_3B.py, wan_t2v_14B.py, wan_i2v_14B.py; the 5B
ti2v_2_2 dims come from its checkpoint config — dim 3072, ffn 14336,
24 heads, 30 layers, in/out 48, VAE stride (4,16,16)).
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp

from ..models.wan.dit import WanDiTConfig, init_wan_dit
from ..models.wan.vae import WanVAEConfig, init_wan_vae
from ..models.wan.vae2_2 import Wan22VAEConfig, init_wan22_vae
from ..models.wan.t5 import T5Config, init_t5_encoder
from ..models.wan.pipeline import WanPipeline

_ARCH: Dict[str, Dict[str, Any]] = {
    "t2v_1.3B": dict(dim=1536, ffn_dim=8960, num_heads=12, num_layers=30,
                     model_type="t2v", vae_stride=(4, 8, 8)),
    "t2v": dict(dim=5120, ffn_dim=13824, num_heads=40, num_layers=40,
                model_type="t2v", vae_stride=(4, 8, 8)),
    "t2v_2_2": dict(dim=5120, ffn_dim=13824, num_heads=40, num_layers=40,
                    model_type="t2v", vae_stride=(4, 8, 8), experts=2),
    "i2v": dict(dim=5120, ffn_dim=13824, num_heads=40, num_layers=40,
                model_type="i2v", in_dim=36, vae_stride=(4, 8, 8)),
    "i2v_2_2": dict(dim=5120, ffn_dim=13824, num_heads=40, num_layers=40,
                    model_type="t2v", in_dim=36, vae_stride=(4, 8, 8),
                    experts=2),
    "ti2v_2_2": dict(dim=3072, ffn_dim=14336, num_heads=24, num_layers=30,
                     model_type="t2v", in_dim=48, out_dim=48,
                     vae_stride=(4, 16, 16)),
    "phantom_1.3B": dict(dim=1536, ffn_dim=8960, num_heads=12,
                         num_layers=30, model_type="phantom",
                         vae_stride=(4, 8, 8)),
    "phantom_14B": dict(dim=5120, ffn_dim=13824, num_heads=40,
                        num_layers=40, model_type="phantom",
                        vae_stride=(4, 8, 8)),
    "vace_1.3B": dict(dim=1536, ffn_dim=8960, num_heads=12, num_layers=30,
                      model_type="t2v", vae_stride=(4, 8, 8), vace=True),
    "vace_14B": dict(dim=5120, ffn_dim=13824, num_heads=40, num_layers=40,
                     model_type="t2v", vae_stride=(4, 8, 8), vace=True),
    # audio-driven talking heads (multitalk module, wan_handler.py:44-45)
    "multitalk": dict(dim=5120, ffn_dim=13824, num_heads=40, num_layers=40,
                      model_type="i2v", in_dim=36, vae_stride=(4, 8, 8),
                      multitalk=True),
    "infinitetalk": dict(dim=5120, ffn_dim=13824, num_heads=40,
                         num_layers=40, model_type="i2v", in_dim=36,
                         vae_stride=(4, 8, 8), multitalk=True),
    "vace_multitalk_14B": dict(dim=5120, ffn_dim=13824, num_heads=40,
                               num_layers=40, model_type="t2v",
                               vae_stride=(4, 8, 8), vace=True,
                               multitalk=True),
    "i2v_2_2_multitalk": dict(dim=5120, ffn_dim=13824, num_heads=40,
                              num_layers=40, model_type="t2v", in_dim=36,
                              vae_stride=(4, 8, 8), experts=2,
                              multitalk=True),
    # FantasyTalking audio-driven portrait i2v (fantasytalking/,
    # wan_handler.py test_class_i2v: "fantasy")
    "fantasy": dict(dim=5120, ffn_dim=13824, num_heads=40, num_layers=40,
                    model_type="i2v", in_dim=36, vae_stride=(4, 8, 8),
                    fantasy=True),
    # StandIn identity preservation (in-model LoRA + reference kv,
    # model.py:1215-1219; wan_handler.py test_standin)
    "standin": dict(dim=5120, ffn_dim=13824, num_heads=40, num_layers=40,
                    model_type="t2v", vae_stride=(4, 8, 8), standin=True),
    "vace_standin_14B": dict(dim=5120, ffn_dim=13824, num_heads=40,
                             num_layers=40, model_type="t2v",
                             vae_stride=(4, 8, 8), vace=True,
                             standin=True),
    # Wan 2.2 Animate: pose + face-motion driven character animation
    # (models/wan/animate/; model.py:1226-1241)
    "animate": dict(dim=5120, ffn_dim=13824, num_heads=40, num_layers=40,
                    model_type="i2v", in_dim=36, vae_stride=(4, 8, 8),
                    animate=True),
    # Ovi joint audio+video (ovi_fusion_engine.py; twin 5B stacks)
    "ovi": dict(dim=3072, ffn_dim=14336, num_heads=24, num_layers=30,
                model_type="t2v", in_dim=48, out_dim=48,
                vae_stride=(4, 16, 16), ovi=True),
    # SteadyDancer pose-conditioned i2v (models/wan/steadydancer/,
    # model.py:1253-1278)
    "steadydancer": dict(dim=5120, ffn_dim=13824, num_heads=40,
                         num_layers=40, model_type="i2v", in_dim=36,
                         vae_stride=(4, 8, 8), steadydancer=True),
    # Wan-Move trajectory control (models/wan/wanmove/trajectory.py)
    "wanmove": dict(dim=5120, ffn_dim=13824, num_heads=40, num_layers=40,
                    model_type="i2v", in_dim=36, vae_stride=(4, 8, 8),
                    wanmove=True),
    # ShotPlan planned hard cuts (models/wan/shotplan.py)
    "shotplan_t2v": dict(dim=5120, ffn_dim=13824, num_heads=40,
                         num_layers=40, model_type="t2v",
                         vae_stride=(4, 8, 8), shotplan=True),
    "shotplan_t2v_2_2": dict(dim=5120, ffn_dim=13824, num_heads=40,
                             num_layers=40, model_type="t2v",
                             vae_stride=(4, 8, 8), shotplan=True,
                             experts=2),
    # ChronoEdit temporal-reasoning image editing (wan_handler.py:778,
    # any2video.py:810-814 — i2v arch, 2-latent-frame fast mode)
    "chrono_edit": dict(dim=5120, ffn_dim=13824, num_heads=40,
                        num_layers=40, model_type="i2v", in_dim=36,
                        vae_stride=(4, 8, 8), chrono=True),
    # Wan-Alpha RGBA video (alpha/utils.py; dual rgb/alpha VAE decoders,
    # any2video.py:152-158)
    "alpha": dict(dim=5120, ffn_dim=13824, num_heads=40, num_layers=40,
                  model_type="t2v", vae_stride=(4, 8, 8), alpha=True),
    "alpha2": dict(dim=5120, ffn_dim=13824, num_heads=40, num_layers=40,
                   model_type="t2v", vae_stride=(4, 8, 8), alpha=True,
                   alpha2=True),
    # Lynx face-identity adapter (models/wan/lynx/; wan_handler.py
    # test_lynx — lite: 20 ip layers @2048; full: all layers @5120 + ref)
    "lynx_lite": dict(dim=5120, ffn_dim=13824, num_heads=40, num_layers=40,
                      model_type="t2v", vae_stride=(4, 8, 8), lynx="lite"),
    # Wan-Alpha with the Lynx face adapter (wan_handler.py:73-74
    # "alpha_lynx")
    "alpha_lynx": dict(dim=5120, ffn_dim=13824, num_heads=40,
                       num_layers=40, model_type="t2v",
                       vae_stride=(4, 8, 8), alpha=True, lynx="full"),
    "lynx": dict(dim=5120, ffn_dim=13824, num_heads=40, num_layers=40,
                 model_type="t2v", vae_stride=(4, 8, 8), lynx="full"),
    "vace_lynx_14B": dict(dim=5120, ffn_dim=13824, num_heads=40,
                          num_layers=40, model_type="t2v",
                          vae_stride=(4, 8, 8), vace=True, lynx="full"),
    # SkyReels diffusion forcing (models/wan/diffusion_forcing.py)
    "sky_df_1.3B": dict(dim=1536, ffn_dim=8960, num_heads=12,
                        num_layers=30, model_type="t2v",
                        vae_stride=(4, 8, 8), diffusion_forcing=True),
    "sky_df_14B": dict(dim=5120, ffn_dim=13824, num_heads=40,
                       num_layers=40, model_type="t2v",
                       vae_stride=(4, 8, 8), diffusion_forcing=True),
    # VACE on the Wan 2.2 dual-expert base (defaults/vace_14B_2_2 family)
    "vace_14B_2_2": dict(dim=5120, ffn_dim=13824, num_heads=40,
                         num_layers=40, model_type="t2v",
                         vae_stride=(4, 8, 8), vace=True, experts=2),
    # first-last-frame & inpainting i2v variants (same 36-ch cond arch)
    "flf2v_720p": dict(dim=5120, ffn_dim=13824, num_heads=40,
                       num_layers=40, model_type="i2v", in_dim=36,
                       vae_stride=(4, 8, 8)),
    "fun_inp": dict(dim=5120, ffn_dim=13824, num_heads=40, num_layers=40,
                    model_type="i2v", in_dim=36, vae_stride=(4, 8, 8)),
    "fun_inp_1.3B": dict(dim=1536, ffn_dim=8960, num_heads=12,
                         num_layers=30, model_type="i2v", in_dim=36,
                         vae_stride=(4, 8, 8)),
    # Wan2.2-5B-based video editing (lucy edit: same ti2v_2_2 arch)
    "lucy_edit": dict(dim=3072, ffn_dim=14336, num_heads=24, num_layers=30,
                      model_type="t2v", in_dim=48, out_dim=48,
                      vae_stride=(4, 16, 16)),
    # ReCamMaster camera-controlled re-rendering (models/wan/recam.py;
    # reference model.py:1196-1204, any2video.py:928-943)
    "recam_1.3B": dict(dim=1536, ffn_dim=8960, num_heads=12, num_layers=30,
                       model_type="t2v", vae_stride=(4, 8, 8), recam=True),
    # MoCha single-character replacement (models/wan/mocha.py;
    # reference any2video.py:387-412)
    "mocha": dict(dim=5120, ffn_dim=13824, num_heads=40, num_layers=40,
                  model_type="t2v", vae_stride=(4, 8, 8), mocha=True),
    # Stable Video Infinity 2 Pro — i2v 2.2 with latent-reference
    # conditioning (any2video.py:707-722; wan_handler.py:63-64)
    "i2v_2_2_svi2pro": dict(dim=5120, ffn_dim=13824, num_heads=40,
                            num_layers=40, model_type="t2v", in_dim=36,
                            vae_stride=(4, 8, 8), experts=2,
                            svi2pro=True),
    # Ditto VACE finetune with global/style/sim2real modes
    # (wan_handler.py:766-775; rides the standard VACE path)
    "vace_ditto_14B": dict(dim=5120, ffn_dim=13824, num_heads=40,
                           num_layers=40, model_type="t2v",
                           vae_stride=(4, 8, 8), vace=True, ditto=True),
    # SCAIL 3D-pose-guided character animation (models/wan/scail.py;
    # reference models/wan/scail/model_scail.py, any2video.py:850-899;
    # in_dim 20 = 16 latents + 4-ch mask, pose tokens appended)
    "scail": dict(dim=5120, ffn_dim=13824, num_heads=40, num_layers=40,
                  model_type="i2v", in_dim=20, vae_stride=(4, 8, 8),
                  scail=True),
    # SCAIL-2 mask-token conditioning (models/wan/scail2.py; reference
    # models/wan/scail2/__init__.py — adds a 28-ch mask patch embed)
    "scail2_14B": dict(dim=5120, ffn_dim=13824, num_heads=40,
                       num_layers=40, model_type="i2v", in_dim=20,
                       vae_stride=(4, 8, 8), scail2=True),
    "scail2_1.3B": dict(dim=1536, ffn_dim=8960, num_heads=12,
                        num_layers=30, model_type="i2v", in_dim=20,
                        vae_stride=(4, 8, 8), scail2=True),
    # Bernini compositional multi-source editing (models/wan/bernini.py;
    # reference any2video.py:950-966, 1567-1607)
    "bernini": dict(dim=5120, ffn_dim=13824, num_heads=40, num_layers=40,
                    model_type="t2v", vae_stride=(4, 8, 8), bernini=True),
    "bernini_1.3B": dict(dim=1536, ffn_dim=8960, num_heads=12,
                         num_layers=30, model_type="t2v",
                         vae_stride=(4, 8, 8), bernini=True),
    # Vista4D camera-controllable re-rendering (models/wan/vista4d.py;
    # reference models/wan/vista4d/, model.py:1206-1208, 1661-1683)
    "vista4d": dict(dim=5120, ffn_dim=13824, num_heads=40, num_layers=40,
                    model_type="t2v", vae_stride=(4, 8, 8), vista=True),
    # Kiwi Edit instruction+reference video editing on the 5B base
    # (models/wan/kiwi.py; reference models/wan/kiwi/,
    # configs/kiwi_edit.json — MLLM context at dim 3072)
    "kiwi_edit": dict(dim=3072, ffn_dim=14336, num_heads=24,
                      num_layers=30, model_type="t2v", in_dim=48,
                      out_dim=48, vae_stride=(4, 16, 16), kiwi=True,
                      text_dim=3072),
}


def _recam_modes():
    """ReCamMaster camera-movement picker (wan_handler.py:843-858)."""
    from ..models.wan.recam import CAMERA_MODES
    return {"choices": [(v, k) for k, v in CAMERA_MODES.items()],
            "default": 1, "label": "Camera Movement Type"}


class WanFamilyHandler:
    family = "wan"

    @staticmethod
    def query_supported_types() -> List[str]:
        return list(_ARCH.keys())

    @staticmethod
    def query_family_infos():
        return {"wan": (0, "Wan2.1"), "wan2_2": (1, "Wan2.2")}

    @staticmethod
    def query_model_def(base_model_type: str,
                        model_def: Dict[str, Any]) -> Dict[str, Any]:
        arch = _ARCH[base_model_type]
        return {
            "vae_stride": arch["vae_stride"],
            "i2v_class": arch.get("model_type") == "i2v",
            "wan_5B_class": base_model_type == "ti2v_2_2",
            "vace_class": arch.get("vace", False),
            "multitalk_class": arch.get("multitalk", False),
            "fantasy_class": arch.get("fantasy", False),
            "standin_class": arch.get("standin", False),
            "lynx_class": bool(arch.get("lynx")),
            "alpha_class": arch.get("alpha", False),
            "image_outputs": arch.get("chrono", False),
            "chrono_class": arch.get("chrono", False),
            "shotplan_class": arch.get("shotplan", False),
            "wanmove_class": arch.get("wanmove", False),
            "animate_class": arch.get("animate", False),
            "steadydancer_class": arch.get("steadydancer", False),
            "ovi_class": arch.get("ovi", False),
            "audio_outputs": arch.get("ovi", False),
            "recam_class": arch.get("recam", False),
            "mocha_class": arch.get("mocha", False),
            "svi2pro_class": arch.get("svi2pro", False),
            "scail_class": arch.get("scail", False),
            "scail2_class": arch.get("scail2", False),
            "bernini_class": arch.get("bernini", False),
            "vista_class": arch.get("vista", False),
            "kiwi_class": arch.get("kiwi", False),
            "ditto_modes": ({"choices": [("Global", 0),
                                         ("Global Style", 1),
                                         ("Sim 2 Real", 2)],
                             "default": 0, "label": "Ditto Process"}
                            if arch.get("ditto") else None),
            "model_modes": _recam_modes() if arch.get("recam") else None,
            "multiple_submodels": arch.get("experts", 1) > 1,
            "sliding_window": True,
            "tea_cache": arch.get("experts", 1) == 1,
            "mag_cache": True,
        }

    @staticmethod
    def default_settings(base_model_type: str) -> Dict[str, Any]:
        return {
            "prompt": "", "negative_prompt": "",
            "resolution": "832x480", "video_length": 81,
            "num_inference_steps": 30, "guidance_scale": 5.0,
            "flow_shift": 5.0, "sample_solver": "unipc", "seed": -1,
        }

    @staticmethod
    def dit_config(base_model_type: str,
                   dtype=jnp.bfloat16) -> WanDiTConfig:
        arch = _ARCH[base_model_type]
        return WanDiTConfig(
            dim=arch["dim"], ffn_dim=arch["ffn_dim"],
            num_heads=arch["num_heads"], num_layers=arch["num_layers"],
            in_dim=arch.get("in_dim", 16), out_dim=arch.get("out_dim", 16),
            model_type=arch["model_type"], vace=arch.get("vace", False),
            text_dim=arch.get("text_dim", 4096),
            compute_dtype=dtype)

    @staticmethod
    def query_model_files(base_model_type: str,
                          model_def: Dict[str, Any]) -> List[Dict[str, Any]]:
        files = [{"role": "transformer", "urls": model_def.get("URLs", [])}]
        if model_def.get("URLs2"):
            files.append({"role": "transformer2",
                          "urls": model_def["URLs2"]})
        if _ARCH[base_model_type].get("multitalk"):
            files.append({"role": "multitalk", "urls": [
                "https://huggingface.co/DeepBeepMeep/Wan2.1/resolve/main/"
                "Wan2.1_multitalk_14B_mbf16.safetensors"]})
            files.append({"role": "wav2vec", "urls": [
                "https://huggingface.co/DeepBeepMeep/Wan2.1/resolve/main/"
                "chinese-wav2vec2-base/model.safetensors"]})
        if _ARCH[base_model_type].get("lynx"):
            lite = _ARCH[base_model_type]["lynx"] == "lite"
            base = "https://huggingface.co/DeepBeepMeep/Wan2.1/resolve/main/"
            files.append({"role": "lynx", "urls": [
                base + ("wan2.1_lynx_lite_module_14B_bf16.safetensors" if lite
                        else "wan2.1_lynx_full_module_14B_bf16.safetensors")]})
            files.append({"role": "lynx_resampler", "urls": [
                base + ("wan2.1_lynx_lite_arc_resampler.safetensors" if lite
                        else "wan2.1_lynx_full_arc_resampler.safetensors")]})
        if _ARCH[base_model_type].get("standin"):
            files.append({"role": "standin", "urls": [
                "https://huggingface.co/DeepBeepMeep/Wan2.1/resolve/main/"
                "Stand-In_wan2.1_T2V_14B_ver1.0_bf16.safetensors"]})
        if _ARCH[base_model_type].get("fantasy"):
            # hunyuan_handler-style extra roles (fantasytalking/infer.py)
            files.append({"role": "fantasy_proj", "urls": [
                "https://huggingface.co/DeepBeepMeep/Wan2.1/resolve/main/"
                "fantasy_proj_model.safetensors"]})
            files.append({"role": "wav2vec", "urls": [
                "https://huggingface.co/DeepBeepMeep/Wan2.1/resolve/main/"
                "wav2vec/model.safetensors"]})
        files.append({"role": "text_encoder", "urls": [
            "https://huggingface.co/DeepBeepMeep/Wan2.1/resolve/main/"
            "models_t5_umt5-xxl-enc-bf16.safetensors"]})
        base = "https://huggingface.co/DeepBeepMeep/Wan2.1/resolve/main/"
        if _ARCH[base_model_type].get("kiwi"):
            base22 = ("https://huggingface.co/DeepBeepMeep/Wan2.2/"
                      "resolve/main/")
            files += [
                {"role": "kiwi_mllm", "urls": [
                    base22 + "kiwi_mllm_encoder_instruct_reference/"
                    "instruct_reference_mllm_encoder_bf16.safetensors"]},
                {"role": "kiwi_source_embedder", "urls": [
                    base22 + "wan2.2_kiwi_edit_5B_instruct_reference_"
                    "source_embedder.safetensors"]},
                {"role": "kiwi_ref_embedder", "urls": [
                    base22 + "wan2.2_kiwi_edit_5B_instruct_reference_"
                    "ref_embedder.safetensors"]},
            ]
        if _ARCH[base_model_type].get("alpha"):
            # dual rgb/alpha VAEs (any2video.py:152-158)
            v2 = "_v2" if _ARCH[base_model_type].get("alpha2") else ""
            files.append({"role": "vae", "urls": [
                base + f"wan_alpha_2.1_vae_rgb_channel{v2}.safetensors"]})
            files.append({"role": "vae_alpha", "urls": [
                base + f"wan_alpha_2.1_vae_alpha_channel{v2}.safetensors"]})
            return files
        vae = ("Wan2.2_VAE.safetensors" if base_model_type == "ti2v_2_2"
               else "Wan2.1_VAE.safetensors")
        files.append({"role": "vae", "urls": [base + vae]})
        return files

    @classmethod
    def load_model(cls, base_model_type: str, model_def: Dict[str, Any],
                   checkpoints: Optional[Dict[str, str]] = None,
                   dtype=jnp.bfloat16, attn_backend: str = "auto",
                   init_random: bool = False, tokenizer=None,
                   seed: int = 0) -> WanPipeline:
        """checkpoints: {"transformer": path, "text_encoder": path,
        "vae": path, ...}.  init_random builds random weights (tests/bench)."""
        if _ARCH[base_model_type].get("ovi"):
            return cls._load_ovi(model_def, checkpoints, dtype,
                                 attn_backend, init_random, tokenizer,
                                 seed)
        from ..io.safetensors_reader import load_weights as load_safetensors
        from ..io.wan_checkpoint import (
            normalize_wan_sd, load_wan_dit_params, load_t5_params,
            load_wan_vae_params)

        dit_cfg = cls.dit_config(base_model_type, dtype)
        t5_cfg = T5Config()
        arch = _ARCH[base_model_type]
        is_22_vae = arch["vae_stride"] == (4, 16, 16)
        vae_cfg = Wan22VAEConfig() if is_22_vae else WanVAEConfig()

        multitalk_extras: Dict[str, Any] = {}
        if init_random:
            key = jax.random.key(seed)
            dit_params = init_wan_dit(key, dit_cfg, dtype)
            t5_params = None
            vae_params = (init_wan22_vae(jax.random.key(seed + 1), vae_cfg)
                          if is_22_vae
                          else init_wan_vae(jax.random.key(seed + 1),
                                            vae_cfg))
            if arch.get("multitalk"):
                from ..models.wan.multitalk import (AudioProjConfig,
                                                    init_audio_proj,
                                                    init_multitalk_audio_attn)
                dit_params["audio_attn_blocks"] = init_multitalk_audio_attn(
                    jax.random.key(seed + 2), dit_cfg, dit_cfg.num_layers,
                    dtype=dtype)
                ap_cfg = AudioProjConfig()
                multitalk_extras = {
                    "audio_proj_cfg": ap_cfg,
                    "audio_proj_params": init_audio_proj(
                        jax.random.key(seed + 3), ap_cfg)}
            if arch.get("fantasy"):
                from ..models.wan.fantasy import (init_fantasy_attn_blocks,
                                                  init_fantasy_proj)
                dit_params["fantasy_attn_blocks"] = init_fantasy_attn_blocks(
                    jax.random.key(seed + 2), dit_cfg.dim,
                    dit_cfg.num_layers, dtype=dtype, zero=False)
                multitalk_extras = {
                    "fantasy_proj_params": init_fantasy_proj(
                        jax.random.key(seed + 3))}
            if arch.get("standin"):
                from ..models.wan.standin import init_standin_loras
                dit_params["standin_loras"] = init_standin_loras(
                    jax.random.key(seed + 4), dit_cfg.dim,
                    dit_cfg.num_layers, dtype=dtype, zero_up=False)
            if arch.get("recam"):
                from ..models.wan.recam import init_recam_blocks
                dit_params["recam_blocks"] = init_recam_blocks(
                    dit_cfg.num_layers, dit_cfg.dim)
            if arch.get("scail") or arch.get("scail2"):
                # pose patch embed Conv3d(20, dim) (model.py:1244-1247)
                cin = dit_cfg.in_dim * 1 * 2 * 2
                lim = (cin + dit_cfg.dim) ** -0.5
                dit_params["pose_patch_embedding"] = {
                    "w": jax.random.uniform(
                        jax.random.key(seed + 11), (cin, dit_cfg.dim),
                        jnp.float32, -lim, lim),
                    "b": jnp.zeros((dit_cfg.dim,), jnp.float32)}
            if arch.get("vista"):
                from ..models.wan.recam import init_recam_blocks
                from ..models.wan.vista4d import init_vista_encoder
                rb = init_recam_blocks(dit_cfg.num_layers, dit_cfg.dim)
                # vista cam encoder takes 6-dim Plucker rays
                rb["cam_w"] = jnp.zeros((dit_cfg.num_layers, 6,
                                         dit_cfg.dim), jnp.float32)
                dit_params["recam_blocks"] = rb
                dit_params["vista_encoder"] = init_vista_encoder(
                    dit_cfg.dim, dit_params["patch_embedding"])
            if arch.get("kiwi"):
                from ..models.wan.kiwi import init_kiwi_embedder
                multitalk_extras = dict(
                    multitalk_extras,
                    kiwi_source_embedder=init_kiwi_embedder(
                        jax.random.key(seed + 13), dit_cfg.in_dim,
                        dit_cfg.dim),
                    kiwi_ref_embedder=init_kiwi_embedder(
                        jax.random.key(seed + 14), dit_cfg.in_dim,
                        dit_cfg.dim),
                    kiwi_mllm=None)
            if arch.get("scail2"):
                # 28-ch mask patch embed (model.py:1249-1251)
                cin = 28 * 1 * 2 * 2
                lim = (cin + dit_cfg.dim) ** -0.5
                dit_params["mask_patch_embedding"] = {
                    "w": jax.random.uniform(
                        jax.random.key(seed + 12), (cin, dit_cfg.dim),
                        jnp.float32, -lim, lim),
                    "b": jnp.zeros((dit_cfg.dim,), jnp.float32)}
            if arch.get("steadydancer"):
                from ..models.wan.steadydancer import \
                    init_steadydancer_modules
                dit_params.update(init_steadydancer_modules(
                    jax.random.key(seed + 10), dit_cfg.dim,
                    in_dim=dit_cfg.in_dim))
            if arch.get("animate"):
                from ..models.wan.animate import (
                    FaceEncoderConfig, init_face_adapter,
                    init_face_encoder, init_motion_encoder,
                    stack_face_adapter)
                k = jax.random.split(jax.random.key(seed + 9), 4)
                pe_lim = (16 * 4 + dit_cfg.dim) ** -0.5
                dit_params["pose_patch_embedding"] = {
                    "w": jax.random.uniform(
                        k[0], (16 * 4, dit_cfg.dim), jnp.float32,
                        -pe_lim, pe_lim),
                    "b": jnp.zeros((dit_cfg.dim,), jnp.float32)}
                dit_params["motion_encoder"] = init_motion_encoder(k[1])
                dit_params["face_encoder"] = init_face_encoder(
                    k[2], FaceEncoderConfig(hidden_dim=dit_cfg.dim))
                dit_params["face_adapter"] = stack_face_adapter(
                    init_face_adapter(k[3], dit_cfg.dim,
                                      dit_cfg.num_heads,
                                      dit_cfg.num_layers // 5),
                    dit_cfg.num_layers)
            if arch.get("shotplan"):
                dit_params["hardcut_embedding"] = jax.random.normal(
                    jax.random.key(seed + 8),
                    (1, 1, dit_cfg.dim), jnp.float32) * 0.02
            if arch.get("alpha"):
                multitalk_extras = dict(
                    multitalk_extras,
                    vae_params_alpha=(init_wan22_vae(
                        jax.random.key(seed + 7), vae_cfg) if is_22_vae
                        else init_wan_vae(jax.random.key(seed + 7),
                                          vae_cfg)))
            if arch.get("lynx"):
                from ..models.wan.lynx import (ResamplerConfig,
                                               init_lynx_layers,
                                               init_resampler)
                full = arch["lynx"] == "full"
                dit_params["lynx_blocks"] = init_lynx_layers(
                    jax.random.key(seed + 5), dit_cfg.dim,
                    dit_cfg.num_layers, full, dtype=dtype)
                rcfg = ResamplerConfig(
                    output_dim=5120 if full else 2048)
                multitalk_extras = dict(
                    multitalk_extras,
                    lynx_resampler_cfg=rcfg,
                    lynx_resampler_params=init_resampler(
                        jax.random.key(seed + 6), rcfg))
        else:
            sd = normalize_wan_sd(load_safetensors(checkpoints["transformer"]))
            animate_params = None
            if arch.get("steadydancer"):
                from ..models.wan.steadydancer import \
                    load_steadydancer_params
                sd = dict(sd)
                sd_params, _ = load_steadydancer_params(sd, dit_cfg.dim)
                for k in list(sd):
                    if k.startswith(("patch_embedding_fuse.",
                                     "patch_embedding_ref_c.",
                                     "condition_embedding_")):
                        sd.pop(k)
                animate_params = sd_params
            if arch.get("animate"):
                # animate module keys ride inside the dit checkpoint;
                # consume them before the strict leftover check
                from ..models.wan.animate import load_animate_params
                sd = dict(sd)
                animate_params, _ = load_animate_params(
                    sd, dit_cfg.dim, dit_cfg.num_layers,
                    dit_cfg.num_heads, jnp.float32)
                for k in list(sd):
                    if k.startswith(("motion_encoder.", "face_encoder.",
                                     "face_adapter.",
                                     "pose_patch_embedding.")):
                        sd.pop(k)
            scail_pe = {}
            if arch.get("scail") or arch.get("scail2"):
                # SCAIL pose/mask patch embeds ride in the dit
                # checkpoint (patch_embedding_mask is normalized to
                # mask_patch_embedding, model.py:927)
                sd = dict(sd)

                def conv_pe(name):
                    w = np.asarray(sd.pop(f"{name}.weight"), np.float32)
                    return {"w": jnp.asarray(w.reshape(w.shape[0], -1).T),
                            "b": jnp.asarray(np.asarray(
                                sd.pop(f"{name}.bias"), np.float32))}

                if "pose_patch_embedding.weight" in sd:
                    scail_pe["pose_patch_embedding"] = conv_pe(
                        "pose_patch_embedding")
                for cand in ("mask_patch_embedding",
                             "patch_embedding_mask"):
                    if f"{cand}.weight" in sd:
                        scail_pe["mask_patch_embedding"] = conv_pe(cand)
            vista_params = None
            if arch.get("vista"):
                from ..models.wan.recam import load_recam_blocks
                from ..models.wan.vista4d import load_vista_encoder
                sd = dict(sd)
                vista_params = {
                    "recam_blocks": load_recam_blocks(
                        sd, dit_cfg.num_layers),
                    "vista_encoder": load_vista_encoder(sd)}
            recam_params = None
            if arch.get("recam"):
                # per-block cam_encoder/projector ride inside the dit
                # checkpoint (model.py:1196-1204)
                from ..models.wan.recam import load_recam_blocks
                sd = dict(sd)
                recam_params = load_recam_blocks(sd, dit_cfg.num_layers)
            dit_params, left = load_wan_dit_params(sd, dit_cfg, dtype)
            if left:
                raise ValueError(f"unconsumed transformer keys: {left[:8]}")
            if animate_params:
                dit_params.update(animate_params)
            if recam_params is not None:
                dit_params["recam_blocks"] = recam_params
            if vista_params is not None:
                dit_params.update(vista_params)
            dit_params.update(scail_pe)
            t5_params = None
            if checkpoints.get("text_encoder"):
                t5_sd = load_safetensors(checkpoints["text_encoder"])
                t5_params, _ = load_t5_params(t5_sd, t5_cfg, dtype)
            vae_params = None
            if checkpoints.get("vae"):
                vae_sd = load_safetensors(checkpoints["vae"])
                if is_22_vae:
                    from ..io.wan_checkpoint import load_wan22_vae_params
                    vae_params, _ = load_wan22_vae_params(vae_sd, vae_cfg)
                else:
                    vae_params, _ = load_wan_vae_params(vae_sd, vae_cfg)
            if arch.get("alpha") and checkpoints.get("vae_alpha"):
                va, _ = load_wan_vae_params(
                    load_safetensors(checkpoints["vae_alpha"]), vae_cfg)
                multitalk_extras = dict(multitalk_extras,
                                        vae_params_alpha=va)
            if arch.get("multitalk") and checkpoints.get("multitalk"):
                from ..models.wan.multitalk import (
                    load_multitalk_module_params, load_wav2vec2_params,
                    Wav2Vec2Config)
                ap, ap_cfg, audio_blocks, _ = load_multitalk_module_params(
                    load_safetensors(checkpoints["multitalk"]),
                    dit_cfg.num_layers, dtype)
                dit_params["audio_attn_blocks"] = audio_blocks
                multitalk_extras = {"audio_proj_cfg": ap_cfg,
                                    "audio_proj_params": ap}
                if checkpoints.get("wav2vec"):
                    w2v_cfg = Wav2Vec2Config()
                    w2v, _ = load_wav2vec2_params(
                        load_safetensors(checkpoints["wav2vec"]), w2v_cfg)
                    multitalk_extras["wav2vec"] = (w2v, w2v_cfg)
            if arch.get("standin") and checkpoints.get("standin"):
                from ..models.wan.standin import load_standin_module_params
                loras, _ = load_standin_module_params(
                    load_safetensors(checkpoints["standin"]),
                    dit_cfg.num_layers, dtype)
                dit_params["standin_loras"] = loras
            if arch.get("lynx") and checkpoints.get("lynx"):
                from ..models.wan.lynx import (ResamplerConfig,
                                               load_lynx_module_params,
                                               load_resampler_params)
                full = arch["lynx"] == "full"
                lynx_blocks, _ = load_lynx_module_params(
                    load_safetensors(checkpoints["lynx"]),
                    dit_cfg.num_layers, full, dtype)
                dit_params["lynx_blocks"] = lynx_blocks
                if checkpoints.get("lynx_resampler"):
                    rcfg = ResamplerConfig(
                        output_dim=5120 if full else 2048)
                    rp, _ = load_resampler_params(
                        load_safetensors(checkpoints["lynx_resampler"]),
                        rcfg)
                    multitalk_extras = dict(
                        multitalk_extras, lynx_resampler_cfg=rcfg,
                        lynx_resampler_params=rp)
            if arch.get("fantasy") and checkpoints.get("fantasy_proj"):
                # processor k/v weights ride inside the fantasy DiT
                # checkpoint (load_wan_dit_params fantasy_attn_blocks)
                from ..models.wan.fantasy import load_fantasy_proj_params
                from ..models.wan.multitalk import (load_wav2vec2_params,
                                                    Wav2Vec2Config)
                fp, _ = load_fantasy_proj_params(
                    load_safetensors(checkpoints["fantasy_proj"]))
                multitalk_extras = {"fantasy_proj_params": fp}
                if checkpoints.get("wav2vec"):
                    w2v_cfg = Wav2Vec2Config()
                    w2v, _ = load_wav2vec2_params(
                        load_safetensors(checkpoints["wav2vec"]), w2v_cfg)
                    multitalk_extras["wav2vec"] = (w2v, w2v_cfg)

        if arch.get("kiwi") and not init_random and checkpoints:
            from ..io.safetensors_reader import load_weights
            from ..models.wan.kiwi import (load_kiwi_embedder,
                                           load_kiwi_mllm_params,
                                           KiwiMLLMConfig,
                                           QWEN25_VL_3B_TEXT)
            if checkpoints.get("kiwi_source_embedder"):
                multitalk_extras["kiwi_source_embedder"] = \
                    load_kiwi_embedder(load_weights(
                        checkpoints["kiwi_source_embedder"]))
            if checkpoints.get("kiwi_ref_embedder"):
                multitalk_extras["kiwi_ref_embedder"] = \
                    load_kiwi_embedder(load_weights(
                        checkpoints["kiwi_ref_embedder"]))
            if checkpoints.get("kiwi_mllm"):
                kcfg = KiwiMLLMConfig()
                kp, _ = load_kiwi_mllm_params(
                    load_weights(checkpoints["kiwi_mllm"]), kcfg)
                lm = None
                if checkpoints.get("kiwi_qwen"):
                    from ..models.qwen.text_encoder import (
                        QwenLMConfig, load_qwen_lm_params)
                    lm_cfg = QwenLMConfig(**QWEN25_VL_3B_TEXT,
                                          compute_dtype=dtype)
                    lm_params, _ = load_qwen_lm_params(
                        load_weights(checkpoints["kiwi_qwen"]), lm_cfg,
                        dtype)
                    lm = (lm_params, lm_cfg)
                multitalk_extras["kiwi_mllm"] = (kp, kcfg, lm)
        pipe = WanPipeline(dit_params, dit_cfg, t5_params=t5_params,
                           t5_cfg=t5_cfg, vae_params=vae_params,
                           vae_cfg=vae_cfg, tokenizer=tokenizer,
                           vae_stride=arch["vae_stride"],
                           attn_backend=attn_backend,
                           base_model_type=base_model_type)
        for k, v in multitalk_extras.items():
            setattr(pipe, k, v)
        return pipe

    @classmethod
    def generate_video(cls, pipe, merged: Dict[str, Any], width: int,
                       height: int, frame_num: int, seed: int):
        """Per-variant generation dispatch — the Wan half of the
        reference's generate_media megafunction (wgp.py:6436), moved
        behind the family-handler protocol so the service stays a thin
        driver.  Returns a frame array [T, H, W, 3] or a dict with
        optional keys: video, audio, audio_sample_rate, fps, rgba.
        Model-def `*_class` flags mirror the reference's per-variant
        settings plumbing (models/wan/wan_handler.py)."""
        import numpy as np
        model_def = merged.get("_model_def") or {}
        # Motion-Designer contract (reference
        # plugins/motion_designer/plugin.py:307-360 _apply_trajectory):
        # custom_guide points at a saved [T, N, 2] trajectory .npy and
        # image_start carries the drawn background
        cg = merged.get("custom_guide")
        if isinstance(cg, str) and cg.endswith(".npy") \
                and merged.get("_tracks") is None:
            import os as _os
            if _os.path.exists(cg):
                merged["_tracks"] = np.load(cg)
        ims = merged.get("image_start")
        if merged.get("_image_start") is None and ims is not None:
            if isinstance(ims, (list, tuple)):
                ims = ims[0] if ims else None
            if isinstance(ims, str):
                from PIL import Image
                merged["_image_start"] = np.asarray(
                    Image.open(ims).convert("RGB"))
            elif ims is not None:
                merged["_image_start"] = np.asarray(ims)
        sampling = sampling_from_settings(merged)
        prompt = merged.get("prompt", "")
        n_prompt = merged.get("negative_prompt", "")
        ctx = merged.get("_context")
        ctx_null = merged.get("_context_null")
        fps = int(merged.get("fps", 16) or 16)

        if model_def.get("ovi_class"):
            # Ovi joint audio+video (ovi_fusion_engine.py:129-331)
            video, audio = pipe.generate(
                prompt=prompt, n_prompt=n_prompt,
                audio_n_prompt=merged.get("audio_negative_prompt", ""),
                width=width, height=height, frame_num=frame_num,
                steps=int(merged.get("num_inference_steps", 50)),
                shift=float(merged.get("flow_shift", 5.0)),
                guide_scale=float(merged.get("guidance_scale", 5.0)),
                audio_guide_scale=float(
                    merged.get("audio_guidance_scale", 4.0)),
                seed=seed, image_start=merged.get("_image_start"))
            audio_np = np.asarray(audio)
            has_wave = audio_np.ndim <= 2 and audio_np.size > 1000
            return {"video": np.asarray(video),
                    "audio": audio_np if has_wave else None,
                    "audio_sample_rate": 16000,
                    "fps": int(merged.get("fps", 24) or 24)}
        if model_def.get("steadydancer_class") \
                and merged.get("_pose_video") is not None \
                and merged.get("_image_start") is not None:
            # SteadyDancer pose-driven i2v (any2video.py:793-809)
            return {"video": pipe.generate_steadydancer(
                prompt=prompt, pose_video=merged["_pose_video"],
                source_image=merged["_image_start"],
                pose_video_null=merged.get("_pose_video_null"),
                n_prompt=n_prompt, width=width, height=height,
                frame_num=frame_num, sampling=sampling, seed=seed,
                condition_guide_scale=float(
                    merged.get("alt_guidance_scale", 2.0)),
                context=ctx, context_null=ctx_null), "fps": fps}
        if model_def.get("animate_class") and merged.get("_image_refs"):
            # Wan 2.2 Animate (any2video.py:820-847)
            return {"video": pipe.generate_animate(
                prompt=prompt,
                ref_image=np.asarray(merged["_image_refs"][0]),
                pose_video=merged.get("_pose_video"),
                face_video=merged.get("_face_video"),
                bg_video=merged.get("_bg_video"),
                n_prompt=n_prompt, width=width, height=height,
                frame_num=frame_num, sampling=sampling, seed=seed,
                context=ctx, context_null=ctx_null), "fps": fps}
        if model_def.get("wanmove_class") \
                and merged.get("_tracks") is not None \
                and merged.get("_image_start") is not None:
            # Wan-Move trajectory control (any2video.py:779-790)
            return {"video": pipe.generate_wanmove(
                prompt=prompt, tracks=np.asarray(merged["_tracks"]),
                image_start=merged["_image_start"], n_prompt=n_prompt,
                width=width, height=height, frame_num=frame_num,
                sampling=sampling, seed=seed,
                context=ctx, context_null=ctx_null), "fps": fps}
        if model_def.get("recam_class") \
                and merged.get("_video_guide") is not None:
            # ReCamMaster camera re-rendering (any2video.py:928-943)
            return {"video": pipe.generate_recam(
                prompt=prompt,
                source_frames=np.asarray(merged["_video_guide"]),
                camera_mode=int(merged.get("model_mode", 1) or 1),
                n_prompt=n_prompt, sampling=sampling, seed=seed,
                extrinsics_json=merged.get("_camera_extrinsics_json"),
                context=ctx, context_null=ctx_null), "fps": fps}
        if model_def.get("scail_class") \
                and merged.get("_video_guide") is not None \
                and (merged.get("_image_refs")
                     or merged.get("_image_start") is not None):
            # SCAIL pose-guided animation (any2video.py:850-899)
            ref = (merged.get("_image_refs")
                   or [merged["_image_start"]])[0]
            return {"video": pipe.generate_scail(
                prompt=prompt, ref_image=np.asarray(ref),
                pose_video=np.asarray(merged["_video_guide"]),
                n_prompt=n_prompt, sampling=sampling, seed=seed,
                context=ctx, context_null=ctx_null), "fps": fps}
        if model_def.get("scail2_class") \
                and merged.get("_video_guide") is not None \
                and merged.get("_image_refs"):
            # SCAIL-2: matted ref + color mask as the first two image
            # refs (scail2/__init__.py:726-729)
            refs = merged["_image_refs"]
            ref_mask = (np.asarray(refs[1]) if len(refs) > 1
                        else np.ones_like(np.asarray(refs[0])))
            return {"video": pipe.generate_scail2(
                prompt=prompt, ref_image=np.asarray(refs[0]),
                ref_mask=ref_mask,
                pose_video=np.asarray(merged["_video_guide"]),
                driving_mask_video=merged.get("_video_mask"),
                n_prompt=n_prompt, sampling=sampling, seed=seed,
                context=ctx, context_null=ctx_null), "fps": fps}
        if model_def.get("vista_class") \
                and merged.get("_vista_inputs") is not None:
            # Vista4D re-rendering from preprocessed scene inputs
            vi = merged["_vista_inputs"]
            return {"video": pipe.generate_vista4d(
                prompt=prompt,
                source_video=np.asarray(vi["source_video"]),
                point_cloud_video=np.asarray(vi["point_cloud_video"]),
                cam_c2w=np.asarray(vi["cam_c2w"]),
                intrinsics=np.asarray(vi["intrinsics"]),
                source_alpha_mask=vi.get("source_alpha_mask"),
                source_motion_mask=vi.get("source_motion_mask"),
                point_alpha_mask=vi.get("point_cloud_alpha_mask"),
                point_motion_mask=vi.get("point_cloud_motion_mask"),
                n_prompt=n_prompt, sampling=sampling, seed=seed,
                context=ctx, context_null=ctx_null), "fps": fps}
        if model_def.get("kiwi_class") \
                and merged.get("_video_guide") is not None:
            # Kiwi Edit (models/wan/kiwi/): MLLM context over the source
            # video (+ref), source/ref embedder conditioning
            src = np.asarray(merged["_video_guide"])
            refs = merged.get("_image_refs") or []
            ref = np.asarray(refs[0]) if refs else None
            mllm = getattr(pipe, "kiwi_mllm", None)
            if mllm is not None:
                from ..models.wan.kiwi import kiwi_mllm_encode
                kp, kcfg, lm = mllm
                lm_params, lm_cfg = lm
                kctx = kiwi_mllm_encode(lm_params, lm_cfg, kp, kcfg,
                                        pipe.tokenizer, prompt)
                kctx_null = kiwi_mllm_encode(lm_params, lm_cfg, kp, kcfg,
                                             pipe.tokenizer, n_prompt)
            else:
                kctx = ctx
                if kctx is None:
                    kctx = jnp.zeros((1, 512, pipe.dit_cfg.text_dim),
                                     jnp.float32)
                kctx_null = ctx_null
            return {"video": pipe.generate_kiwi(
                context=kctx, context_null=kctx_null, source_frames=src,
                ref_image=ref,
                source_embedder=getattr(pipe, "kiwi_source_embedder",
                                        None),
                ref_embedder=getattr(pipe, "kiwi_ref_embedder", None),
                sampling=sampling, seed=seed), "fps": fps}
        if model_def.get("bernini_class"):
            # Bernini multi-source compositional editing
            return {"video": pipe.generate_bernini(
                prompt=prompt, control_video=merged.get("_video_guide"),
                ref_images=[np.asarray(r) for r in
                            (merged.get("_image_refs") or [])],
                n_prompt=n_prompt, width=width, height=height,
                frame_num=frame_num,
                omega_v=float(merged.get("control_net_weight", 1.0)
                              or 1.0),
                omega_i=float(merged.get("audio_guidance_scale",
                                         merged.get("guidance2_scale",
                                                    1.0)) or 1.0),
                sampling=sampling, seed=seed,
                context=ctx, context_null=ctx_null), "fps": fps}
        if model_def.get("mocha_class") \
                and merged.get("_video_guide") is not None \
                and merged.get("_image_refs"):
            # MoCha character replacement (any2video.py:387-412)
            return {"video": pipe.generate_mocha(
                prompt=prompt,
                source_frames=np.asarray(merged["_video_guide"]),
                mask_frame=_mocha_mask_frame(merged),
                ref_images=[np.asarray(r)
                            for r in merged["_image_refs"][:2]],
                n_prompt=n_prompt, frame_num=frame_num,
                sampling=sampling, seed=seed,
                context=ctx, context_null=ctx_null), "fps": fps}
        if model_def.get("shotplan_class"):
            # ShotPlan relay prompts -> hard-cut planning tokens
            return {"video": pipe.generate_shotplan(
                prompt=prompt, n_prompt=n_prompt, width=width,
                height=height, frame_num=frame_num, fps=float(fps),
                sampling=sampling, seed=seed,
                context=ctx, context_null=ctx_null), "fps": fps}
        if model_def.get("alpha_class") \
                and getattr(pipe, "vae_params_alpha", None) is not None:
            # Wan-Alpha RGBA output (alpha/utils.py): PNG zip + preview
            rgba = pipe.generate_alpha(
                prompt=prompt, n_prompt=n_prompt, width=width,
                height=height, frame_num=frame_num, sampling=sampling,
                seed=seed, gauss_mask=merged.get("_gauss_mask"),
                context=ctx, context_null=ctx_null)
            return {"rgba": np.asarray(rgba), "fps": fps}
        if model_def.get("lynx_class") \
                and merged.get("_arcface_embed") is not None \
                and getattr(pipe, "lynx_resampler_params", None) \
                is not None:
            # Lynx face-identity adapter (any2video.py:1039-1069)
            refs = merged.get("_image_refs") or []
            return {"video": pipe.generate_lynx(
                prompt=prompt,
                arcface_embed=np.asarray(merged["_arcface_embed"]),
                ref_image=(np.asarray(refs[-1]) if refs else None),
                n_prompt=n_prompt, width=width, height=height,
                frame_num=frame_num, sampling=sampling, seed=seed,
                resampler_params=pipe.lynx_resampler_params,
                resampler_cfg=pipe.lynx_resampler_cfg,
                ip_scale=float(merged.get("control_net_weight", 1.0)),
                ref_scale=float(merged.get("control_net_weight", 1.0)),
                context=ctx, context_null=ctx_null), "fps": fps}
        if model_def.get("standin_class") and merged.get("_image_refs"):
            # StandIn identity preservation (any2video.py:1072-1088)
            return {"video": pipe.generate_standin(
                prompt=prompt,
                ref_image=np.asarray(merged["_image_refs"][0]),
                n_prompt=n_prompt, width=width, height=height,
                frame_num=frame_num, sampling=sampling, seed=seed,
                context=ctx, context_null=ctx_null), "fps": fps}
        if model_def.get("fantasy_class") \
                and getattr(pipe, "fantasy_proj_params", None) is not None:
            # FantasyTalking audio-driven i2v (fantasytalking/infer.py:10)
            from ..utils import media
            feats = merged.get("_audio_features")
            audio_wave = None
            if feats is None and merged.get("audio_guide") \
                    and hasattr(pipe, "wav2vec"):
                from ..models.wan.fantasy import wav2vec2_last_hidden
                wave, sr = media.read_wav(merged["audio_guide"])
                audio_wave = wave
                mono = wave.astype(np.float32).mean(axis=1) / 32767.0
                mono = (mono - mono.mean()) / (mono.std() + 1e-7)
                w2v_params, w2v_cfg = pipe.wav2vec
                feats = wav2vec2_last_hidden(w2v_params, w2v_cfg,
                                             jnp.asarray(mono[None]))
            if feats is not None:
                return {"video": pipe.generate_fantasy(
                    prompt=prompt, audio_features=feats,
                    image_start=merged.get("_image_start"),
                    n_prompt=n_prompt, width=width, height=height,
                    frame_num=frame_num, sampling=sampling, seed=seed,
                    audio_guide_scale=float(
                        merged.get("audio_guidance_scale", 5.0)),
                    fantasy_proj_params=pipe.fantasy_proj_params,
                    context=ctx, context_null=ctx_null),
                    "audio": audio_wave, "audio_sample_rate": 16000,
                    "fps": int(merged.get("fps", 23) or 23)}
        audio_emb = merged.get("_audio_emb")
        if audio_emb is None and merged.get("audio_guide") \
                and hasattr(pipe, "wav2vec"):
            # audio file -> 16 kHz mono -> wav2vec2 per-frame features
            # (multitalk.py get_embedding:47; fps 25 video-frame rate)
            from ..models.wan.multitalk import wav2vec2_extract
            from ..utils import media
            wave, sr = media.read_wav(merged["audio_guide"])
            mono = wave.astype(np.float32).mean(axis=1) / 32767.0
            mono = (mono - mono.mean()) / (mono.std() + 1e-7)
            afps = float(merged.get("fps", 25) or 25)
            n_frames = max(frame_num,
                           int(len(mono) / max(sr, 1) * afps))
            w2v_params, w2v_cfg = pipe.wav2vec
            audio_emb = wav2vec2_extract(w2v_params, w2v_cfg,
                                         jnp.asarray(mono[None]),
                                         n_frames)[0]
        if model_def.get("multitalk_class") and audio_emb is not None \
                and getattr(pipe, "audio_proj_params", None) is not None:
            from ..utils import media
            video = pipe.generate_multitalk(
                prompt=prompt, audio_emb=audio_emb, n_prompt=n_prompt,
                width=width, height=height, frame_num=frame_num,
                sampling=sampling, seed=seed,
                audio_guide_scale=float(
                    merged.get("audio_guidance_scale", 4.0)),
                audio_proj_params=pipe.audio_proj_params,
                audio_proj_cfg=pipe.audio_proj_cfg,
                context=ctx, context_null=ctx_null)
            audio_wave = merged.get("_audio_wave")
            if audio_wave is None and merged.get("audio_guide"):
                audio_wave, _ = media.read_wav(merged["audio_guide"])
            return {"video": video, "audio": audio_wave,
                    "audio_sample_rate": 16000, "fps": fps}

        window_size = int(merged.get("sliding_window_size", 0) or 0)
        source_path = merged.get("video_source")
        if source_path:
            # continue-video (wgp.py:6964): the source's tail frames
            # become the first window's overlap prefix; output = source +
            # new, seam-blended (any2video.py:1482-1491 re-noising)
            from ..utils import media
            from ..windows import stitch_windows
            src_u8 = media.read_mjpeg_avi(source_path)
            src = src_u8.astype(np.float32) / 127.5 - 1.0
            ov = int(merged.get("sliding_window_overlap", 5) or 5)
            new = pipe.generate_sliding(
                prompt=prompt, n_prompt=n_prompt,
                width=src.shape[2], height=src.shape[1],
                frame_num=frame_num,
                window_size=window_size or frame_num, overlap=ov,
                discard=int(merged.get(
                    "sliding_window_discard_last_frames", 0)),
                sampling=sampling, seed=seed,
                context=ctx, context_null=ctx_null, source_frames=src)
            return {"video": stitch_windows([src, np.asarray(new)],
                                            [0, ov]), "fps": fps}
        if window_size and frame_num > window_size:
            return {"video": pipe.generate_sliding(
                prompt=prompt, n_prompt=n_prompt, width=width,
                height=height, frame_num=frame_num,
                window_size=window_size,
                overlap=int(merged.get("sliding_window_overlap", 5)),
                discard=int(merged.get(
                    "sliding_window_discard_last_frames", 0)),
                sampling=sampling, seed=seed,
                context=ctx, context_null=ctx_null), "fps": fps}
        i2v_cond = None
        if model_def.get("svi2pro_class"):
            # SVI2Pro latent-ref conditioning (any2video.py:707-722)
            ref = (merged.get("_image_refs") or
                   [merged.get("_image_start")])[0]
            if ref is not None:
                i2v_cond = pipe.build_svi_conditioning(
                    np.asarray(ref), frame_num, height, width,
                    image_end=merged.get("_image_end"))
        return {"video": pipe.generate(
            prompt=prompt, n_prompt=n_prompt, width=width, height=height,
            frame_num=frame_num, sampling=sampling, seed=seed,
            context=ctx, context_null=ctx_null,
            image_start=merged.get("_image_start"),
            i2v_cond=i2v_cond), "fps": fps}

    @classmethod
    def _load_ovi(cls, model_def, checkpoints, dtype, attn_backend,
                  init_random, tokenizer, seed):
        """Ovi twin-stack loader (ovi_fusion_engine.py:50-127): video +
        audio Wan checkpoints with injected fusion kv projections."""
        import dataclasses as _dc
        from ..models.wan.ovi import (OVI_VIDEO, OVI_AUDIO, OviPipeline,
                                      init_ovi_fusion,
                                      load_ovi_fusion_params)
        vcfg = WanDiTConfig(**OVI_VIDEO, compute_dtype=dtype)
        acfg = _dc.replace(WanDiTConfig(**OVI_AUDIO, compute_dtype=dtype),
                           patch_size=(1, 1, 1))
        t5_cfg = T5Config()
        text_fn = vae_dec = vae_enc = None
        if init_random:
            k = jax.random.split(jax.random.key(seed), 4)
            vp = init_wan_dit(k[0], vcfg, dtype)
            ap = init_wan_dit(k[1], acfg, dtype)
            vfu = init_ovi_fusion(k[2], vcfg.num_layers, vcfg.dim, dtype)
            afu = init_ovi_fusion(k[3], acfg.num_layers, acfg.dim, dtype)
        else:
            from ..io.safetensors_reader import load_weights
            from ..io.wan_checkpoint import (normalize_wan_sd,
                                             load_wan_dit_params,
                                             load_t5_params,
                                             load_wan_vae_params)
            vsd = normalize_wan_sd(load_weights(
                checkpoints["transformer"]))
            vfu = load_ovi_fusion_params(vsd, vcfg.num_layers, dtype)
            vp, left = load_wan_dit_params(vsd, vcfg, dtype)
            if left:
                raise ValueError(f"unconsumed ovi video keys: {left[:8]}")
            asd = normalize_wan_sd(load_weights(
                checkpoints["transformer2"]))
            afu = load_ovi_fusion_params(asd, acfg.num_layers, dtype)
            ap, left = load_wan_dit_params(asd, acfg, dtype)
            if left:
                raise ValueError(f"unconsumed ovi audio keys: {left[:8]}")
            if checkpoints.get("text_encoder"):
                t5_sd = load_weights(checkpoints["text_encoder"])
                t5_params, _ = load_t5_params(t5_sd, t5_cfg, dtype)
                from ..models.wan.t5 import t5_encode

                def text_fn(prompts, max_len=512):
                    tok = tokenizer
                    if tok is None:
                        import numpy as _np
                        raws = [(p.encode()[:max_len] or b"\x00")
                                for p in prompts]
                        n = max(len(r) for r in raws)
                        ids = _np.zeros((len(raws), n), _np.int32)
                        mask = _np.zeros((len(raws), n), _np.int32)
                        for i, r in enumerate(raws):
                            ids[i, :len(r)] = _np.frombuffer(r, _np.uint8)
                            mask[i, :len(r)] = 1
                    else:
                        ids, mask = tok(prompts, max_len)
                    out = t5_encode(t5_params, t5_cfg, jnp.asarray(ids),
                                    jnp.asarray(mask))
                    return out.astype(jnp.float32)
            if checkpoints.get("vae"):
                from ..models.wan import vae2_2 as v22
                vvcfg = Wan22VAEConfig()
                vparams, _ = load_wan_vae_params(
                    load_weights(checkpoints["vae"]), vvcfg)
                vae_dec = (lambda z: jnp.clip(
                    v22.wan22_vae_decode(vparams, vvcfg, z), -1, 1))
                vae_enc = (lambda p: v22.wan22_vae_encode(
                    vparams, vvcfg, p))
        audio_dec = None
        if not init_random and checkpoints and \
                checkpoints.get("audio_vae"):
            # MMAudio TOD-VAE + BigVGAN 16k (ovi_fusion_engine.py:37-48)
            from ..io.safetensors_reader import load_weights
            from ..postprocessing.mmaudio_vae import (
                MMAudioVAEConfig, BigVGANConfig,
                load_mmaudio_vae_params, load_bigvgan_vocoder_params,
                mmaudio_latents_to_wave)
            avcfg = MMAudioVAEConfig()
            av, _ = load_mmaudio_vae_params(
                load_weights(checkpoints["audio_vae"]), avcfg)
            if checkpoints.get("vocoder"):
                bcfg = BigVGANConfig()
                bv, _ = load_bigvgan_vocoder_params(
                    load_weights(checkpoints["vocoder"]), bcfg)
                audio_dec = (lambda z: mmaudio_latents_to_wave(
                    av, bv, z, avcfg, bcfg))
        return OviPipeline(vp, ap, vfu, afu, vcfg, acfg,
                           text_encode_fn=text_fn, vae_decode_fn=vae_dec,
                           vae_encode_fn=vae_enc,
                           audio_vae_decode_fn=audio_dec,
                           attn_backend=attn_backend)


def sampling_from_settings(merged: Dict[str, Any]):
    """Map reference-format task settings onto SamplingConfig (the keys
    wgp.py's generate_media reads out of each task, wgp.py:6436)."""
    from ..models.wan.pipeline import SamplingConfig
    g = float(merged.get("guidance_scale", 5.0))
    return SamplingConfig(
        solver=merged.get("sample_solver", "unipc") or "unipc",
        solver_order=int(merged.get("solver_order", 2)),
        steps=int(merged.get("num_inference_steps", 30)),
        shift=float(merged.get("flow_shift", 5.0)),
        guide_scale=g,
        guide2_scale=float(merged.get("guidance2_scale", g)),
        guide3_scale=float(merged.get("guidance3_scale", g)),
        guide_phases=int(merged.get("guidance_phases", 1)),
        switch_threshold=float(merged.get("switch_threshold", 0)),
        switch2_threshold=float(merged.get("switch2_threshold", 0)),
        model_switch_phase=int(merged.get("model_switch_phase", 1)),
        cfg_star_switch=bool(merged.get("cfg_star_switch", False)),
        cfg_zero_step=int(merged.get("cfg_zero_step", -1)),
        apg_switch=bool(merged.get("apg_switch", False)),
        nag_scale=float(merged.get("NAG_scale", 0.0)),
        nag_tau=float(merged.get("NAG_tau", 3.5)),
        nag_alpha=float(merged.get("NAG_alpha", 0.5)),
        cache_type=str(merged.get("cache_type", "") or ""),
        cache_threshold=float(merged.get("cache_threshold", 0.0)),
        cache_speed_factor=float(merged.get("cache_speed_factor", 1.75)),
        enable_riflex=bool(merged.get("RIFLEx_setting", 0)))


def _mocha_mask_frame(merged):
    """First-frame person mask for MoCha (any2video.py:390: the mask
    video's first frame).  Defaults to all-ones when absent."""
    import numpy as np
    mask = merged.get("_video_mask")
    if mask is None:
        guide = np.asarray(merged["_video_guide"])
        return np.ones(guide.shape[1:3], np.float32)
    m = np.asarray(mask, np.float32)
    if m.ndim == 4:                      # [T, H, W, C]
        m = m[0, ..., 0]
    elif m.ndim == 3:                    # [T, H, W] mask video
        m = m[0]
    return m
