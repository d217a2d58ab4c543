"""GenerationService: settings dict -> media outputs.

Decomposition of the reference's 1,700-line `generate_media` megafunction
(wgp.py:6436): model resolution + pipeline cache, settings normalization,
generation dispatch per output kind, and saving with embedded metadata.
Settings keys are compatible with the reference task format (prompt,
negative_prompt, resolution "WxH", video_length, num_inference_steps,
guidance_scale, flow_shift, sample_solver, seed, model_type, ...).
"""
from __future__ import annotations

import os
import random
import time
from typing import Any, Callable, Dict, List, Optional

import numpy as np
import jax.numpy as jnp

from ..config.registry import ModelRegistry
from ..families import build_handler_map
from ..utils import media


def parse_resolution(res: str):
    w, h = res.lower().split("x")
    return int(w), int(h)


def quantize_dit_params(params, mode: str):
    """Quantize transformer-block linears on load (reference do_quantize,
    any2video.py:191-224): every stacked/plain {"w": [.., K, N]} under a
    *blocks* subtree with K, N >= 256 becomes {"w_q"|"w_q4", "scale"};
    embeddings, norms, modulation tables and small adapters stay float."""
    from ..ops.quant import quantize_params_tree
    bits = {"int8": 8, "quanto_int8": 8, "int4": 4}.get(mode)
    if bits is None:
        raise ValueError(f"unknown quantization mode {mode!r} "
                         "(use 'int8' or 'int4')")
    return quantize_params_tree(params,
                                predicate=lambda path: "blocks" in path,
                                bits=bits, min_dim=256)


def _audio_processor_hook(outputs, settings):
    """Late soundtrack step: settings 'soundtrack_method' selects an
    audio processor ('custom' needs 'soundtrack_audio_source')."""
    method = settings.get("soundtrack_method")
    if not method:
        return outputs
    from ..postprocessing.audio_processors import apply_soundtrack
    done = []
    for p in outputs:
        if p.lower().endswith(".avi"):
            try:
                apply_soundtrack(
                    p, method,
                    audio_source=settings.get("soundtrack_audio_source"),
                    prompt=settings.get("soundtrack_prompt",
                                        settings.get("prompt", "")),
                    seed=int(settings.get("seed", 0) or 0))
            except Exception as exc:
                print(f"[audio_processors] {method} failed: {exc}")
        done.append(p)
    return done


def _mocha_mask_frame(merged):
    """First-frame person mask for MoCha (any2video.py:390: the mask
    video's first frame).  Defaults to all-ones when absent."""
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


def _apply_spatial_upsampling(video, merged):
    """'lanczos1.5'/'lanczos2' resampling or 'flashvsr' one-step diffusion
    4x VSR (reference postprocessing/spatial_upsamplers.py + flashvsr/).
    video: [T, H, W, 3] float [-1,1] or uint8."""
    su = str(merged.get("spatial_upsampling", "") or "")
    if not su:
        return video
    frames = media.to_uint8(np.asarray(video))
    if su.startswith("lanczos"):
        from ..postprocessing.basic import lanczos_upscale
        scale = 1.5 if su.endswith("1.5") else 2.0
        return lanczos_upscale(frames, scale)
    if su == "flashvsr":
        pipe = merged.get("_flashvsr_pipe")
        if pipe is None:
            from ..postprocessing.flashvsr import (
                FlashVSRPipeline, init_lq_proj, init_tcdecoder,
                TCDecoderConfig)
            from ..models.wan.dit import WanDiTConfig, init_wan_dit
            import jax
            ckpts = merged.get("_flashvsr_checkpoints")
            cfg = WanDiTConfig(dim=1536, ffn_dim=8960, num_heads=12,
                               num_layers=30)
            if ckpts:
                from ..io.safetensors_reader import load_weights
                from ..io.wan_checkpoint import (normalize_wan_sd,
                                                 load_wan_dit_params)
                from ..postprocessing.flashvsr import (
                    load_lq_proj_params, load_tcdecoder_params)
                dit_params, _ = load_wan_dit_params(
                    normalize_wan_sd(load_weights(ckpts["transformer"])),
                    cfg)
                lq_params, _ = load_lq_proj_params(
                    load_weights(ckpts["lq_proj"]))
                tc_params, _ = load_tcdecoder_params(
                    load_weights(ckpts["tcdecoder"]))
            else:
                dit_params = init_wan_dit(jax.random.key(0), cfg)
                lq_params = init_lq_proj(jax.random.key(1), cfg.dim)
                tc_params = init_tcdecoder(jax.random.key(2))
            pipe = FlashVSRPipeline(dit_params, cfg, lq_params, tc_params,
                                    TCDecoderConfig())
        return pipe.upscale(frames)
    return video


def _apply_temporal_upsampling(video, merged, fps: int):
    """'rife2'/'rife4' temporal upsampling (reference
    postprocessing/rife/temporal_upsampler.py).  Uses the RIFE IFNet when
    a checkpoint is available (settings _rife_model), else falls back to
    linear blending.  video: [T, H, W, 3]."""
    tu = str(merged.get("temporal_upsampling", "") or "")
    if not tu.startswith("rife"):
        return video, fps
    exp = 2 if tu.endswith("4") else 1
    ckpt = merged.get("_rife_model")
    if ckpt:
        from ..postprocessing import rife
        params, _ = rife.load_rife_params(ckpt)
        video = rife.interpolate_video(params, np.asarray(video), exp=exp)
    else:
        from ..postprocessing.basic import temporal_interpolate
        video = temporal_interpolate(np.asarray(video), factor=2 ** exp)
    return video, fps * 2 ** exp


class GenerationService:
    def __init__(self, registry: Optional[ModelRegistry] = None,
                 output_dir: str = "outputs", attn_backend: str = "auto",
                 init_random_weights: bool = False,
                 checkpoints_resolver: Optional[Callable] = None,
                 plugins_dir: Optional[str] = None,
                 lora_root: str = "loras", mesh=None,
                 quantize: str = ""):
        self.registry = registry or ModelRegistry(build_handler_map())
        self.output_dir = output_dir
        self.lora_root = lora_root
        self.attn_backend = attn_backend
        self.init_random_weights = init_random_weights
        self.checkpoints_resolver = checkpoints_resolver
        # multi-chip: "dp=2,cp=2,tp=2" spec / axis dict / prebuilt Mesh /
        # "auto" (factor all visible devices).  Applied to every loaded
        # pipeline that supports GSPMD sharding (pipe.apply_mesh) — the
        # production replacement for the reference's mmgp offload profile
        # (wgp.py:4033); weights are sharded HBM-resident instead of paged.
        self._mesh_spec = mesh
        self._mesh = None
        # quantize-on-load: "" | "int8" | "int4" — the reference's
        # transformer_quantization/do_quantize semantics
        # (offload.fast_load_transformers_model, models/wan/any2video.py:
        # 191-224): transformer-block linears convert to int8 (w_q +
        # per-channel scale) or packed int4 (w_q4) consumed by the Pallas
        # dequant-fused matmuls; embeddings/norms stay bf16.
        self.quantize = quantize or ""
        self._pipelines: Dict[str, Any] = {}
        self._interrupt = False
        from ..plugins import PluginManager
        self.plugins = PluginManager()
        if plugins_dir:
            self.plugins.load_directory(plugins_dir)
        # built-in late audio processing (reference
        # postprocessing/audio_processors.py late_postprocessing)
        self.plugins.postprocess_hooks.append(
            ("audio_processors", _audio_processor_hook))

    # -- model management ----------------------------------------------

    @property
    def mesh(self):
        """Lazily-built jax.sharding.Mesh from the configured spec."""
        if self._mesh is None and self._mesh_spec is not None:
            from jax.sharding import Mesh
            if isinstance(self._mesh_spec, Mesh):
                self._mesh = self._mesh_spec
            else:
                from ..parallel import make_mesh, parse_mesh_spec
                sizes = (parse_mesh_spec(self._mesh_spec)
                         if isinstance(self._mesh_spec, str)
                         else dict(self._mesh_spec))
                import jax
                n = 1
                for v in sizes.values():
                    n *= v
                devices = jax.devices()[:n] if sizes else None
                self._mesh = make_mesh(sizes or None, devices=devices)
        return self._mesh

    def list_loras(self, model_type: str = "") -> Dict[str, Any]:
        """Discover LoRA files + presets for a model (wgp.py:3706)."""
        from ..config.profiles import discover_loras
        family = ""
        if model_type:
            try:
                family = self.registry.handler_for(model_type).family
            except Exception:
                family = ""
        return discover_loras(self.lora_root, model_type, family)

    def get_pipeline(self, model_type: str):
        pipe = self._pipelines.get(model_type)
        if pipe is None:
            model_def = self.registry.get(model_type)
            handler = self.registry.handler_for(model_type)
            base = self.registry.base_model_type(model_type)
            ckpts = None
            if not self.init_random_weights:
                if self.checkpoints_resolver is None:
                    raise RuntimeError(
                        "no checkpoints_resolver configured; pass "
                        "init_random_weights=True for synthetic runs")
                ckpts = self.checkpoints_resolver(model_type, handler, base,
                                                  model_def)
            pipe = handler.load_model(
                base, model_def, checkpoints=ckpts,
                attn_backend=self.attn_backend,
                init_random=self.init_random_weights)
            if self.quantize and hasattr(pipe, "dit_params"):
                pipe.dit_params = quantize_dit_params(
                    pipe.dit_params, self.quantize)
                if getattr(pipe, "dit_params2", None) is not None:
                    pipe.dit_params2 = quantize_dit_params(
                        pipe.dit_params2, self.quantize)
            mesh = self.mesh
            if mesh is not None and hasattr(pipe, "apply_mesh"):
                pipe.apply_mesh(mesh)
            self._pipelines[model_type] = pipe
        return pipe

    def release_model(self, model_type: Optional[str] = None):
        if model_type is None:
            self._pipelines.clear()
        else:
            self._pipelines.pop(model_type, None)

    # -- generation -------------------------------------------------------

    def generate(self, settings: Dict[str, Any],
                 on_progress: Optional[Callable] = None) -> List[str]:
        """Run one task; returns list of output file paths."""
        s = self.plugins.apply_settings_hooks(dict(settings))
        profile = s.pop("profile", None)
        if profile:
            # "family/name" or bare name searched across families
            # (reference profiles/ presets)
            from ..config.profiles import apply_profile, list_profiles
            if "/" in profile:
                fam, name = profile.split("/", 1)
            else:
                fam = next((f for f, names in list_profiles().items()
                            if profile in names), None)
                name = profile
            if fam is None:
                raise FileNotFoundError(f"profile {profile!r} not found")
            s = apply_profile(s, fam, name)
        lset = s.pop("lset_name", None)
        if lset:
            from ..config.profiles import apply_lset
            if not os.path.isfile(lset):
                lora_dir = s.get("lora_dir", "loras")
                lset = os.path.join(
                    lora_dir, lset if lset.endswith(".lset")
                    else lset + ".lset")
            s = apply_lset(s, lset)
        model_type = s.get("model_type") or "t2v_1.3B"
        defaults = self.registry.default_settings(model_type)
        merged = {**defaults, **s}
        model_def = self.registry.get(model_type)
        image_outputs = bool(model_def.get("image_outputs"))

        seed = int(merged.get("seed", -1))
        if seed < 0:
            seed = random.randint(0, 2 ** 31 - 1)
            merged["seed"] = seed
        width, height = parse_resolution(merged.get("resolution", "832x480"))

        pipe = self.get_pipeline(model_type)
        attention_mode = merged.get("attention_mode")
        if attention_mode and hasattr(pipe, "attn_backend"):
            # per-task attention mode (reference resolve_attention_mode,
            # shared/attention.py:294: server config overridden per model):
            # "auto"|"xla"|"pallas"|"radial"|"swa:W[:S]"|"ring:cp"|...
            pipe.attn_backend = str(attention_mode)
        os.makedirs(self.output_dir, exist_ok=True)
        stamp = time.strftime("%Y%m%d_%H%M%S")

        if on_progress:
            on_progress("status", f"generating with {model_type}")

        if merged.get("prompt_enhancer") and \
                getattr(self, "prompt_enhancer", None) is not None:
            # per-model enhancer instructions (reference wgp.py
            # process_prompt_enhancer; e.g. Ideogram's Magic Prompt,
            # ideogram4_handler.py text_prompt_enhancer_instructions)
            instructions = model_def.get(
                "text_prompt_enhancer_instructions")
            enhanced = self.prompt_enhancer.enhance(
                [merged.get("prompt", "")],
                is_image=bool(model_def.get("image_outputs")),
                system_prompt=instructions)
            merged = dict(merged, prompt=enhanced[0],
                          original_prompt=merged.get("prompt", ""))

        if model_def.get("audio_only"):
            # TTS / music families: audio is the sole output (reference
            # models/TTS/*_handler.py; saved via save_audio_file,
            # shared/utils/audio_video.py:377)
            handler = self.registry.handler_for(model_type)
            out = handler.generate_audio(pipe, merged, seed)
            path = media.save_audio(
                np.asarray(out["audio"]),
                os.path.join(self.output_dir,
                             f"{model_type}_{stamp}_{seed}.wav"),
                sample_rate=int(out.get("sample_rate", 44100)),
                metadata=_clean_settings(merged))
            return self.plugins.apply_postprocess_hooks([path], merged)

        if image_outputs:
            handler = self.registry.handler_for(model_type)
            img = handler.generate_image(pipe, merged, width, height, seed)
            path = os.path.join(self.output_dir,
                                f"{model_type}_{stamp}_{seed}.png")
            media.save_image(np.asarray(img), path,
                             metadata=_clean_settings(merged))
            return self.plugins.apply_postprocess_hooks([path], merged)

        from ..models.wan.pipeline import SamplingConfig
        sampling = SamplingConfig(
            solver=merged.get("sample_solver", "unipc") or "unipc",
            solver_order=int(merged.get("solver_order", 2)),
            steps=int(merged.get("num_inference_steps", 30)),
            shift=float(merged.get("flow_shift", 5.0)),
            guide_scale=float(merged.get("guidance_scale", 5.0)),
            guide2_scale=float(merged.get("guidance2_scale",
                                          merged.get("guidance_scale", 5.0))),
            guide3_scale=float(merged.get("guidance3_scale",
                                          merged.get("guidance_scale", 5.0))),
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

        # LoRA merge (constant multipliers merge into weights; piecewise
        # multipliers re-merge between scan segments — lora.py)
        loras = merged.get("loras") or merged.get("activated_loras") or []
        if loras:
            from ..lora import (convert_lora_sd, merge_loras,
                                parse_lora_multipliers)
            from ..io.safetensors_reader import load_safetensors
            sched = parse_lora_multipliers(
                merged.get("loras_multipliers", ""), len(loras),
                sampling.steps)
            lora_dicts = [convert_lora_sd(load_safetensors(p))
                          for p in loras]
            pipe.dit_params, unmatched = merge_loras(
                pipe.dit_params, lora_dicts, [float(m[0]) for m in sched])
            if unmatched and on_progress:
                on_progress("status",
                            f"{len(unmatched)} unmatched LoRA keys")

        frame_num = int(merged.get("video_length", 81))
        handler = self.registry.handler_for(model_type)
        if hasattr(handler, "generate_video"):
            # non-Wan video families own their sampling-config mapping;
            # they may return a bare frame array or a dict with an audio
            # track ({"video", "audio", "audio_sample_rate"}) — the TPU
            # analog of the reference's save_audio_file + mux step
            # (shared/utils/audio_video.py:377,:613)
            result = handler.generate_video(pipe, merged, width, height,
                                            frame_num, seed)
            audio, audio_sr = None, 16000
            if isinstance(result, dict):
                video = result["video"]
                audio = result.get("audio")
                audio_sr = int(result.get("audio_sample_rate", 16000))
            elif isinstance(result, tuple):
                video = result[0]
            else:
                video = result
            video = np.asarray(video)
            if video.ndim == 5:
                # undecoded latents (no VAE attached, e.g. synthetic runs):
                # RGB-factor preview approximation (latent_preview.py)
                from ..postprocessing.latent_preview import latent_to_rgb
                try:
                    video = latent_to_rgb(video)
                except Exception:
                    video = np.clip(
                        (video[0, :3].transpose(1, 2, 3, 0) + 1) * 127.5,
                        0, 255).astype(np.uint8)
            video = _apply_spatial_upsampling(video, merged)
            video, fps = _apply_temporal_upsampling(
                video, merged, int(merged.get("fps", 24)))
            path = os.path.join(self.output_dir,
                                f"{model_type}_{stamp}_{seed}.avi")
            media.save_video(np.asarray(video), path, fps=fps,
                             metadata=_clean_settings(merged),
                             audio=(None if audio is None
                                    else np.asarray(audio)),
                             audio_sample_rate=audio_sr)
            outputs = [path]
            if audio is not None:
                outputs.append(media.save_audio(
                    np.asarray(audio),
                    os.path.join(self.output_dir,
                                 f"{model_type}_{stamp}_{seed}.wav"),
                    sample_rate=audio_sr,
                    metadata=_clean_settings(merged)))
            return self.plugins.apply_postprocess_hooks(outputs, merged)
        if model_def.get("ovi_class"):
            # Ovi joint audio+video (ovi_fusion_engine.py:129-331)
            video, audio = pipe.generate(
                prompt=merged.get("prompt", ""),
                n_prompt=merged.get("negative_prompt", ""),
                audio_n_prompt=merged.get("audio_negative_prompt", ""),
                width=width, height=height, frame_num=frame_num,
                steps=int(merged.get("num_inference_steps", 50)),
                shift=float(merged.get("flow_shift", 5.0)),
                guide_scale=float(merged.get("guidance_scale", 5.0)),
                audio_guide_scale=float(
                    merged.get("audio_guidance_scale", 4.0)),
                seed=seed, image_start=merged.get("_image_start"))
            fps = int(merged.get("fps", 24) or 24)
            path = os.path.join(self.output_dir,
                                f"{model_type}_{stamp}_{seed}.avi")
            audio_np = np.asarray(audio)
            has_wave = audio_np.ndim <= 2 and audio_np.size > 1000
            media.save_video(np.asarray(video), path, fps=fps,
                             metadata=_clean_settings(merged),
                             audio=(audio_np if has_wave else None),
                             audio_sample_rate=16000)
            return self.plugins.apply_postprocess_hooks([path], merged)
        if model_def.get("steadydancer_class") \
                and merged.get("_pose_video") is not None \
                and merged.get("_image_start") is not None:
            # SteadyDancer pose-driven i2v (any2video.py:793-809)
            video = pipe.generate_steadydancer(
                prompt=merged.get("prompt", ""),
                pose_video=merged["_pose_video"],
                source_image=merged["_image_start"],
                pose_video_null=merged.get("_pose_video_null"),
                n_prompt=merged.get("negative_prompt", ""),
                width=width, height=height, frame_num=frame_num,
                sampling=sampling, seed=seed,
                condition_guide_scale=float(
                    merged.get("alt_guidance_scale", 2.0)),
                context=merged.get("_context"),
                context_null=merged.get("_context_null"))
            video = _apply_spatial_upsampling(video, merged)
            video, fps = _apply_temporal_upsampling(
                video, merged, int(merged.get("fps", 16)))
            path = os.path.join(self.output_dir,
                                f"{model_type}_{stamp}_{seed}.avi")
            media.save_video(np.asarray(video), path, fps=fps,
                             metadata=_clean_settings(merged))
            return self.plugins.apply_postprocess_hooks([path], merged)
        if model_def.get("animate_class") and merged.get("_image_refs"):
            # Wan 2.2 Animate (any2video.py:820-847)
            video = pipe.generate_animate(
                prompt=merged.get("prompt", ""),
                ref_image=np.asarray(merged["_image_refs"][0]),
                pose_video=merged.get("_pose_video"),
                face_video=merged.get("_face_video"),
                bg_video=merged.get("_bg_video"),
                n_prompt=merged.get("negative_prompt", ""),
                width=width, height=height, frame_num=frame_num,
                sampling=sampling, seed=seed,
                context=merged.get("_context"),
                context_null=merged.get("_context_null"))
            video = _apply_spatial_upsampling(video, merged)
            video, fps = _apply_temporal_upsampling(
                video, merged, int(merged.get("fps", 16)))
            path = os.path.join(self.output_dir,
                                f"{model_type}_{stamp}_{seed}.avi")
            media.save_video(np.asarray(video), path, fps=fps,
                             metadata=_clean_settings(merged))
            return self.plugins.apply_postprocess_hooks([path], merged)
        if model_def.get("wanmove_class") \
                and merged.get("_tracks") is not None \
                and merged.get("_image_start") is not None:
            # Wan-Move trajectory control (any2video.py:779-790)
            video = pipe.generate_wanmove(
                prompt=merged.get("prompt", ""),
                tracks=np.asarray(merged["_tracks"]),
                image_start=merged["_image_start"],
                n_prompt=merged.get("negative_prompt", ""),
                width=width, height=height, frame_num=frame_num,
                sampling=sampling, seed=seed,
                context=merged.get("_context"),
                context_null=merged.get("_context_null"))
            video = _apply_spatial_upsampling(video, merged)
            video, fps = _apply_temporal_upsampling(
                video, merged, int(merged.get("fps", 16)))
            path = os.path.join(self.output_dir,
                                f"{model_type}_{stamp}_{seed}.avi")
            media.save_video(np.asarray(video), path, fps=fps,
                             metadata=_clean_settings(merged))
            return self.plugins.apply_postprocess_hooks([path], merged)
        if model_def.get("recam_class") \
                and merged.get("_video_guide") is not None:
            # ReCamMaster camera re-rendering (any2video.py:928-943)
            video = pipe.generate_recam(
                prompt=merged.get("prompt", ""),
                source_frames=np.asarray(merged["_video_guide"]),
                camera_mode=int(merged.get("model_mode", 1) or 1),
                n_prompt=merged.get("negative_prompt", ""),
                sampling=sampling, seed=seed,
                extrinsics_json=merged.get("_camera_extrinsics_json"),
                context=merged.get("_context"),
                context_null=merged.get("_context_null"))
            video = _apply_spatial_upsampling(video, merged)
            video, fps = _apply_temporal_upsampling(
                video, merged, int(merged.get("fps", 16)))
            path = os.path.join(self.output_dir,
                                f"{model_type}_{stamp}_{seed}.avi")
            media.save_video(np.asarray(video), path, fps=fps,
                             metadata=_clean_settings(merged))
            return self.plugins.apply_postprocess_hooks([path], merged)
        if model_def.get("scail_class") \
                and merged.get("_video_guide") is not None \
                and (merged.get("_image_refs")
                     or merged.get("_image_start") is not None):
            # SCAIL pose-guided animation (any2video.py:850-899);
            # _video_guide carries the rendered 3D-pose video
            ref = (merged.get("_image_refs")
                   or [merged["_image_start"]])[0]
            video = pipe.generate_scail(
                prompt=merged.get("prompt", ""),
                ref_image=np.asarray(ref),
                pose_video=np.asarray(merged["_video_guide"]),
                n_prompt=merged.get("negative_prompt", ""),
                sampling=sampling, seed=seed,
                context=merged.get("_context"),
                context_null=merged.get("_context_null"))
            video = _apply_spatial_upsampling(video, merged)
            video, fps = _apply_temporal_upsampling(
                video, merged, int(merged.get("fps", 16)))
            path = os.path.join(self.output_dir,
                                f"{model_type}_{stamp}_{seed}.avi")
            media.save_video(np.asarray(video), path, fps=fps,
                             metadata=_clean_settings(merged))
            return self.plugins.apply_postprocess_hooks([path], merged)
        if model_def.get("scail2_class") \
                and merged.get("_video_guide") is not None \
                and merged.get("_image_refs"):
            # SCAIL-2: matted ref + color mask as the first two image
            # refs (scail2/__init__.py:726-729)
            refs = merged["_image_refs"]
            ref_mask = (np.asarray(refs[1]) if len(refs) > 1
                        else np.ones_like(np.asarray(refs[0])))
            video = pipe.generate_scail2(
                prompt=merged.get("prompt", ""),
                ref_image=np.asarray(refs[0]), ref_mask=ref_mask,
                pose_video=np.asarray(merged["_video_guide"]),
                driving_mask_video=merged.get("_video_mask"),
                n_prompt=merged.get("negative_prompt", ""),
                sampling=sampling, seed=seed,
                context=merged.get("_context"),
                context_null=merged.get("_context_null"))
            video = _apply_spatial_upsampling(video, merged)
            video, fps = _apply_temporal_upsampling(
                video, merged, int(merged.get("fps", 16)))
            path = os.path.join(self.output_dir,
                                f"{model_type}_{stamp}_{seed}.avi")
            media.save_video(np.asarray(video), path, fps=fps,
                             metadata=_clean_settings(merged))
            return self.plugins.apply_postprocess_hooks([path], merged)
        if model_def.get("vista_class") \
                and merged.get("_vista_inputs") is not None:
            # Vista4D re-rendering from preprocessed scene inputs
            vi = merged["_vista_inputs"]
            video = pipe.generate_vista4d(
                prompt=merged.get("prompt", ""),
                source_video=np.asarray(vi["source_video"]),
                point_cloud_video=np.asarray(vi["point_cloud_video"]),
                cam_c2w=np.asarray(vi["cam_c2w"]),
                intrinsics=np.asarray(vi["intrinsics"]),
                source_alpha_mask=vi.get("source_alpha_mask"),
                source_motion_mask=vi.get("source_motion_mask"),
                point_alpha_mask=vi.get("point_cloud_alpha_mask"),
                point_motion_mask=vi.get("point_cloud_motion_mask"),
                n_prompt=merged.get("negative_prompt", ""),
                sampling=sampling, seed=seed,
                context=merged.get("_context"),
                context_null=merged.get("_context_null"))
            video = _apply_spatial_upsampling(video, merged)
            video, fps = _apply_temporal_upsampling(
                video, merged, int(merged.get("fps", 16)))
            path = os.path.join(self.output_dir,
                                f"{model_type}_{stamp}_{seed}.avi")
            media.save_video(np.asarray(video), path, fps=fps,
                             metadata=_clean_settings(merged))
            return self.plugins.apply_postprocess_hooks([path], merged)
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
                ctx = kiwi_mllm_encode(
                    lm_params, lm_cfg, kp, kcfg, pipe.tokenizer,
                    merged.get("prompt", ""))
                ctx_null = kiwi_mllm_encode(
                    lm_params, lm_cfg, kp, kcfg, pipe.tokenizer,
                    merged.get("negative_prompt", ""))
            else:
                ctx = merged.get("_context")
                if ctx is None:
                    ctx = jnp.zeros((1, 512, pipe.dit_cfg.text_dim),
                                    jnp.float32)
                ctx_null = merged.get("_context_null")
            video = pipe.generate_kiwi(
                context=ctx, context_null=ctx_null, source_frames=src,
                ref_image=ref,
                source_embedder=getattr(pipe, "kiwi_source_embedder",
                                        None),
                ref_embedder=getattr(pipe, "kiwi_ref_embedder", None),
                sampling=sampling, seed=seed)
            video = _apply_spatial_upsampling(video, merged)
            video, fps = _apply_temporal_upsampling(
                video, merged, int(merged.get("fps", 16)))
            path = os.path.join(self.output_dir,
                                f"{model_type}_{stamp}_{seed}.avi")
            media.save_video(np.asarray(video), path, fps=fps,
                             metadata=_clean_settings(merged))
            return self.plugins.apply_postprocess_hooks([path], merged)
        if model_def.get("bernini_class"):
            # Bernini multi-source compositional editing
            video = pipe.generate_bernini(
                prompt=merged.get("prompt", ""),
                control_video=merged.get("_video_guide"),
                ref_images=[np.asarray(r) for r in
                            (merged.get("_image_refs") or [])],
                n_prompt=merged.get("negative_prompt", ""),
                width=width, height=height, frame_num=frame_num,
                omega_v=float(merged.get("control_net_weight", 1.0)
                              or 1.0),
                omega_i=float(merged.get("audio_guidance_scale",
                                         merged.get("guidance2_scale",
                                                    1.0)) or 1.0),
                sampling=sampling, seed=seed,
                context=merged.get("_context"),
                context_null=merged.get("_context_null"))
            video = _apply_spatial_upsampling(video, merged)
            video, fps = _apply_temporal_upsampling(
                video, merged, int(merged.get("fps", 16)))
            path = os.path.join(self.output_dir,
                                f"{model_type}_{stamp}_{seed}.avi")
            media.save_video(np.asarray(video), path, fps=fps,
                             metadata=_clean_settings(merged))
            return self.plugins.apply_postprocess_hooks([path], merged)
        if model_def.get("mocha_class") \
                and merged.get("_video_guide") is not None \
                and merged.get("_image_refs"):
            # MoCha character replacement (any2video.py:387-412)
            video = pipe.generate_mocha(
                prompt=merged.get("prompt", ""),
                source_frames=np.asarray(merged["_video_guide"]),
                mask_frame=_mocha_mask_frame(merged),
                ref_images=[np.asarray(r)
                            for r in merged["_image_refs"][:2]],
                n_prompt=merged.get("negative_prompt", ""),
                frame_num=frame_num, sampling=sampling, seed=seed,
                context=merged.get("_context"),
                context_null=merged.get("_context_null"))
            video = _apply_spatial_upsampling(video, merged)
            video, fps = _apply_temporal_upsampling(
                video, merged, int(merged.get("fps", 16)))
            path = os.path.join(self.output_dir,
                                f"{model_type}_{stamp}_{seed}.avi")
            media.save_video(np.asarray(video), path, fps=fps,
                             metadata=_clean_settings(merged))
            return self.plugins.apply_postprocess_hooks([path], merged)
        if model_def.get("shotplan_class"):
            # ShotPlan relay prompts -> hard-cut planning tokens
            video = pipe.generate_shotplan(
                prompt=merged.get("prompt", ""),
                n_prompt=merged.get("negative_prompt", ""),
                width=width, height=height, frame_num=frame_num,
                fps=float(merged.get("fps", 16) or 16),
                sampling=sampling, seed=seed,
                context=merged.get("_context"),
                context_null=merged.get("_context_null"))
            video = _apply_spatial_upsampling(video, merged)
            video, fps = _apply_temporal_upsampling(
                video, merged, int(merged.get("fps", 16)))
            path = os.path.join(self.output_dir,
                                f"{model_type}_{stamp}_{seed}.avi")
            media.save_video(np.asarray(video), path, fps=fps,
                             metadata=_clean_settings(merged))
            return self.plugins.apply_postprocess_hooks([path], merged)
        if model_def.get("alpha_class") \
                and getattr(pipe, "vae_params_alpha", None) is not None:
            # Wan-Alpha RGBA output (alpha/utils.py): PNG zip + preview
            rgba = pipe.generate_alpha(
                prompt=merged.get("prompt", ""),
                n_prompt=merged.get("negative_prompt", ""),
                width=width, height=height, frame_num=frame_num,
                sampling=sampling, seed=seed,
                gauss_mask=merged.get("_gauss_mask"),
                context=merged.get("_context"),
                context_null=merged.get("_context_null"))
            rgba = np.asarray(rgba)
            zip_path = os.path.join(self.output_dir,
                                    f"{model_type}_{stamp}_{seed}.zip")
            media.save_rgba_zip(rgba, zip_path,
                                metadata=_clean_settings(merged))
            preview = media.composite_checkerboard(rgba)
            path = os.path.join(self.output_dir,
                                f"{model_type}_{stamp}_{seed}.avi")
            media.save_video(preview, path,
                             fps=int(merged.get("fps", 16)),
                             metadata=_clean_settings(merged))
            return self.plugins.apply_postprocess_hooks(
                [zip_path, path], merged)
        if model_def.get("lynx_class") \
                and merged.get("_arcface_embed") is not None \
                and getattr(pipe, "lynx_resampler_params", None) is not None:
            # Lynx face-identity adapter (any2video.py:1039-1069)
            refs = merged.get("_image_refs") or []
            video = pipe.generate_lynx(
                prompt=merged.get("prompt", ""),
                arcface_embed=np.asarray(merged["_arcface_embed"]),
                ref_image=(np.asarray(refs[-1]) if refs else None),
                n_prompt=merged.get("negative_prompt", ""),
                width=width, height=height, frame_num=frame_num,
                sampling=sampling, seed=seed,
                resampler_params=pipe.lynx_resampler_params,
                resampler_cfg=pipe.lynx_resampler_cfg,
                ip_scale=float(merged.get("control_net_weight", 1.0)),
                ref_scale=float(merged.get("control_net_weight", 1.0)),
                context=merged.get("_context"),
                context_null=merged.get("_context_null"))
            video = _apply_spatial_upsampling(video, merged)
            video, fps = _apply_temporal_upsampling(
                video, merged, int(merged.get("fps", 16)))
            path = os.path.join(self.output_dir,
                                f"{model_type}_{stamp}_{seed}.avi")
            media.save_video(np.asarray(video), path, fps=fps,
                             metadata=_clean_settings(merged))
            return self.plugins.apply_postprocess_hooks([path], merged)
        if model_def.get("standin_class") and merged.get("_image_refs"):
            # StandIn identity preservation (any2video.py:1072-1088):
            # first reference image = the face to preserve
            video = pipe.generate_standin(
                prompt=merged.get("prompt", ""),
                ref_image=np.asarray(merged["_image_refs"][0]),
                n_prompt=merged.get("negative_prompt", ""),
                width=width, height=height, frame_num=frame_num,
                sampling=sampling, seed=seed,
                context=merged.get("_context"),
                context_null=merged.get("_context_null"))
            video = _apply_spatial_upsampling(video, merged)
            video, fps = _apply_temporal_upsampling(
                video, merged, int(merged.get("fps", 16)))
            path = os.path.join(self.output_dir,
                                f"{model_type}_{stamp}_{seed}.avi")
            media.save_video(np.asarray(video), path, fps=fps,
                             metadata=_clean_settings(merged))
            return self.plugins.apply_postprocess_hooks([path], merged)
        if model_def.get("fantasy_class") \
                and getattr(pipe, "fantasy_proj_params", None) is not None:
            # FantasyTalking audio-driven i2v (fantasytalking/infer.py:10)
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
                video = pipe.generate_fantasy(
                    prompt=merged.get("prompt", ""), audio_features=feats,
                    image_start=merged.get("_image_start"),
                    n_prompt=merged.get("negative_prompt", ""),
                    width=width, height=height, frame_num=frame_num,
                    sampling=sampling, seed=seed,
                    audio_guide_scale=float(
                        merged.get("audio_guidance_scale", 5.0)),
                    fantasy_proj_params=pipe.fantasy_proj_params,
                    context=merged.get("_context"),
                    context_null=merged.get("_context_null"))
                video, fps = _apply_temporal_upsampling(
                    video, merged, int(merged.get("fps", 23)))
                path = os.path.join(self.output_dir,
                                    f"{model_type}_{stamp}_{seed}.avi")
                media.save_video(np.asarray(video), path, fps=fps,
                                 metadata=_clean_settings(merged),
                                 audio=audio_wave, audio_sample_rate=16000)
                return self.plugins.apply_postprocess_hooks([path], merged)
        audio_emb = merged.get("_audio_emb")
        if audio_emb is None and merged.get("audio_guide") \
                and hasattr(pipe, "wav2vec"):
            # audio file -> 16 kHz mono -> wav2vec2 per-frame features
            # (multitalk.py get_embedding:47; fps 25 video-frame rate)
            from ..models.wan.multitalk import wav2vec2_extract
            wave, sr = media.read_wav(merged["audio_guide"])
            mono = wave.astype(np.float32).mean(axis=1) / 32767.0
            mono = (mono - mono.mean()) / (mono.std() + 1e-7)
            fps = float(merged.get("fps", 25) or 25)
            n_frames = max(frame_num, int(len(mono) / max(sr, 1) * fps))
            w2v_params, w2v_cfg = pipe.wav2vec
            audio_emb = wav2vec2_extract(w2v_params, w2v_cfg,
                                         jnp.asarray(mono[None]),
                                         n_frames)[0]
        if model_def.get("multitalk_class") and audio_emb is not None \
                and getattr(pipe, "audio_proj_params", None) is not None:
            video = pipe.generate_multitalk(
                prompt=merged.get("prompt", ""), audio_emb=audio_emb,
                n_prompt=merged.get("negative_prompt", ""),
                width=width, height=height, frame_num=frame_num,
                sampling=sampling, seed=seed,
                audio_guide_scale=float(
                    merged.get("audio_guidance_scale", 4.0)),
                audio_proj_params=pipe.audio_proj_params,
                audio_proj_cfg=pipe.audio_proj_cfg,
                context=merged.get("_context"),
                context_null=merged.get("_context_null"))
            video, fps = _apply_temporal_upsampling(
                video, merged, int(merged.get("fps", 16)))
            path = os.path.join(self.output_dir,
                                f"{model_type}_{stamp}_{seed}.avi")
            audio_wave = merged.get("_audio_wave")
            if audio_wave is None and merged.get("audio_guide"):
                audio_wave, _ = media.read_wav(merged["audio_guide"])
            media.save_video(np.asarray(video), path, fps=fps,
                             metadata=_clean_settings(merged),
                             audio=audio_wave, audio_sample_rate=16000)
            return self.plugins.apply_postprocess_hooks([path], merged)
        window_size = int(merged.get("sliding_window_size", 0) or 0)
        source_path = merged.get("video_source")
        if source_path:
            # continue-video (wgp.py:6964): the source's tail frames become
            # the first window's overlap prefix; output = source + new,
            # seam-blended (any2video.py:1482-1491 re-noising in denoise)
            from ..windows import stitch_windows
            src_u8 = media.read_mjpeg_avi(source_path)
            src = src_u8.astype(np.float32) / 127.5 - 1.0
            ov = int(merged.get("sliding_window_overlap", 5) or 5)
            new = pipe.generate_sliding(
                prompt=merged.get("prompt", ""),
                n_prompt=merged.get("negative_prompt", ""),
                width=src.shape[2], height=src.shape[1],
                frame_num=frame_num,
                window_size=window_size or frame_num,
                overlap=ov,
                discard=int(merged.get(
                    "sliding_window_discard_last_frames", 0)),
                sampling=sampling, seed=seed,
                context=merged.get("_context"),
                context_null=merged.get("_context_null"),
                source_frames=src)
            video = stitch_windows([src, np.asarray(new)], [0, ov])
        elif window_size and frame_num > window_size:
            video = pipe.generate_sliding(
                prompt=merged.get("prompt", ""),
                n_prompt=merged.get("negative_prompt", ""),
                width=width, height=height, frame_num=frame_num,
                window_size=window_size,
                overlap=int(merged.get("sliding_window_overlap", 5)),
                discard=int(merged.get(
                    "sliding_window_discard_last_frames", 0)),
                sampling=sampling, seed=seed,
                context=merged.get("_context"),
                context_null=merged.get("_context_null"))
        else:
            i2v_cond = None
            if model_def.get("svi2pro_class"):
                # SVI2Pro latent-ref conditioning (any2video.py:707-722)
                ref = (merged.get("_image_refs") or
                       [merged.get("_image_start")])[0]
                if ref is not None:
                    i2v_cond = pipe.build_svi_conditioning(
                        np.asarray(ref), frame_num, height, width,
                        image_end=merged.get("_image_end"))
            video = pipe.generate(
                prompt=merged.get("prompt", ""),
                n_prompt=merged.get("negative_prompt", ""),
                width=width, height=height,
                frame_num=frame_num,
                sampling=sampling, seed=seed,
                context=merged.get("_context"),
                context_null=merged.get("_context_null"),
                image_start=merged.get("_image_start"),
                i2v_cond=i2v_cond)
        video = _apply_spatial_upsampling(video, merged)
        video, fps = _apply_temporal_upsampling(
            video, merged, int(merged.get("fps", 16)))
        path = os.path.join(self.output_dir,
                            f"{model_type}_{stamp}_{seed}.avi")
        media.save_video(np.asarray(video), path, fps=fps,
                         metadata=_clean_settings(merged))
        return self.plugins.apply_postprocess_hooks([path], merged)

    # -- queue worker ------------------------------------------------------

    def process_queue(self, queue, on_event: Optional[Callable] = None):
        """Drain the queue (the reference's process_tasks_cli loop,
        wgp.py:8488).  Returns exit code: 0 ok, 1 a task errored."""
        code = 0
        while not self._interrupt:
            task = queue.next_pending()
            if task is None:
                break
            task.status = "running"
            if on_event:
                on_event("task_start", task)
            try:
                task.outputs = self.generate(
                    task.settings,
                    on_progress=(lambda kind, data:
                                 on_event(kind, data) if on_event else None))
                task.status = "done"
            except Exception as e:  # noqa: BLE001 — task errors abort queue
                task.status = "error"
                task.error = str(e)
                code = 1
                if on_event:
                    on_event("task_error", task)
                break
            if on_event:
                on_event("task_done", task)
        return code


def _clean_settings(settings: Dict[str, Any]) -> Dict[str, Any]:
    return {k: v for k, v in settings.items()
            if not k.startswith("_") and _jsonable(v)}


def _jsonable(v):
    return isinstance(v, (str, int, float, bool, list, dict, type(None)))
