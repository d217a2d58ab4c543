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
    embeddings, norms, modulation tables and small adapters stay float.

    An "a8" suffix ("int4a8"/"int8a8" — the reference's W4A8 qtype,
    shared/qtypes/asym_w4a8_int8.py) additionally switches the process
    activation policy to dynamic per-token int8 (ops/quant.set_act_quant),
    which runs matmuls on the MXU s8 path at 2x the bf16 rate."""
    from ..ops.quant import quantize_params_tree, set_act_quant
    if mode.endswith("a8"):
        set_act_quant("int8")
        mode = mode[:-2].rstrip("_")
    bits = {"int8": 8, "quanto_int8": 8, "int4": 4}.get(mode)
    if bits is None:
        raise ValueError(f"unknown quantization mode {mode!r} "
                         "(use 'int8', 'int4', 'int8a8' or 'int4a8')")
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
    if su.startswith("seedvr2"):
        # "seedvr2" (2x) or "seedvr2x1.5" etc. — one-step diffusion VSR
        # (reference postprocessing/seedvr2/runtime.py)
        from ..postprocessing.seedvr2 import (SeedVR2Config,
                                              init_seedvr2,
                                              seedvr2_upscale)
        import jax
        scale = float(su.split("x")[1]) if "x" in su else 2.0
        sv_params = merged.get("_seedvr2_params")
        sv_cfg = merged.get("_seedvr2_cfg") or SeedVR2Config()
        if sv_params is None:
            sv_params = init_seedvr2(jax.random.key(0), sv_cfg)
        return seedvr2_upscale(
            sv_params, sv_cfg, frames, scale=scale,
            seed=int(merged.get("seed", 0) or 0),
            window_size=int(merged.get("seedvr2_window", -1) or -1),
            window_overlap=int(merged.get("seedvr2_overlap", 3) or 3))
    if "pid" in su:
        # "pid4"/"flux_vae_pid4"/"flux_pid(1.5)4"... — PiD pixel-space
        # diffusion 4x SR (reference postprocessing/pid/runtime.py
        # PID_UPSAMPLING_VALUES)
        from ..postprocessing.pid import (PiDConfig, init_pid_net,
                                          pid_upscale)
        import jax
        pid_params = merged.get("_pid_params")
        pid_cfg = merged.get("_pid_cfg") or PiDConfig()
        if pid_params is None:
            pid_params = init_pid_net(jax.random.key(0), pid_cfg)
        enc = merged.get("_pid_vae_encode_fn")
        if enc is None:
            from ..models.flux.vae import (FluxVAEConfig, init_flux_vae,
                                           flux_vae_encode)
            fv_cfg = merged.get("_pid_vae_cfg") or FluxVAEConfig()
            fv = merged.get("_pid_vae_params")
            if fv is None:
                fv = init_flux_vae(jax.random.key(1), fv_cfg)

            def enc(img):
                import jax.numpy as jnp
                return flux_vae_encode(fv, fv_cfg, jnp.asarray(img))
        out = np.stack([
            pid_upscale(pid_params, pid_cfg, media.to_uint8(f),
                        vae_encode_fn=enc,
                        caption_embs=merged.get("_pid_caption_embs"),
                        seed=int(merged.get("seed", 0) or 0))
            for f in frames])
        return out
    if su.startswith("coz"):
        # "coz2"/"coz4"/"coz8"/"coz16" — Chain-of-Zoom recursive SR
        # (reference postprocessing/chain_of_zoom/runtime.py; method
        # encoding spatial_upsamplers.py:751)
        from ..postprocessing.chain_of_zoom import (
            SD3Config, SD3_VAE_CONFIG, init_chain_of_zoom,
            chain_of_zoom_upscale)
        import jax
        scale = float(su[3:] or 4)
        coz = merged.get("_coz_params")
        coz_cfg = merged.get("_coz_cfg") or SD3Config()
        vae_cfg = merged.get("_coz_vae_cfg") or SD3_VAE_CONFIG
        if coz is None:
            coz = init_chain_of_zoom(jax.random.key(0), coz_cfg,
                                     vae_cfg)
        out = np.stack([
            chain_of_zoom_upscale(
                coz["sd3"], coz_cfg, coz["vae"], vae_cfg, f, scale,
                tile_prompt_fn=merged.get("_coz_tile_prompt_fn"),
                encode_prompts_fn=merged.get("_coz_encode_prompts_fn"),
                seed=int(merged.get("seed", 0) or 0))
            for f in frames])
        return out
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
                 quantize: str = "", video_codec: Optional[str] = None,
                 video_container: Optional[str] = None):
        self.registry = registry or ModelRegistry(build_handler_map())
        self.output_dir = output_dir
        # output codec policy (reference server_config video_output_codec /
        # video_container, wgp.py:3289,:7967; shared/utils/video_codecs.py).
        # None -> container-free MJPEG-AVI (no ffmpeg needed).
        self.video_codec = video_codec
        self.video_container = video_container
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
        self.plugins = PluginManager(service=self, load_builtins=True)
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

    def get_pipeline(self, model_type: str, model_def: Optional[dict] = None,
                     config_selection: str = ""):
        """model_def: pre-resolved def (config-group overrides applied);
        config_selection keys the cache so switching sub-configs reloads
        (the reference tracks loaded_config in load_models)."""
        cache_key = (f"{model_type}@{config_selection}" if config_selection
                     else model_type)
        pipe = self._pipelines.get(cache_key)
        if pipe is None:
            if model_def is None:
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
            self._pipelines[cache_key] = pipe
        return pipe

    def release_model(self, model_type: Optional[str] = None):
        if model_type is None:
            self._pipelines.clear()
        else:
            for key in [k for k in self._pipelines
                        if k == model_type
                        or k.startswith(model_type + "@")]:
                self._pipelines.pop(key, None)

    # -- generation -------------------------------------------------------

    def generate(self, settings: Dict[str, Any],
                 on_progress: Optional[Callable] = None) -> List[str]:
        """Run one task; returns list of output file paths."""
        # serialize device access between concurrent callers (reference
        # acquire_main_GPU_ressources, shared/utils/process_locks.py)
        from .process_locks import device_session
        with device_session(f"service:{id(self)}",
                            timeout=float(settings.get(
                                "device_lock_timeout", 600.0))):
            return self._generate_locked(settings, on_progress)

    def _generate_locked(self, settings: Dict[str, Any],
                         on_progress: Optional[Callable] = None
                         ) -> List[str]:
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
        model_def = self.registry.get(model_type)
        # config-group selection applies BEFORE the settings merge and
        # before the pipeline loads, like the reference's load_models
        # (wgp.py:3917-3921 updates model_def pre-weight-loading): load-
        # time overrides (e.g. ltx2 system_configs swapping VAE files)
        # must reach load_model, and settings-like override keys (e.g.
        # num_inference_steps) must land in merged — below explicit task
        # settings, above model defaults.
        config_selection = s.get("config", defaults.get("config"))
        config_overrides: Dict[str, Any] = {}
        if config_selection:
            from ..config.groups import (apply_config_selection,
                                         model_config_groups,
                                         selected_configs)
            for _, _, cdef in selected_configs(
                    model_config_groups(model_def), config_selection):
                config_overrides.update(cdef)
            model_def = apply_config_selection(model_def, config_selection)
        setting_overrides = {
            k: v for k, v in config_overrides.items()
            if k in defaults or k == "settings"}
        nested = setting_overrides.pop("settings", None)
        if isinstance(nested, dict):
            setting_overrides.update(nested)
        merged = {**defaults, **setting_overrides, **s}
        image_outputs = bool(model_def.get("image_outputs"))

        # declarative custom settings: merge custom_setting_N slots +
        # id->value dict, validate types, clamp slider bounds (reference
        # collect_custom_settings_from_inputs, wgp.py:911).  strict at the
        # service boundary: a malformed typed value is a clear upfront
        # error, not raw text passed into generation (reference wgp.py:1014
        # validates with strict=True).
        from ..config.custom_settings import collect_custom_settings
        custom_values, cs_error = collect_custom_settings(model_def, merged,
                                                          strict=True)
        if cs_error:
            raise ValueError(f"invalid custom settings: {cs_error}")
        if custom_values is not None:
            merged["custom_settings"] = custom_values

        seed = int(merged.get("seed", -1))
        if seed < 0:
            seed = random.randint(0, 2 ** 31 - 1)
            merged["seed"] = seed
        # resolution governance: snap onto the model's declared buckets /
        # block alignment so shapes stay inside the compile cache
        # (config/resolutions.py; reference resolve_resolution_choices)
        from ..config.resolutions import resolve_resolution
        requested_res = merged.get("resolution", "832x480")
        snapped = resolve_resolution(model_def, requested_res)
        if snapped and snapped != requested_res:
            merged["resolution"] = snapped
        width, height = parse_resolution(merged.get("resolution", "832x480"))

        pipe = self.get_pipeline(model_type, model_def=model_def,
                                 config_selection=str(config_selection or ""))
        attention_mode = merged.get("attention_mode")
        if attention_mode and hasattr(pipe, "attn_backend"):
            # per-task attention mode (reference resolve_attention_mode,
            # shared/attention.py:294: server config overridden per model):
            # "auto"|"xla"|"pallas"|"radial"|"swa:W[:S]"|"ring:cp"|...
            pipe.attn_backend = str(attention_mode)
        vae_precision = merged.get("vae_precision")
        if vae_precision and hasattr(pipe, "set_vae_precision"):
            # reference server_config vae_precision "16"/"32"
            pipe.set_vae_precision(str(vae_precision))
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

        # LoRA merge (constant multipliers merge into weights; piecewise
        # multipliers re-merge between scan segments — lora.py)
        loras = merged.get("loras") or merged.get("activated_loras") or []
        if loras:
            from ..lora import (convert_lora_sd, merge_loras,
                                parse_lora_multipliers)
            from ..io.safetensors_reader import load_safetensors
            sched = parse_lora_multipliers(
                merged.get("loras_multipliers", ""), len(loras),
                int(merged.get("num_inference_steps", 30)))
            lora_dicts = [convert_lora_sd(load_safetensors(p))
                          for p in loras]
            pipe.dit_params, unmatched = merge_loras(
                pipe.dit_params, lora_dicts, [float(m[0]) for m in sched])
            if unmatched and on_progress:
                on_progress("status",
                            f"{len(unmatched)} unmatched LoRA keys")

        frame_num = int(merged.get("video_length", 81))
        handler = self.registry.handler_for(model_type)
        merged["_model_def"] = model_def
        if hasattr(handler, "generate_video"):
            # families own their per-variant dispatch (handler protocol;
            # the Wan half lives in families/wan.py generate_video).
            # Result: frame array or dict {video, audio,
            # audio_sample_rate, fps, rgba} — the TPU analog of the
            # reference's save_audio_file + mux step
            # (shared/utils/audio_video.py:377,:613)
            result = handler.generate_video(pipe, merged, width, height,
                                            frame_num, seed)
        else:
            # families without a handler adapter: direct pipeline call
            result = pipe.generate(
                prompt=merged.get("prompt", ""), width=width,
                height=height, frame_num=frame_num, seed=seed)
        audio, audio_sr, fps, rgba = None, 16000, None, None
        if isinstance(result, dict):
            video = result.get("video")
            audio = result.get("audio")
            audio_sr = int(result.get("audio_sample_rate", 16000))
            rgba = result.get("rgba")
            fps = result.get("fps")
        elif isinstance(result, tuple):
            video = result[0]
        else:
            video = result
        fps = int(fps if fps is not None else merged.get("fps", 24))
        outputs = []
        if rgba is not None:
            # Wan-Alpha RGBA output (alpha/utils.py): PNG zip + preview
            zip_path = os.path.join(self.output_dir,
                                    f"{model_type}_{stamp}_{seed}.zip")
            media.save_rgba_zip(np.asarray(rgba), zip_path,
                                metadata=_clean_settings(merged))
            video = media.composite_checkerboard(np.asarray(rgba))
            outputs.append(zip_path)
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
        if rgba is None:
            video = _apply_spatial_upsampling(video, merged)
            video, fps = _apply_temporal_upsampling(video, merged, fps)
        path = os.path.join(self.output_dir,
                            f"{model_type}_{stamp}_{seed}.avi")
        # HDR: a pipeline that returns {"hdr": True} carries LINEAR float
        # frames -> tagged 10-bit HEVC HDR10 (reference wgp.py:7761-7965
        # sample_is_hdr -> save_hdr_video); SDR honors the configured
        # codec/container (server_config video_output_codec).
        is_hdr = bool(isinstance(result, dict) and result.get("hdr"))
        path = media.save_video(np.asarray(video), path, fps=fps,
                                metadata=_clean_settings(merged),
                                audio=(None if audio is None
                                       else np.asarray(audio)),
                                audio_sample_rate=audio_sr,
                                codec_type=merged.get("video_output_codec",
                                                      self.video_codec),
                                container=merged.get("video_container",
                                                     self.video_container),
                                hdr=is_hdr)
        outputs.append(path)
        if audio is not None:
            outputs.append(media.save_audio(
                np.asarray(audio),
                os.path.join(self.output_dir,
                             f"{model_type}_{stamp}_{seed}.wav"),
                sample_rate=audio_sr,
                metadata=_clean_settings(merged)))
        return self.plugins.apply_postprocess_hooks(outputs, merged)

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
