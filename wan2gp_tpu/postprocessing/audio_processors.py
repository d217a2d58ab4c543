"""Audio-processor registry (soundtrack generation / audio edits).

Compact counterpart of the reference framework
(postprocessing/audio_processors.py:31-327 + the per-processor
packages custom_soundtrack/, audio_background_removal/, mmaudio/):
processors self-describe (name, types, methods), register in a global
registry, and the service applies the selected soundtrack method to a
finished video plus audio-edit methods to its track.

Built-ins:
- "custom"  — remux a user-provided audio file onto the video
  (custom_soundtrack/audio_processor.py:34);
- "mmaudio" — generate a soundtrack with the MMAudio flow network
  (postprocessing/mmaudio_net.py) and mux it;
- "remove_background" — keep the vocal stem via a pluggable separator
  callable (audio_background_removal/audio_processor.py:40 routes to
  preprocessing/extract_vocals.py; the BS-RoFormer separator itself is
  external, so a callable hook stands in).
"""
from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional

import numpy as np

SOUNDTRACK = "soundtrack"
AUDIO_EDIT = "audio_edit"
VOICE_REPLACEMENT = "voice_replacement"

_REGISTRY: List[Any] = []


def register_audio_processor(proc) -> None:
    _REGISTRY.append(proc)


def processor_handlers(processor_type: Optional[str] = None) -> List[Any]:
    out = []
    for p in _REGISTRY:
        d = p.query_audio_processor_def()
        if processor_type is None or processor_type in d["processor_types"]:
            out.append(p)
    return sorted(out, key=lambda p:
                  p.query_audio_processor_def().get("pos", 100))


def find_processor(method: str):
    # later registrations override the built-ins (configured instances)
    for p in reversed(_REGISTRY):
        d = p.query_audio_processor_def()
        if any(m == method for _, m in d["methods"]):
            return p
    return None


def method_choices(processor_type: Optional[str] = None):
    out = []
    for p in processor_handlers(processor_type):
        out.extend(p.query_audio_processor_def()["methods"])
    return out


def reset_registry():
    _REGISTRY.clear()
    _register_builtins()


class CustomSoundtrackProcessor:
    @classmethod
    def query_audio_processor_def(cls) -> Dict[str, Any]:
        return {"name": "Custom Soundtrack",
                "processor_types": (SOUNDTRACK,),
                "methods": [("Custom Soundtrack", "custom")], "pos": 10}

    def generate_soundtrack(self, video_path: str,
                            audio_source: Optional[str] = None,
                            **_kw):
        """Returns (wave [T, C] float32, sample_rate) from the given
        audio file."""
        if not audio_source:
            raise ValueError("custom soundtrack needs an audio file")
        from ..utils import media
        wave, sr = media.read_wav(audio_source)
        return wave.astype(np.float32) / 32767.0, sr


class MMAudioSoundtrackProcessor:
    """Text-conditioned MMAudio soundtrack (visual towers optional:
    clip/sync features default to zeros when no extractor is wired)."""

    def __init__(self, net_params=None, net_cfg=None, vae=None,
                 vocoder=None, text_encode_fn=None):
        self.net = (net_params, net_cfg)
        self.vae = vae
        self.vocoder = vocoder
        self.text_encode_fn = text_encode_fn

    @classmethod
    def query_audio_processor_def(cls) -> Dict[str, Any]:
        return {"name": "MMAudio",
                "processor_types": (SOUNDTRACK,),
                "methods": [("MMAudio", "mmaudio")], "pos": 20}

    def generate_soundtrack(self, video_path: str, prompt: str = "",
                            seed: int = 0, **_kw):
        import jax
        import jax.numpy as jnp
        from .mmaudio_net import (mmaudio_generate_latents,
                                  mmaudio_preprocess_conditions,
                                  empty_conditions)
        params, cfg = self.net
        if params is None:
            raise RuntimeError("MMAudio network not loaded")
        txt = (self.text_encode_fn([prompt]) if self.text_encode_fn
               else jnp.zeros((1, cfg.text_seq_len, cfg.text_dim),
                              jnp.float32))
        cond = mmaudio_preprocess_conditions(
            params, cfg,
            jnp.zeros((1, cfg.clip_seq_len, cfg.clip_dim), jnp.float32),
            jnp.zeros((1, cfg.sync_seq_len, cfg.sync_dim), jnp.float32),
            txt)
        lat = mmaudio_generate_latents(
            params, cfg, cond, empty_conditions(params, cfg),
            key=jax.random.key(seed))
        if self.vae is None or self.vocoder is None:
            raise RuntimeError("MMAudio VAE/vocoder not loaded")
        mel = self.vae(lat)
        wave = self.vocoder(mel)
        return np.asarray(wave).reshape(-1, 1), 44100


class BackgroundRemovalProcessor:
    """`get_vocals` equivalent (reference
    preprocessing/extract_vocals.py:81-119): keep the vocal stem via
    the BS-RoFormer separator (postprocessing/bs_roformer.py); a
    custom separator_fn still overrides."""

    def __init__(self, separator_fn: Optional[Callable] = None,
                 tiny: bool = False):
        self.separator_fn = separator_fn
        self._tiny = tiny
        self._sep = None

    @classmethod
    def query_audio_processor_def(cls) -> Dict[str, Any]:
        return {"name": "Remove Music / Background noise",
                "processor_types": (AUDIO_EDIT,),
                "methods": [("Remove Music / Background noise",
                             "remove_background")], "pos": 10}

    def _default_separator(self):
        if self._sep is None:
            from .bs_roformer import init_default_separator
            self._sep = init_default_separator(tiny=self._tiny)
        return self._sep

    def process_audio(self, wave: np.ndarray, sample_rate: int, **_kw):
        if self.separator_fn is not None:
            return self.separator_fn(wave, sample_rate)
        from .bs_roformer import separate_vocals
        params, cfg = self._default_separator()
        w = np.asarray(wave, np.float32)
        if sample_rate != cfg.sample_rate:
            n = int(round(w.shape[0] * cfg.sample_rate / sample_rate))
            xi = np.linspace(0, w.shape[0] - 1, n)
            cols = (w[:, None] if w.ndim == 1 else w)
            w = np.stack([np.interp(xi, np.arange(cols.shape[0]),
                                    cols[:, c])
                          for c in range(cols.shape[1])], axis=-1)
        vocals, _bg = separate_vocals(params, cfg, w)
        if sample_rate != cfg.sample_rate:
            xi = np.linspace(0, vocals.shape[0] - 1,
                             np.asarray(wave).shape[0])
            vocals = np.stack(
                [np.interp(xi, np.arange(vocals.shape[0]),
                           vocals[:, c])
                 for c in range(vocals.shape[1])], axis=-1)
        return vocals.astype(np.float32), sample_rate


class SeedVCProcessor:
    """Seed-VC voice replacement (postprocessing/seedvc/audio_processor
    .py:15-118): one-speaker converts the whole track against one voice
    sample; two-speaker splits the track with a pluggable speaker
    separator (reference preprocessing/speaker_separator/), converts
    each speaker against its own sample, and remixes."""

    def __init__(self, converter=None,
                 speaker_separator_fn: Optional[Callable] = None):
        self._converter = converter
        self.speaker_separator_fn = speaker_separator_fn

    @classmethod
    def query_audio_processor_def(cls) -> Dict[str, Any]:
        return {"name": "SeedVC",
                "processor_types": (VOICE_REPLACEMENT, AUDIO_EDIT),
                "methods": [("SeedVC - One Speaker",
                             "seedvc_one_speaker"),
                            ("SeedVC - Two Speakers",
                             "seedvc_two_speakers")],
                "needs_voice_sample": {"seedvc_one_speaker": True,
                                       "seedvc_two_speakers": True},
                "needs_voice_sample2": {"seedvc_two_speakers": True},
                "speaker_count": {"seedvc_one_speaker": 1,
                                  "seedvc_two_speakers": 2},
                "pos": 30}

    def converter(self):
        if self._converter is None:
            raise RuntimeError("SeedVC converter not loaded")
        return self._converter

    def validate_method(self, method: str, voice_sample=None,
                        voice_sample2=None, **_kw) -> str:
        if voice_sample is None:
            return "You must provide a voice sample"
        if method == "seedvc_two_speakers" and voice_sample2 is None:
            return "You must provide a second voice sample"
        return ""

    def process_audio(self, wave: np.ndarray, sample_rate: int,
                      method: str = "seedvc_one_speaker",
                      voice_sample=None, voice_sample_sr: int = 0,
                      voice_sample2=None, voice_sample2_sr: int = 0,
                      diffusion_steps: Optional[int] = None,
                      seed: int = 0, **_kw):
        mono = wave.mean(axis=-1) if wave.ndim > 1 else wave
        conv = self.converter()
        if method == "seedvc_one_speaker":
            out, sr = conv.convert(mono, sample_rate, voice_sample,
                                   voice_sample_sr,
                                   diffusion_steps=diffusion_steps,
                                   seed=seed)
            return out[:, None], sr
        if method != "seedvc_two_speakers":
            raise ValueError(f"unknown SeedVC method {method!r}")
        if self.speaker_separator_fn is None:
            raise RuntimeError(
                "no speaker separator configured "
                "(reference: preprocessing/speaker_separator)")
        stems = self.speaker_separator_fn(mono, sample_rate)
        samples = [(voice_sample, voice_sample_sr),
                   (voice_sample2, voice_sample2_sr)]
        mixed = None
        sr_out = sample_rate
        for stem, (vs, vs_sr) in zip(stems[:2], samples):
            out, sr_out = conv.convert(stem, sample_rate, vs, vs_sr,
                                       diffusion_steps=diffusion_steps,
                                       seed=seed)
            if mixed is None:
                mixed = out
            else:
                n = min(mixed.shape[0], out.shape[0])
                mixed = mixed[:n] + out[:n]
        return mixed[:, None], sr_out


def apply_soundtrack(video_path: str, method: str,
                     **kwargs) -> str:
    """Generate a soundtrack with `method` and mux it onto the video
    (the reference's late_postprocessing soundtrack step)."""
    proc = find_processor(method)
    if proc is None:
        raise ValueError(f"unknown audio processor {method!r}")
    wave, sr = proc.generate_soundtrack(video_path, **kwargs)
    from ..utils import media
    frames = media.read_mjpeg_avi(video_path)
    meta = media.read_video_metadata(video_path) or {}
    fps = int(meta.get("fps", 16)) if isinstance(meta, dict) else 16
    # trim/pad the soundtrack to the video duration
    want = int(frames.shape[0] / max(fps, 1) * sr)
    if wave.shape[0] > want:
        wave = wave[:want]
    elif wave.shape[0] < want:
        wave = np.pad(wave, ((0, want - wave.shape[0]), (0, 0)))
    media.save_video(frames, video_path, fps=fps,
                     metadata=meta if isinstance(meta, dict) else None,
                     audio=wave, audio_sample_rate=sr)
    return video_path


def _register_builtins():
    register_audio_processor(CustomSoundtrackProcessor())
    register_audio_processor(MMAudioSoundtrackProcessor())
    register_audio_processor(BackgroundRemovalProcessor())
    register_audio_processor(SeedVCProcessor())
    from .prismaudio import PrismAudioProcessor
    register_audio_processor(PrismAudioProcessor())


_register_builtins()
