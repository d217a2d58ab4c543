"""LTX-2 audio-only TTS stack — DramaBox + Scenema (reference
models/ltx2/ltx_audio_tts.py LTXAudioTTSPipelineBase,
dramabox_audio.py, scenema_audio.py; registered by
ltx_audio_tts_handler.py).

Both models are audio-only LTX-2 DiTs (the joint transformer run with
video_tokens=None) over the LTX-2 audio VAE + BigVGAN vocoder, with
Gemma-3 text conditioning and voice cloning via reference latents
APPENDED to the noisy sequence with their timestep pinned to 0
(ltx_core AudioConditionByAppendedReferenceLatent).

DramaBox adds drama-script planning (dramabox_audio.py:90-270):
"Speaker N {voice=..}:" sections / quoted speech -> per-segment
prompts, duration estimation from character rate + punctuation +
nonverbal verb table (sighs, laughs, pauses...), scaled to the
requested total duration; segments are generated independently and
concatenated.  Scenema formats speaker sections into attribute-tagged
prompts and can post-convert the result with seed-vc
(scenema_seedvc -> postprocessing/seedvc.py).
"""
from __future__ import annotations

import dataclasses
import re
from typing import Any, Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .dit import LTX2Config, ltx2_dit_forward
from .pipeline import dev_schedule, build_ltx2_ropes

DRAMABOX_NEGATIVE = ("worst quality, inconsistent, robotic, "
                     "distorted, noise, static, muffled, unclear, "
                     "unnatural, monotone")
AUDIO_LATENTS_PER_SECOND = 25.0


# ---------------------------------------------------------------------------
# DramaBox script planning (dramabox_audio.py:90-270)
# ---------------------------------------------------------------------------

_NONVERBAL = {
    r"\bsighs?\b": 0.8, r"\bgasps?\b": 0.5, r"\byawns?\b": 1.0,
    r"\bpants?\b": 0.8, r"\bwheezes?\b": 0.8, r"\bcoughs?\b": 0.8,
    r"\bsniffles?\b": 0.5, r"\bgroans?\b": 0.8,
    r"\blong pause\b": 1.0, r"\bpauses? briefly\b": 0.3,
    r"\bpauses?\b": 0.5, r"\bsilence\b": 1.0, r"\bslams?\b": 0.5,
    r"\bclaps?\b": 0.3, r"\bwhistles?\b": 1.0, r"\bhums?\b": 0.8,
    r"\bmutters?\b": 1.5, r"\bmumbles?\b": 1.0,
    r"\bclears? (?:his|her) throat\b": 0.5, r"\bgulps?\b": 0.5,
    r"\bvoice (?:breaks?|cracks?|trembles?)\b": 0.5,
    r"\bcatches? (?:his|her) breath\b": 1.0,
}
_LAUGHS = {r"\blaugh(?:s|ed|ing)?\b": 1.5,
           r"\bcackl(?:e|es|ed|ing)\b": 1.5,
           r"\bchuckl(?:e|es|ed|ing)\b": 1.0,
           r"\bgiggl(?:e|es|ed|ing)\b": 1.0,
           r"\bsnicker(?:s|ed|ing)?\b": 0.8}


def _clean_spaces(s: str) -> str:
    return re.sub(r"\s+", " ", str(s or "")).strip()


def _nonverbal_duration(text: str) -> float:
    extra = 0.0
    for pat, dur in {**_NONVERBAL, **_LAUGHS}.items():
        extra += dur * len(re.findall(pat, text, re.IGNORECASE))
    return extra


def estimate_speech_duration(text: str, speed: float = 1.0) -> float:
    """Character-rate estimate + punctuation pauses + nonverbal verbs
    (dramabox_audio.py:137-161)."""
    quotes = re.findall(r'"([^"]+)"', text)
    if quotes:
        spoken = " ".join(quotes)
    elif ":" in text:
        spoken = text.split(":", 1)[1].strip()
    else:
        spoken = text
    cps = 14.0
    n = len(spoken)
    if n < 40:
        cps *= 0.6
    elif n < 80:
        cps *= 0.8
    cps *= speed
    dur = n / cps
    dur += (spoken.count(".") + spoken.count("!")
            + spoken.count("?")) * 0.3
    dur += _nonverbal_duration(text)
    return max(3.0, round(dur + 2.0, 1))


def parse_speaker_options(raw: Optional[str]) -> Dict[str, str]:
    """"{voice=\"warm tenor\", gender=male}" -> attr dict
    (scenema_audio.py:203-217)."""
    if not raw:
        return {}
    text = raw.strip()
    if text.startswith("{") and text.endswith("}"):
        text = text[1:-1]
    out = {}
    pat = re.compile(r"([A-Za-z_][\w-]*)\s*=\s*(?:\"([^\"]*)\""
                     r"|'([^']*)'|([^,\s}]+))")
    for m in pat.finditer(text):
        key = m.group(1).strip().lower()
        if key in {"voice", "gender", "scene", "shot", "language"}:
            val = next(g for g in m.groups()[1:] if g is not None)
            out[key] = _clean_spaces(val)
    return out


def _speaker_prefix(speaker: int, attrs: Dict[str, str]) -> str:
    parts = []
    voice = attrs.get("voice", "")
    gender = attrs.get("gender", "").lower()
    if voice:
        parts.append(voice)
    elif gender == "female":
        parts.append("female speaker")
    elif gender == "male":
        parts.append("male speaker")
    elif speaker:
        parts.append(f"speaker {speaker}")
    if attrs.get("scene"):
        parts.append(f"in {attrs['scene']}")
    return ". ".join(parts)


@dataclasses.dataclass
class DramaBoxSegment:
    prompt: str
    duration_s: float
    seed: int
    speaker: int = 1
    expected_text: str = ""


def plan_dramabox_segments(text: str, seed: int = 0,
                           duration_seconds: float = 0.0,
                           duration_multiplier: float = 1.1
                           ) -> List[DramaBoxSegment]:
    """dramabox_audio.py:211-270: parse speaker sections, estimate and
    scale durations."""
    raw = str(text or "").strip()
    if not raw:
        return []
    header = re.compile(r"^\s*Speaker\s*(\d+)\s*(\{[^\n{}]*\})?\s*:"
                        r"\s*(.*)$", re.IGNORECASE)
    has_headers = any(header.match(l.strip())
                      for l in raw.splitlines())
    parsed: List[Tuple[int, str, str]] = []
    attrs_by_speaker: Dict[int, Dict[str, str]] = {}
    current = 1
    for line in raw.splitlines():
        s = line.strip()
        if not s:
            continue
        if has_headers:
            m = header.match(s)
            if m:
                current = max(1, int(m.group(1)))
                a = attrs_by_speaker.setdefault(current, {})
                a.update(parse_speaker_options(m.group(2)))
                s = m.group(3).strip()
                if not s:
                    continue
        attrs = attrs_by_speaker.setdefault(current, {})
        expected = _clean_spaces(" ".join(
            q.strip() for q in re.findall(r'"([^"]+)"', s)))
        body = _clean_spaces(s)
        if '"' not in body:
            body = f'says, "{body.strip(" .")}."'
        prefix = _speaker_prefix(current, attrs)
        prompt = _clean_spaces(f"{prefix}. {body}"
                               if prefix else body)
        if prompt:
            parsed.append((current, prompt, expected))
    durations = [max(1.0, round(estimate_speech_duration(p)
                                * duration_multiplier, 1))
                 for _, p, _ in parsed]
    tgt = float(duration_seconds or 0.0)
    if tgt > 0 and durations:
        if len(durations) == 1:
            durations = [tgt]
        else:
            total = sum(durations)
            if total > 0:
                durations = [max(1.0, round(d * tgt / total, 1))
                             for d in durations]
    return [DramaBoxSegment(prompt=p, duration_s=d,
                            seed=seed + i * 1000, speaker=spk,
                            expected_text=exp)
            for i, ((spk, p, exp), d) in enumerate(zip(parsed,
                                                       durations))]


# ---------------------------------------------------------------------------
# audio-only denoise (LTXAudioOnlyModelConfigurator path)
# ---------------------------------------------------------------------------

def ltx2_audio_only_denoise(params, cfg: LTX2Config, n_tokens: int,
                            ctx, ctx_n, ref_latents=None,
                            steps: int = 30, cfg_scale: float = 2.5,
                            key=None, attn_backend: str = "auto"):
    """Denoise audio tokens with the joint DiT run audio-only
    (ltx2_dit_forward video_tokens=None); reference voice latents are
    APPENDED with timestep pinned to 0 and trimmed from the result
    (AudioConditionByAppendedReferenceLatent)."""
    key = key if key is not None else jax.random.key(0)
    ref_n = 0 if ref_latents is None else ref_latents.shape[1]
    total = n_tokens + ref_n
    _vr, a_rope, _vx, _ax = build_ltx2_ropes(cfg, (1, 1, 1), total)
    sigmas = jnp.asarray(dev_schedule(steps, total), jnp.float32)
    x = jax.random.normal(key, (1, n_tokens, cfg.audio_in_channels),
                          jnp.float32)
    mask = jnp.ones((1, n_tokens), jnp.float32)
    if ref_n:
        x = jnp.concatenate(
            [x, ref_latents.astype(jnp.float32)], axis=1)
        mask = jnp.concatenate([mask, jnp.zeros((1, ref_n))], axis=1)
    use_cfg = cfg_scale != 1.0

    def step_fn(x, i):
        sig = sigmas[i]
        t_a = sig * mask
        if use_cfg:
            xx = jnp.concatenate([x, x], 0)
            tt = jnp.concatenate([t_a, t_a], 0)
            cc_len = max(ctx.shape[1], ctx_n.shape[1])

            def pad(c):
                return jnp.pad(c, ((0, 0), (0, cc_len - c.shape[1]),
                                   (0, 0)))
            cc = jnp.concatenate([pad(ctx), pad(ctx_n)], 0)
            _v, va = ltx2_dit_forward(
                params, cfg, None, None, cc, None,
                audio_tokens=xx, t_audio=tt, audio_rope=a_rope,
                attn_backend=attn_backend)
            v = va[1:] + cfg_scale * (va[:1] - va[1:])
        else:
            _v, v = ltx2_dit_forward(
                params, cfg, None, None, ctx, None,
                audio_tokens=x, t_audio=t_a, audio_rope=a_rope,
                attn_backend=attn_backend)
        sig_next = sigmas[i + 1]
        # rectified-flow Euler: x <- x + (sig_next - sig) * v
        x_new = x + (sig_next - sig) * v.astype(jnp.float32)
        m = mask[..., None]
        return jnp.where(m > 0, x_new, x), None

    x, _ = jax.lax.scan(step_fn, x, jnp.arange(len(sigmas) - 1))
    return x[:, :n_tokens]
