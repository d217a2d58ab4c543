"""Two-speaker diarization + separation — TPU-native equivalent of the
reference's pyannote/speechbrain pipeline (reference
preprocessing/speaker_separator/separator.py:89-1002, wired into
SeedVC two-speaker voice replacement).

Design: sliding-window CAMPPlus x-vectors (the same speaker embedder
already used by s3gen/seed-vc) + energy VAD + 2-means clustering over
the embeddings + median smoothing -> per-speaker time masks ->
masked waveforms.  This replaces the external pyannote dependency with
the repo's own speaker stack; the clustering runs on host (tiny data).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..models.tts.s3gen import S3GenConfig, init_campplus, \
    campplus_embed
from ..postprocessing.seedvc import whisper_mel, WhisperEncConfig


@dataclasses.dataclass(frozen=True)
class DiarizationConfig:
    sample_rate: int = 16000
    window_s: float = 1.5
    hop_s: float = 0.75
    vad_threshold: float = 0.02    # rms gate
    smooth: int = 3                # median filter over window labels
    n_speakers: int = 2

    @classmethod
    def tiny(cls):
        return cls(window_s=0.2, hop_s=0.1, smooth=1)


class SpeakerDiarizer:
    def __init__(self, cfg: DiarizationConfig = DiarizationConfig(),
                 campplus_params=None, cam_cfg: S3GenConfig = None,
                 tiny: bool = False, seed: int = 0):
        self.cfg = cfg
        if campplus_params is None:
            cam_cfg = cam_cfg or (S3GenConfig.tiny() if tiny else
                                  S3GenConfig(mel_dim=80, spk_dim=192,
                                              cam_channels=32,
                                              cam_growth=32,
                                              cam_init=128,
                                              cam_layers=(12, 24, 16),
                                              cam_dilations=(1, 2, 2)))
            campplus_params = init_campplus(jax.random.key(seed),
                                            cam_cfg)
        self.cam = campplus_params
        self.cam_cfg = cam_cfg
        self.wcfg = dataclasses.replace(WhisperEncConfig(),
                                        n_mels=cam_cfg.mel_dim)

    def _embed(self, wav: np.ndarray) -> np.ndarray:
        fb = whisper_mel(jnp.asarray(wav, jnp.float32)[None],
                         self.wcfg)
        fb = fb - jnp.mean(fb, axis=1, keepdims=True)
        return np.asarray(campplus_embed(self.cam, self.cam_cfg, fb))[0]

    def diarize(self, wav: np.ndarray
                ) -> List[Tuple[float, float, int]]:
        """wav mono 16 kHz -> [(start_s, end_s, speaker)], speaker in
        {0, 1}; silent windows are skipped."""
        cfg = self.cfg
        sr = cfg.sample_rate
        win = max(1, int(cfg.window_s * sr))
        hop = max(1, int(cfg.hop_s * sr))
        wav = np.asarray(wav, np.float32)
        if wav.ndim > 1:
            wav = wav.mean(axis=-1)
        starts = list(range(0, max(1, len(wav) - win + 1), hop))
        if not starts:
            starts = [0]
        embs, voiced = [], []
        for s in starts:
            seg = wav[s:s + win]
            if seg.shape[0] < win:
                seg = np.pad(seg, (0, win - seg.shape[0]))
            rms = float(np.sqrt(np.mean(seg * seg)))
            voiced.append(rms >= cfg.vad_threshold)
            embs.append(self._embed(seg))
        embs = np.stack(embs)
        labels = np.full(len(starts), -1, np.int32)
        active = np.where(voiced)[0]
        if active.size:
            labels[active] = _kmeans2(embs[active], cfg.n_speakers,
                                      seed=0)
            if cfg.smooth > 1 and active.size > 2:
                lab = labels[active]
                sm = lab.copy()
                k = cfg.smooth // 2
                for i in range(len(lab)):
                    lo, hi = max(0, i - k), min(len(lab), i + k + 1)
                    vals, counts = np.unique(lab[lo:hi],
                                             return_counts=True)
                    sm[i] = vals[np.argmax(counts)]
                labels[active] = sm
        segments: List[Tuple[float, float, int]] = []
        for i, s in enumerate(starts):
            if labels[i] < 0:
                continue
            st, en = s / sr, min(s + win, len(wav)) / sr
            if segments and segments[-1][2] == labels[i] \
                    and segments[-1][1] >= st:
                segments[-1] = (segments[-1][0], en, labels[i])
            else:
                segments.append((st, en, int(labels[i])))
        return segments

    def separate(self, wav: np.ndarray
                 ) -> Dict[int, np.ndarray]:
        """Returns per-speaker masked copies of the waveform (the
        two-speaker SeedVC contract: convert each, then remix)."""
        wav = np.asarray(wav, np.float32)
        mono = wav if wav.ndim == 1 else wav.mean(axis=-1)
        segs = self.diarize(mono)
        sr = self.cfg.sample_rate
        out = {k: np.zeros_like(wav)
               for k in range(self.cfg.n_speakers)}
        for st, en, spk in segs:
            i0, i1 = int(st * sr), min(int(en * sr), len(mono))
            out[spk][i0:i1] = wav[i0:i1]
        return out


def _kmeans2(x: np.ndarray, k: int, iters: int = 20,
             seed: int = 0) -> np.ndarray:
    """Tiny k-means on l2-normalized embeddings (the spectral-
    clustering stand-in; host-side, data is a few hundred rows)."""
    x = x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True),
                       1e-8)
    if x.shape[0] <= k:
        return np.arange(x.shape[0]) % k
    rng = np.random.default_rng(seed)
    # k-means++ style: farthest-point init
    centers = [x[rng.integers(x.shape[0])]]
    for _ in range(k - 1):
        d = np.min(np.stack([1.0 - x @ c for c in centers]), axis=0)
        centers.append(x[int(np.argmax(d))])
    c = np.stack(centers)
    lab = np.zeros(x.shape[0], np.int32)
    for _ in range(iters):
        sim = x @ c.T
        new = np.argmax(sim, axis=-1).astype(np.int32)
        if (new == lab).all():
            break
        lab = new
        for j in range(k):
            m = lab == j
            if m.any():
                cj = x[m].mean(axis=0)
                c[j] = cj / max(np.linalg.norm(cj), 1e-8)
    return lab


def make_speaker_separator_fn(tiny: bool = False) -> Callable:
    """Factory for the SeedVCProcessor.speaker_separator_fn hook
    (postprocessing/audio_processors.py): wav, sr -> dict of
    per-speaker waveforms."""
    dia = SpeakerDiarizer(DiarizationConfig.tiny()
                          if tiny else DiarizationConfig(), tiny=tiny)

    def fn(wav, sample_rate):
        w = np.asarray(wav, np.float32)
        sr = dia.cfg.sample_rate
        if sample_rate != sr:
            n = int(round(w.shape[0] * sr / sample_rate))
            xi = np.linspace(0, w.shape[0] - 1, n)
            w = (np.interp(xi, np.arange(w.shape[0]), w)
                 if w.ndim == 1 else
                 np.stack([np.interp(xi, np.arange(w.shape[0]),
                                     w[:, cix])
                           for cix in range(w.shape[1])], axis=-1)
                 ).astype(np.float32)
        return dia.separate(w)

    return fn
