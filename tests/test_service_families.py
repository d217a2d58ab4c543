"""Service-level generate for the non-Wan video families (handler
generate_video adapters added round 3 — previously these families were only
reachable at pipeline level; reference analog: generate_media dispatching
every family through its handler, wgp.py:6436)."""
import os

import numpy as np
import pytest

from wan2gp_tpu.runtime.service import GenerationService
from wan2gp_tpu.utils import media


def _svc(tmp_path):
    return GenerationService(output_dir=str(tmp_path), attn_backend="xla",
                             init_random_weights=True)


def test_hyvideo_service_generate(tmp_path, monkeypatch):
    import wan2gp_tpu.models.hyvideo.dit as hd
    real = hd.make_hunyuan_config

    def tiny(base, **kw):
        cfg = real(base, **kw)
        import dataclasses
        return dataclasses.replace(
            cfg, hidden_size=64, heads_num=4,
            mm_double_blocks_depth=1, mm_single_blocks_depth=1,
            mlp_ratio=2.0, rope_dim_list=(4, 6, 6))

    monkeypatch.setattr(hd, "make_hunyuan_config", tiny)
    import wan2gp_tpu.families.hyvideo as hf
    monkeypatch.setattr(hf, "make_hunyuan_config", tiny)
    svc = _svc(tmp_path)
    outs = svc.generate({
        "model_type": "hunyuan", "resolution": "32x32", "video_length": 5,
        "num_inference_steps": 2, "seed": 1})
    assert outs and outs[0].endswith(".avi") and os.path.exists(outs[0])


def test_ltxv_service_generate(tmp_path, monkeypatch):
    from wan2gp_tpu.families.ltxv import _ARCH
    monkeypatch.setitem(_ARCH, "ltxv_13B", dict(
        inner_dim=64, num_heads=4, num_layers=2,
        cross_attention_dim=64))
    svc = _svc(tmp_path)
    outs = svc.generate({
        "model_type": "ltxv_13B", "resolution": "64x64", "video_length": 9,
        "num_inference_steps": 2, "seed": 2})
    assert outs and outs[0].endswith(".avi") and os.path.exists(outs[0])


def test_ltx2_service_generate_av(tmp_path, monkeypatch):
    from wan2gp_tpu.families.ltx2 import _ARCH
    monkeypatch.setitem(_ARCH, "ltx2_19B", dict(
        num_layers=1, num_heads=2, head_dim=16,
        audio_num_heads=2, audio_head_dim=16))
    svc = _svc(tmp_path)
    outs = svc.generate({
        "model_type": "ltx2_19B", "resolution": "64x64", "video_length": 9,
        "num_inference_steps": 2, "seed": 3})
    assert outs and outs[0].endswith(".avi") and os.path.exists(outs[0])
