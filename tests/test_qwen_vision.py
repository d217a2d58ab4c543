"""Qwen2.5-VL vision tower vs the HF implementation (windowed attention,
2D rope, patch merger)."""
import numpy as np
import jax
import jax.numpy as jnp
import torch

from wan2gp_tpu.models.qwen.vision import (
    QwenVisionConfig, init_qwen_vision, qwen_vision_forward,
    load_qwen_vision_params, image_to_patches, vision_positions,
    window_index)


def _tiny_cfgs():
    from transformers.models.qwen2_5_vl.configuration_qwen2_5_vl import (
        Qwen2_5_VLVisionConfig)
    hf = Qwen2_5_VLVisionConfig(
        depth=4, hidden_size=32, intermediate_size=64, num_heads=4,
        patch_size=4, temporal_patch_size=2, spatial_merge_size=2,
        window_size=16, fullatt_block_indexes=[1, 3], out_hidden_size=24,
        in_channels=3, hidden_act="silu")
    cfg = QwenVisionConfig(patch_size=4, temporal_patch_size=2,
                           hidden_size=32, depth=4, num_heads=4,
                           intermediate_size=64, out_hidden_size=24,
                           spatial_merge_size=2, window_size=16,
                           fullatt_block_indexes=(1, 3))
    return hf, cfg


def test_vision_tower_matches_hf_oracle():
    from transformers.models.qwen2_5_vl.modeling_qwen2_5_vl import (
        Qwen2_5_VisionTransformerPretrainedModel)
    hf_cfg, cfg = _tiny_cfgs()
    torch.manual_seed(0)
    model = Qwen2_5_VisionTransformerPretrainedModel._from_config(
        hf_cfg).eval()
    model.config._attn_implementation = "eager"

    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params, leftover = load_qwen_vision_params(sd, cfg)
    assert leftover == [], leftover[:6]

    rng = np.random.default_rng(0)
    h, w = 6, 8                       # patch grid (divisible by merge 2)
    patches = rng.standard_normal(
        (h * w, 3 * 2 * 4 * 4)).astype(np.float32)
    got = np.asarray(qwen_vision_forward(params, cfg,
                                         jnp.asarray(patches), (h, w)))
    with torch.no_grad():
        ref = model(torch.tensor(patches),
                    grid_thw=torch.tensor([[1, h, w]])).numpy()
    np.testing.assert_allclose(got, ref, rtol=3e-3, atol=3e-3)


def test_window_index_covers_all_units():
    _, cfg = _tiny_cfgs()
    order, seg = window_index((6, 8), cfg)
    assert sorted(order.tolist()) == list(range(6 * 8 // 4))
    assert seg.shape[0] == 6 * 8


def test_image_to_patches_shapes():
    _, cfg = _tiny_cfgs()
    img = np.random.default_rng(0).standard_normal(
        (24, 32, 3)).astype(np.float32)
    patches, grid = image_to_patches(img, cfg)
    assert grid == (6, 8)
    assert patches.shape == (48, 3 * 2 * 4 * 4)
