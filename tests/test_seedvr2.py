"""SeedVR2 one-step diffusion VSR tests (reference
/root/reference/postprocessing/seedvr2/)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from wan2gp_tpu.postprocessing.seedvr2 import (
    SeedVR2Config, init_seedvr2, seedvr2_upscale, seedvr2_dit_forward,
    seedvr2_vae_encode, seedvr2_vae_decode, make_720p_windows,
    wavelet_low, wavelet_color_fix, _pad_4n1)

torch = pytest.importorskip("torch")
F = torch.nn.functional


@pytest.fixture(scope="module")
def sv():
    cfg = SeedVR2Config.tiny()
    return cfg, init_seedvr2(jax.random.key(0), cfg, txt_len=4)


def test_windows_partition_cover_exactly():
    """Both window ops tile the token grid exactly once
    (window.py:28-83)."""
    for shifted in (False, True):
        for size in ((5, 12, 16), (1, 7, 9), (30, 45, 80)):
            wins = make_720p_windows(size, (4, 3, 3), shifted)
            cover = np.zeros(size, np.int32)
            for st, sh, sw in wins:
                cover[st, sh, sw] += 1
            assert (cover == 1).all(), (shifted, size)


def test_wavelet_low_matches_torch():
    """Multi-radius low-pass (runtime.py:119-126)."""
    rng = np.random.default_rng(0)
    img = rng.standard_normal((2, 24, 24, 3)).astype(np.float32)
    x = torch.from_numpy(img.transpose(0, 3, 1, 2))
    kernel = x.new_tensor([[0.0625, 0.125, 0.0625],
                           [0.125, 0.25, 0.125],
                           [0.0625, 0.125, 0.0625]]
                          ).view(1, 1, 3, 3).repeat(3, 1, 1, 1)
    for radius in (1, 2, 4, 8, 16):
        radius = min(radius, max(1, min(x.shape[-2:]) // 8))
        x = F.conv2d(F.pad(x, (radius,) * 4, mode="replicate"), kernel,
                     groups=3, dilation=radius)
    ref = x.numpy().transpose(0, 2, 3, 1)
    out = wavelet_low(jnp.asarray(img))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5,
                               rtol=1e-4)


def test_wavelet_color_fix_transfers_low_band():
    rng = np.random.default_rng(1)
    dec = rng.uniform(-1, 1, (1, 24, 24, 3)).astype(np.float32)
    style = np.full((1, 24, 24, 3), 0.5, np.float32)
    fixed = np.asarray(wavelet_color_fix(jnp.asarray(dec),
                                         jnp.asarray(style)))
    # the fixed video's low band tracks the style's mean
    assert abs(fixed.mean() - 0.5) < abs(dec.mean() - 0.5) + 1e-6


def test_pad_4n1():
    for t, expect in ((5, 5), (4, 5), (6, 9), (1, 1), (9, 9)):
        v = jnp.zeros((t, 2, 2, 3))
        assert _pad_4n1(v).shape[0] == expect


def test_vae_roundtrip_shapes(sv):
    cfg, params = sv
    vid = jnp.asarray(np.random.default_rng(2).uniform(
        -1, 1, (5, 16, 16, 3)), jnp.float32)
    lat = seedvr2_vae_encode(params["vae"], cfg, vid)
    # tiny: 1 spatial/temporal downsample stage
    assert lat.shape == (3, 8, 8, cfg.latent_channels)
    dec = seedvr2_vae_decode(params["vae"], cfg, lat)
    assert dec.shape == (5, 16, 16, 3)
    assert np.isfinite(np.asarray(dec)).all()


def test_dit_one_step_prediction(sv):
    cfg, params = sv
    rng = np.random.default_rng(3)
    tokens = jnp.asarray(rng.standard_normal(
        (2, 4, 4, cfg.vid_in_channels * 4)), jnp.float32)
    out = seedvr2_dit_forward(params["dit"], cfg, tokens,
                              params["positive_embedding"], 1000.0)
    assert out.shape == (2, 4, 4, cfg.vid_out_channels * 4)
    assert np.isfinite(np.asarray(out)).all()
    # timestep matters (AdaSingle modulation)
    out2 = seedvr2_dit_forward(params["dit"], cfg, tokens,
                               params["positive_embedding"], 0.0)
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_upscale_end_to_end(sv):
    cfg, params = sv
    vid = (np.random.default_rng(4).uniform(size=(5, 24, 32, 3))
           * 255).astype(np.uint8)
    out = seedvr2_upscale(params, cfg, vid, scale=2.0, seed=1)
    assert out.shape == (5, 48, 64, 3) and out.dtype == np.uint8
    # deterministic
    out2 = seedvr2_upscale(params, cfg, vid, scale=2.0, seed=1)
    np.testing.assert_array_equal(out, out2)


def test_upscale_windows_crossfade(sv):
    cfg, params = sv
    vid = (np.random.default_rng(5).uniform(size=(7, 16, 16, 3))
           * 255).astype(np.uint8)
    out = seedvr2_upscale(params, cfg, vid, scale=1.0, window_size=4,
                          window_overlap=2)
    assert out.shape == (7, 16, 16, 3)


def test_service_spatial_upsampling_seedvr2(sv):
    cfg, params = sv
    from wan2gp_tpu.runtime.service import _apply_spatial_upsampling
    vid = np.random.default_rng(6).uniform(-1, 1, (5, 16, 16, 3)
                                           ).astype(np.float32)
    out = _apply_spatial_upsampling(
        vid, {"spatial_upsampling": "seedvr2x2", "seed": 1,
              "_seedvr2_params": params, "_seedvr2_cfg": cfg})
    assert out.shape == (5, 32, 32, 3) and out.dtype == np.uint8
