"""Wan DiT structural tests on a tiny config."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wan2gp_tpu.models.wan.dit import (
    WanDiTConfig, init_wan_dit, wan_dit_forward, patchify, unpatchify,
    sinusoidal_embedding_1d)
from wan2gp_tpu.ops.rope import build_rope_3d

TINY = WanDiTConfig(dim=96, ffn_dim=192, num_heads=4, num_layers=2,
                    freq_dim=32, text_dim=48, text_len=16)


def _inputs(cfg, b=1, f=4, h=8, w=8, seed=0):
    rng = np.random.default_rng(seed)
    latents = jnp.asarray(rng.standard_normal((b, cfg.in_dim, f, h, w)),
                          dtype=jnp.float32)
    t = jnp.full((b,), 500.0, dtype=jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((b, cfg.text_len, cfg.text_dim)),
                      dtype=jnp.float32)
    pt, ph, pw = cfg.patch_size
    cos, sin = build_rope_3d((f // pt, h // ph, w // pw),
                             head_dim=cfg.head_dim)
    return latents, t, ctx, cos, sin


def test_patchify_roundtrip():
    """patchify flattens features (c,pt,ph,pw) (torch Conv3d order) while
    unpatchify expects (pt,ph,pw,c) (reference model.py:2013 view order);
    round-trip requires the permutation in between."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 16, 4, 8, 10)), jnp.float32)
    tokens = patchify(x, (1, 2, 2))
    assert tokens.shape == (2, 4 * 4 * 5, 16 * 4)
    b, l, _ = tokens.shape
    reordered = tokens.reshape(b, l, 16, 1, 2, 2).transpose(0, 1, 3, 4, 5, 2)
    reordered = reordered.reshape(b, l, -1)
    back = unpatchify(reordered, (4, 4, 5), (1, 2, 2), 16)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_sinusoidal_embedding_matches_reference_formula():
    t = jnp.asarray([0.0, 500.0, 999.0])
    emb = np.asarray(sinusoidal_embedding_1d(8, t))
    pos = np.array([0.0, 500.0, 999.0])
    freqs = 10000.0 ** (-np.arange(4) / 4)
    sinusoid = np.outer(pos, freqs)
    expected = np.concatenate([np.cos(sinusoid), np.sin(sinusoid)], axis=1)
    np.testing.assert_allclose(emb, expected, rtol=1e-5)


def test_dit_forward_shape_and_finite():
    cfg = TINY
    params = init_wan_dit(jax.random.key(0), cfg)
    latents, t, ctx, cos, sin = _inputs(cfg)
    out = wan_dit_forward(params, cfg, latents, t, ctx, cos, sin,
                          attn_backend="xla")
    assert out.shape == (1, cfg.out_dim, 4, 8, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_dit_jit_compiles_and_is_deterministic():
    cfg = TINY
    params = init_wan_dit(jax.random.key(0), cfg)
    latents, t, ctx, cos, sin = _inputs(cfg)
    fwd = jax.jit(lambda p, x, tt, c: wan_dit_forward(
        p, cfg, x, tt, c, cos, sin, attn_backend="xla"))
    o1 = fwd(params, latents, t, ctx)
    o2 = fwd(params, latents, t, ctx)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))


def test_dit_cfg_batch_consistency():
    """Stacked batch entries must be independent (joint CFG pass safety)."""
    cfg = TINY
    params = init_wan_dit(jax.random.key(0), cfg)
    latents, t, ctx, cos, sin = _inputs(cfg, b=1)
    ctx2 = ctx + 1.0
    out_a = wan_dit_forward(params, cfg, latents, t, ctx, cos, sin,
                            attn_backend="xla")
    both = wan_dit_forward(
        params, cfg,
        jnp.concatenate([latents, latents]),
        jnp.concatenate([t, t]),
        jnp.concatenate([ctx, ctx2]), cos, sin, attn_backend="xla")
    np.testing.assert_allclose(np.asarray(both[0]), np.asarray(out_a[0]),
                               rtol=3e-3, atol=3e-3)
    assert np.abs(np.asarray(both[1]) - np.asarray(out_a[0])).max() > 1e-4


def test_dit_i2v_branch():
    cfg = WanDiTConfig(dim=96, ffn_dim=192, num_heads=4, num_layers=2,
                       freq_dim=32, text_dim=48, text_len=16,
                       model_type="i2v", in_dim=36)
    params = init_wan_dit(jax.random.key(1), cfg)
    rng = np.random.default_rng(3)
    latents = jnp.asarray(rng.standard_normal((1, 16, 4, 8, 8)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((1, 20, 4, 8, 8)), jnp.float32)
    t = jnp.full((1,), 300.0)
    ctx = jnp.asarray(rng.standard_normal((1, 16, 48)), jnp.float32)
    clip_fea = jnp.asarray(rng.standard_normal((1, 257, 1280)), jnp.float32)
    cos, sin = build_rope_3d((4, 4, 4), head_dim=cfg.head_dim)
    out = wan_dit_forward(params, cfg, latents, t, ctx, cos, sin,
                          clip_fea=clip_fea, y=y, attn_backend="xla")
    assert out.shape == (1, 16, 4, 8, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_dit_per_frame_timesteps():
    """Diffusion-forcing style: t of shape [B, F_lat] modulates per frame."""
    cfg = TINY
    params = init_wan_dit(jax.random.key(0), cfg)
    latents, _, ctx, cos, sin = _inputs(cfg)
    t_scalar = jnp.full((1,), 500.0)
    t_frames = jnp.full((1, 4), 500.0)
    o1 = wan_dit_forward(params, cfg, latents, t_scalar, ctx, cos, sin,
                         attn_backend="xla")
    o2 = wan_dit_forward(params, cfg, latents, t_frames, ctx, cos, sin,
                         attn_backend="xla")
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), rtol=2e-3,
                               atol=2e-3)
