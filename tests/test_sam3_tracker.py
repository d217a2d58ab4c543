"""SAM3 video tracker tests (torch-oracle + e2e).

Oracles re-derive the reference tracker formulas
(/root/reference/preprocessing/sam3/sam/*.py, model/memory.py,
model/sam3_tracker_*.py) in torch and compare numerically.
"""
import math

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from wan2gp_tpu.preprocessing.sam3 import Sam3Config, init_sam3
from wan2gp_tpu.preprocessing.sam3 import tracker as T
from wan2gp_tpu.preprocessing.sam3.video import (Sam3VideoPredictor,
                                                 run_sam3_video)

torch = pytest.importorskip("torch")
F = torch.nn.functional


def _np(x):
    return np.asarray(x)


# -- axial RoPE (sam/rope.py compute_axial_cis_real + real rotation) --------

def test_tracker_rope_matches_torch():
    dim, ex, ey = 16, 4, 4
    fx = 1.0 / (1e4 ** (torch.arange(0, dim, 4)[: dim // 4].float() / dim))
    t = torch.arange(ex * ey, dtype=torch.float32)
    tx, ty = t % ex, torch.div(t, ex, rounding_mode="floor")
    frx = torch.outer(tx, fx)
    fry = torch.outer(ty, fx)
    ref_cos = torch.cat([frx.cos(), fry.cos()], -1)
    ref_sin = torch.cat([frx.sin(), fry.sin()], -1)
    cos, sin = T.axial_rope_cos_sin(dim, ex, ey)
    np.testing.assert_allclose(_np(cos), ref_cos.numpy(), atol=1e-5)
    np.testing.assert_allclose(_np(sin), ref_sin.numpy(), atol=1e-5)

    # rotation (rope.py:151-162 _apply_rotary_enc_real_inplace)
    x = torch.randn(2, ex * ey, dim)
    xp = x.view(*x.shape[:-1], -1, 2)
    xr, xi = xp[..., 0].clone(), xp[..., 1].clone()
    or_ = xr * ref_cos - xi * ref_sin
    oi_ = xi * ref_cos + xr * ref_sin
    ref = torch.stack([or_, oi_], -1).flatten(-2)
    out = T.apply_rope(jnp.asarray(x.numpy()), cos, sin)
    np.testing.assert_allclose(_np(out), ref.numpy(), atol=1e-5)

    # repeat_freqs_k: keys spanning 3 memory frames
    k = torch.randn(2, 3 * ex * ey, dim)
    kp = k.view(2, 3, ex * ey, -1, 2)
    kr, kim = kp[..., 0].clone(), kp[..., 1].clone()
    or_ = kr * ref_cos - kim * ref_sin
    oi_ = kim * ref_cos + kr * ref_sin
    ref = torch.stack([or_, oi_], -1).reshape(2, 3 * ex * ey, dim)
    out = T.apply_rope(jnp.asarray(k.numpy()), cos, sin, repeat=3)
    np.testing.assert_allclose(_np(out), ref.numpy(), atol=1e-5)


# -- random-fourier point PE (sam/prompt_encoder.py:202-247) ----------------

def test_random_pe_matches_torch():
    cfg = T.TrackerConfig.tiny()
    p = T.init_prompt_encoder(jax.random.PRNGKey(0), cfg)
    gauss = torch.from_numpy(_np(p["pe_gauss"]))

    def ref_pe(coords):
        c = 2 * coords - 1
        c = c @ gauss
        c = 2 * np.pi * c
        return torch.cat([torch.sin(c), torch.cos(c)], dim=-1)

    # grid PE
    e = 6
    grid = torch.ones((e, e))
    y = (grid.cumsum(0) - 0.5) / e
    x = (grid.cumsum(1) - 0.5) / e
    ref = ref_pe(torch.stack([x, y], dim=-1))
    out = T.dense_pe(p, e)
    np.testing.assert_allclose(_np(out), ref.numpy(), atol=1e-5)

    # point PE with labels (prompt_encoder.py:76-118; pad appended)
    pts = torch.rand(2, 3, 2) * cfg.image_size
    labs = torch.tensor([[1, 0, 1], [0, 1, -1]], dtype=torch.float32)
    pts_pad = torch.cat([pts, torch.zeros(2, 1, 2)], 1)
    labs_pad = torch.cat([labs, -torch.ones(2, 1)], 1)
    coords = (pts_pad + 0.5) / cfg.image_size
    emb = ref_pe(coords)
    not_a = torch.from_numpy(_np(p["not_a_point"]))
    pe0 = torch.from_numpy(_np(p["point_embed"][0]))
    pe1 = torch.from_numpy(_np(p["point_embed"][1]))
    lab = labs_pad[..., None]
    emb = torch.where(lab == -1, not_a.expand_as(emb), emb)
    emb = torch.where(lab == 0, emb + pe0, emb)
    emb = torch.where(lab == 1, emb + pe1, emb)
    sparse, dense = T.prompt_encode(
        p, cfg, jnp.asarray(pts.numpy()), jnp.asarray(labs.numpy()))
    np.testing.assert_allclose(_np(sparse), emb.numpy(), atol=1e-5)
    # no mask input -> broadcast no_mask embed
    assert dense.shape == (2, cfg.embed_size, cfg.embed_size, cfg.d_model)
    np.testing.assert_allclose(
        _np(dense[0, 0, 0]), _np(p["no_mask"]), atol=1e-6)


# -- CXBlock fuser (model/memory.py:84-139) ---------------------------------

def test_cxblock_matches_torch():
    cfg = T.TrackerConfig.tiny()
    d = cfg.d_model
    p = T.init_memory_encoder(jax.random.PRNGKey(1), cfg)
    blk = p["fuser"][0]
    x = torch.randn(2, d, 9, 9)

    w_dw = torch.from_numpy(_np(blk["dw"]["w"]))  # [7,7,1,d] HWIO grouped
    # torch depthwise conv weight layout: [d, 1, 7, 7]
    w_t = w_dw.permute(3, 2, 0, 1)
    y = F.conv2d(x, w_t, torch.from_numpy(_np(blk["dw"]["b"])),
                 padding=3, groups=d)
    y = y.permute(0, 2, 3, 1)
    y = F.layer_norm(y, (d,), torch.from_numpy(_np(blk["ln"]["scale"])),
                     torch.from_numpy(_np(blk["ln"]["bias"])), eps=1e-6)
    y = y @ torch.from_numpy(_np(blk["pw1"]["w"])) + torch.from_numpy(
        _np(blk["pw1"]["b"]))
    y = F.gelu(y)
    y = y @ torch.from_numpy(_np(blk["pw2"]["w"])) + torch.from_numpy(
        _np(blk["pw2"]["b"]))
    ref = x.permute(0, 2, 3, 1) + torch.from_numpy(_np(blk["gamma"])) * y

    xj = jnp.asarray(x.permute(0, 2, 3, 1).numpy())
    yj = T._conv(xj, blk["dw"], groups=d)
    from wan2gp_tpu.preprocessing.sam3.common import ln, linear
    yj = ln(yj, blk["ln"], eps=1e-6)
    yj = linear(jax.nn.gelu(linear(yj, blk["pw1"]), approximate=False),
                blk["pw2"])
    outj = xj + blk["gamma"] * yj
    np.testing.assert_allclose(_np(outj), ref.numpy(), atol=1e-4,
                               rtol=1e-4)


# -- mask downsampler (model/memory.py:15-81) -------------------------------

def test_mask_downsampler_matches_torch():
    cfg = T.TrackerConfig.tiny()
    p = T.init_memory_encoder(jax.random.PRNGKey(2), cfg)
    m = torch.randn(1, 1, 32, 32)
    y = m
    for st in p["downs"]:
        w = torch.from_numpy(_np(st["conv"]["w"])).permute(3, 2, 0, 1)
        y = F.conv2d(y, w, torch.from_numpy(_np(st["conv"]["b"])),
                     stride=2, padding=1)
        # LayerNorm2d = per-token LN over channels
        yt = y.permute(0, 2, 3, 1)
        yt = F.layer_norm(yt, (y.shape[1],),
                          torch.from_numpy(_np(st["ln"]["scale"])),
                          torch.from_numpy(_np(st["ln"]["bias"])))
        y = F.gelu(yt).permute(0, 3, 1, 2)
    w = torch.from_numpy(_np(p["down_proj"]["w"])).permute(3, 2, 0, 1)
    ref = F.conv2d(y, w, torch.from_numpy(_np(p["down_proj"]["b"])))

    from wan2gp_tpu.preprocessing.sam3.common import ln
    yj = jnp.asarray(m.permute(0, 2, 3, 1).numpy())
    for st in p["downs"]:
        yj = jax.nn.gelu(ln(T._conv(yj, st["conv"], stride=2,
                                    padding=((1, 1), (1, 1))), st["ln"]),
                         approximate=False)
    outj = T._conv(yj, p["down_proj"])
    np.testing.assert_allclose(_np(outj), ref.permute(0, 2, 3, 1).numpy(),
                               atol=1e-4, rtol=1e-4)


# -- stability scores + 1d sine pe ------------------------------------------

def test_stability_scores_matches_torch():
    logits = torch.randn(3, 1, 8, 8) * 0.2
    delta = 0.05
    flat = logits.flatten(-2)
    ai = (flat > delta).sum(-1).float()
    au = (flat > -delta).sum(-1).float()
    ref = torch.where(au > 0, ai / au, torch.ones_like(ai))
    out = T._stability_scores(jnp.asarray(logits.numpy()), delta)
    np.testing.assert_allclose(_np(out), ref.numpy(), atol=1e-6)


def test_sine_1d_matches_torch():
    dim = 32
    pos = torch.rand(5)
    pe_dim = dim // 2
    dim_t = 1e4 ** (2 * (torch.arange(pe_dim).float() // 2) / pe_dim)
    e = pos[:, None] / dim_t
    ref = torch.cat([e.sin(), e.cos()], -1)
    out = T._sine_1d(jnp.asarray(pos.numpy()), dim)
    np.testing.assert_allclose(_np(out), ref.numpy(), atol=1e-5)


# -- two-way attention block (sam/transformer.py:110-194) -------------------

def test_twoway_block_matches_torch():
    cfg = T.TrackerConfig.tiny()
    d, h = cfg.d_model, cfg.twoway_heads
    p = T.init_mask_decoder(jax.random.PRNGKey(3), cfg)
    layer = p["layers"][1]          # non-first layer (with PE)

    def t_lin(x, lp):
        return x @ torch.from_numpy(_np(lp["w"])) + torch.from_numpy(
            _np(lp["b"]))

    def t_attn(ap, q, k, v, heads):
        qh, kh, vh = t_lin(q, ap["q"]), t_lin(k, ap["k"]), t_lin(v, ap["v"])
        b, lq, di = qh.shape
        hd = di // heads
        qh = qh.view(b, lq, heads, hd).transpose(1, 2)
        kh = kh.view(b, -1, heads, hd).transpose(1, 2)
        vh = vh.view(b, -1, heads, hd).transpose(1, 2)
        o = F.scaled_dot_product_attention(qh, kh, vh)
        o = o.transpose(1, 2).reshape(b, lq, di)
        return t_lin(o, ap["o"])

    def t_ln(x, lp):
        return F.layer_norm(x, (x.shape[-1],),
                            torch.from_numpy(_np(lp["scale"])),
                            torch.from_numpy(_np(lp["bias"])))

    q0 = torch.randn(1, 5, d)
    k0 = torch.randn(1, 12, d)
    qpe = torch.randn(1, 5, d)
    kpe = torch.randn(1, 12, d)
    # reference TwoWayAttentionBlock.forward (non-first layer)
    a = q0 + qpe
    q = q0 + t_attn(layer["self"], a, a, q0, h)
    q = t_ln(q, layer["norm1"])
    q = q + t_attn(layer["cross_t2i"], q + qpe, k0 + kpe, k0, h)
    q = t_ln(q, layer["norm2"])
    q = q + t_lin(F.relu(t_lin(q, layer["mlp_in"])), layer["mlp_out"])
    q = t_ln(q, layer["norm3"])
    k = k0 + t_attn(layer["cross_i2t"], k0 + kpe, q + qpe, q, h)
    k = t_ln(k, layer["norm4"])

    # drive my _twoway with layers [first, this] and extract after
    # reproducing by direct calls
    from wan2gp_tpu.preprocessing.sam3.common import ln as jln
    qj = jnp.asarray(q0.numpy())
    kj = jnp.asarray(k0.numpy())
    qpej = jnp.asarray(qpe.numpy())
    kpej = jnp.asarray(kpe.numpy())
    aj = qj + qpej
    qj = qj + T._attn(layer["self"], aj, aj, qj)
    qj = jln(qj, layer["norm1"])
    qj = qj + T._attn(layer["cross_t2i"], qj + qpej, kj + kpej, kj)
    qj = jln(qj, layer["norm2"])
    from wan2gp_tpu.preprocessing.sam3.common import linear as jlinear
    qj = qj + jlinear(jax.nn.relu(jlinear(qj, layer["mlp_in"])),
                      layer["mlp_out"])
    qj = jln(qj, layer["norm3"])
    kj = kj + T._attn(layer["cross_i2t"], kj + kpej, qj + qpej, qj)
    kj = jln(kj, layer["norm4"])
    np.testing.assert_allclose(_np(qj), q.numpy(), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(_np(kj), k.numpy(), atol=1e-4, rtol=1e-4)


# -- e2e --------------------------------------------------------------------

@pytest.fixture(scope="module")
def predictor():
    cfg = Sam3Config.tiny()
    params = init_sam3(jax.random.key(0), cfg)
    return Sam3VideoPredictor(params, cfg, threshold=0.0, max_objects=2,
                              attn_backend="xla")


def test_cond_frame_reproduces_mask(predictor):
    """Frame-0 masks pass through _use_mask_as_output unchanged
    (sam3_tracker_base.py:388-400: ±10 logits from the input mask)."""
    rng = np.random.default_rng(3)
    video = (rng.uniform(size=(2, 56, 56, 3)) * 255).astype(np.uint8)
    m0 = np.zeros((1, 56, 56), bool)
    m0[0, 10:30, 14:40] = True
    res = predictor.segment_video(video, frame0_masks=m0)
    assert res["masks"].shape == (1, 2, 56, 56)
    iou = (res["masks"][0, 0] & m0[0]).sum() / (
        (res["masks"][0, 0] | m0[0]).sum() + 1e-6)
    assert iou > 0.95, iou


def test_segment_video_text(predictor):
    rng = np.random.default_rng(4)
    video = (rng.uniform(size=(3, 48, 64, 3)) * 255).astype(np.uint8)
    res = predictor.segment_video(video, text="a cat")
    n = res["masks"].shape[0]
    assert res["masks"].shape == (n, 3, 48, 64)
    assert res["masks"].dtype == bool
    assert len(res["scores"]) == n


def test_run_sam3_video_union_and_empty(predictor):
    rng = np.random.default_rng(5)
    video = (rng.uniform(size=(2, 40, 40, 3)) * 255).astype(np.uint8)
    out = run_sam3_video(video, ["thing"], predictor)
    assert out.shape == (2, 40, 40) and out.dtype == bool
    empty = run_sam3_video(video, ["", "  "], predictor)
    assert empty.shape == (2, 40, 40) and not empty.any()
    col = run_sam3_video(video, ["thing"], predictor,
                         colorize_objects=True)
    assert col.shape == (2, 40, 40, 3) and col.dtype == np.uint8


def test_sam3_masks_drive_vace_inpaint(predictor):
    """The mask-creation workflow: text-prompted SAM3 video masks feed
    VACE inpainting (reference: preprocessor.run_sam3_video output used
    as the video mask in wgp's VACE mask modes)."""
    from wan2gp_tpu.models.wan.dit import WanDiTConfig, init_wan_dit
    from wan2gp_tpu.models.wan.vae import WanVAEConfig, init_wan_vae
    from wan2gp_tpu.models.wan.pipeline import WanPipeline, SamplingConfig

    rng = np.random.default_rng(6)
    video = (rng.uniform(size=(5, 32, 32, 3)) * 255).astype(np.uint8)
    sam_masks = run_sam3_video(video, ["the subject"], predictor)
    assert sam_masks.shape == (5, 32, 32) and sam_masks.dtype == bool

    vace_cfg = WanDiTConfig(dim=32, ffn_dim=64, num_heads=4, num_layers=4,
                            freq_dim=16, text_dim=16, text_len=4,
                            vace=True, vace_in_dim=96)
    vae_cfg = WanVAEConfig(dim=8, num_res_blocks=1)
    pipe = WanPipeline(init_wan_dit(jax.random.key(0), vace_cfg), vace_cfg,
                       vae_params=init_wan_vae(jax.random.key(1), vae_cfg),
                       vae_cfg=vae_cfg, attn_backend="xla")
    frames = np.asarray(video, np.float32) / 127.5 - 1.0
    ctx = jnp.asarray(rng.standard_normal((1, 4, 16)), jnp.float32)
    out = pipe.generate_vace(
        "x", frames, masks=sam_masks.astype(np.float32),
        sampling=SamplingConfig(solver="euler", steps=2, guide_scale=1.0),
        seed=0, context=ctx)
    assert out.shape == (5, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()
