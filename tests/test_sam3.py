"""SAM3 promptable segmentation tests (torch-oracle + e2e).

Oracles re-derive the reference formulas
(/root/reference/preprocessing/sam3/model/...) in torch and compare the
JAX implementations numerically.
"""
import math

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from wan2gp_tpu.preprocessing.sam3 import (Sam3Config, init_sam3,
                                           sam3_detect, Sam3ImagePredictor)
from wan2gp_tpu.preprocessing.sam3 import common as C
from wan2gp_tpu.preprocessing.sam3 import vit as V
from wan2gp_tpu.preprocessing.sam3.decoder import _rpb_bias, init_decoder
from wan2gp_tpu.preprocessing.sam3.geometry import _roi_align
from wan2gp_tpu.preprocessing.sam3.seg_head import (init_dot_scoring,
                                                    dot_scoring)

torch = pytest.importorskip("torch")
F = torch.nn.functional


def _np(x):
    return np.asarray(x)


# -- axial rope (vitdet.py compute_axial_cis / apply_rotary_enc) ------------

def _torch_axial_cis(dim, end_x, end_y, theta=1e4, scale=1.0):
    fx = 1.0 / (theta ** (torch.arange(0, dim, 4)[: dim // 4].float() / dim))
    t = torch.arange(end_x * end_y, dtype=torch.float32)
    tx, ty = (t % end_x) * scale, torch.div(
        t, end_x, rounding_mode="floor") * scale
    freqs = torch.cat([torch.outer(tx, fx), torch.outer(ty, fx)], -1)
    return torch.polar(torch.ones_like(freqs), freqs)


def test_rope_matches_torch():
    dim, ex, ey = 16, 3, 4
    cis = _torch_axial_cis(dim, ex, ey, scale=0.5)
    cos, sin = V.rope_freqs(dim, ex, ey, scale_pos=0.5)
    np.testing.assert_allclose(_np(cos), cis.real.numpy(), atol=1e-5)
    np.testing.assert_allclose(_np(sin), cis.imag.numpy(), atol=1e-5)

    x = torch.randn(2, 2, ex * ey, dim)
    xc = torch.view_as_complex(x.reshape(*x.shape[:-1], -1, 2))
    ref = torch.view_as_real(xc * cis[None, None]).flatten(3)
    out = V.apply_rope(jnp.asarray(x.numpy()), cos, sin)
    np.testing.assert_allclose(_np(out), ref.numpy(), atol=1e-5)


# -- sine encodings (position_encoding.py / model_misc.py) ------------------

def test_sine_grid_matches_torch():
    h, w, d = 5, 7, 16
    npf = d // 2
    y = torch.arange(1, h + 1).float().view(1, -1, 1).repeat(1, 1, w)
    x = torch.arange(1, w + 1).float().view(1, 1, -1).repeat(1, h, 1)
    y = y / (y[:, -1:, :] + 1e-6) * 2 * math.pi
    x = x / (x[:, :, -1:] + 1e-6) * 2 * math.pi
    dim_t = 10000.0 ** (2 * (torch.arange(npf).float() // 2) / npf)
    px = x[..., None] / dim_t
    py = y[..., None] / dim_t
    px = torch.stack((px[..., 0::2].sin(), px[..., 1::2].cos()),
                     -1).flatten(3)
    py = torch.stack((py[..., 0::2].sin(), py[..., 1::2].cos()),
                     -1).flatten(3)
    ref = torch.cat((py, px), 3)[0]
    out = C.sine_grid_pos(h, w, d)
    np.testing.assert_allclose(_np(out), ref.numpy(), atol=1e-5)


def test_query_sineembed_matches_torch():
    d = 32
    npf = d // 2
    pos = torch.rand(3, 5, 4)
    dim_t = 10000.0 ** (2 * (torch.arange(npf).float() // 2) / npf)

    def enc(v):
        e = (v * 2 * math.pi)[..., None] / dim_t
        return torch.stack((e[..., 0::2].sin(), e[..., 1::2].cos()),
                           -1).flatten(2)

    ref = torch.cat([enc(pos[..., 1]), enc(pos[..., 0]),
                     enc(pos[..., 2]), enc(pos[..., 3])], -1)
    out = C.gen_sineembed_for_position(jnp.asarray(pos.numpy()), d)
    np.testing.assert_allclose(_np(out), ref.numpy(), atol=1e-5)


# -- roi align (torchvision sampling_ratio=1, aligned=True) -----------------

def test_roi_align_matches_torchvision():
    tv = pytest.importorskip("torchvision")
    rng = np.random.default_rng(0)
    feat = rng.standard_normal((1, 6, 9, 11)).astype(np.float32)
    boxes = torch.tensor([[1.0, 1.5, 7.5, 6.0], [0.0, 0.0, 11.0, 9.0]])
    ref = tv.ops.roi_align(torch.from_numpy(feat), [boxes], output_size=3,
                           sampling_ratio=1, aligned=True)
    out = _roi_align(jnp.asarray(feat.transpose(0, 2, 3, 1)),
                     jnp.asarray(boxes.numpy())[None], 3)
    np.testing.assert_allclose(_np(out).transpose(0, 1, 4, 2, 3)[0],
                               ref.numpy(), atol=1e-4)


# -- boxRPB (decoder.py:337-415) --------------------------------------------

def test_rpb_bias_matches_torch():
    d_model, heads, h, w, q = 16, 4, 5, 6, 3
    params = init_decoder(jax.random.key(1), d_model, 32, heads,
                          num_layers=1, num_queries=q)
    ref_boxes = np.random.default_rng(0).uniform(
        0.2, 0.8, (2, q, 4)).astype(np.float32)

    def t_mlp(p, x):
        for i, lp in enumerate(p["layers"]):
            x = x @ torch.from_numpy(_np(lp["w"])) + torch.from_numpy(
                _np(lp["b"]))
            if i < len(p["layers"]) - 1:
                x = F.relu(x)
        return x

    bx = torch.from_numpy(ref_boxes)
    xyxy = torch.cat([bx[..., :2] - bx[..., 2:] / 2,
                      bx[..., :2] + bx[..., 2:] / 2], -1)
    ch = torch.arange(h).float() / h
    cw = torch.arange(w).float() / w
    dy = ch.view(1, -1, 1) - xyxy.reshape(-1, 1, 4)[:, :, 1:4:2]
    dy = dy.view(2, q, -1, 2)
    dx = cw.view(1, -1, 1) - xyxy.reshape(-1, 1, 4)[:, :, 0:3:2]
    dx = dx.view(2, q, -1, 2)

    def logmap(t):
        t = t * 8
        return torch.sign(t) * torch.log2(torch.abs(t) + 1.0) / np.log2(8)

    ex = t_mlp(params["rpb_x"], logmap(dx))
    ey = t_mlp(params["rpb_y"], logmap(dy))
    ref = (ey.unsqueeze(3) + ex.unsqueeze(2)).flatten(2, 3).permute(
        0, 3, 1, 2)
    out = _rpb_bias(params, jnp.asarray(ref_boxes), h, w)
    np.testing.assert_allclose(_np(out), ref.numpy(), atol=1e-4,
                               rtol=1e-4)


# -- dot product scoring (model_misc.py:751-805) ----------------------------

def test_dot_scoring_matches_torch():
    d = 16
    params = init_dot_scoring(jax.random.key(2), d, d)
    rng = np.random.default_rng(1)
    queries = rng.standard_normal((2, 4, d)).astype(np.float32)
    prompt = rng.standard_normal((2, 5, d)).astype(np.float32)
    pad = np.zeros((2, 5), bool)
    pad[1, 3:] = True

    def t_lin(p, x):
        return x @ torch.from_numpy(_np(p["w"])) + torch.from_numpy(
            _np(p["b"]))

    def t_mlp(p, x):
        for i, lp in enumerate(p["layers"]):
            x = t_lin(lp, x)
            if i < len(p["layers"]) - 1:
                x = F.relu(x)
        return x

    pt = torch.from_numpy(prompt)
    m = t_mlp(params["prompt_mlp"], pt)
    m = F.layer_norm(pt + m, (d,),
                     torch.from_numpy(_np(params["prompt_mlp_norm"]["scale"])),
                     torch.from_numpy(_np(params["prompt_mlp_norm"]["bias"])),
                     eps=1e-5)
    valid = torch.from_numpy(~pad).float()[..., None]
    pooled = (m * valid).sum(1) / valid.sum(1).clamp(min=1.0)
    pp = t_lin(params["prompt_proj"], pooled)
    qp = t_lin(params["hs_proj"], torch.from_numpy(queries))
    ref = (qp @ pp.unsqueeze(-1)).squeeze(-1) / math.sqrt(d)
    ref = ref.clamp(-12, 12)
    out = dot_scoring(params, jnp.asarray(queries), jnp.asarray(prompt),
                      jnp.asarray(pad))
    np.testing.assert_allclose(_np(out), ref.numpy(), atol=1e-4,
                               rtol=1e-4)


# -- end to end --------------------------------------------------------------

@pytest.fixture(scope="module")
def tiny():
    cfg = Sam3Config.tiny()
    params = init_sam3(jax.random.key(0), cfg)
    return cfg, params


def test_detect_shapes(tiny):
    cfg, params = tiny
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(size=(1, cfg.img_size, cfg.img_size, 3)),
                      jnp.float32)
    ids = jnp.zeros((1, 8), jnp.int32).at[0, :3].set(
        jnp.asarray([5, 9, 2]))
    out = sam3_detect(params, cfg, img, ids,
                      points=jnp.asarray([[[0.3, 0.4]]], jnp.float32),
                      point_labels=jnp.ones((1, 1), jnp.float32),
                      attn_backend="xla")
    q = cfg.num_queries
    s4 = cfg.img_size // 4 // (cfg.vit.patch_size // 4) \
        if False else out["masks"].shape[-1]
    assert out["masks"].shape[:2] == (1, q)
    assert out["boxes"].shape == (1, q, 4)
    assert out["scores"].shape == (1, q)
    assert np.isfinite(_np(out["masks"])).all()
    assert np.isfinite(_np(out["boxes"])).all()
    assert (_np(out["boxes"]) >= 0).all() and (_np(out["boxes"]) <= 1).all()


def test_detect_geometry_only(tiny):
    cfg, params = tiny
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(size=(1, cfg.img_size, cfg.img_size, 3)),
                      jnp.float32)
    out = sam3_detect(params, cfg, img, None,
                      boxes=jnp.asarray([[[0.5, 0.5, 0.4, 0.4]]],
                                        jnp.float32),
                      box_labels=jnp.ones((1, 1), jnp.float32),
                      attn_backend="xla")
    assert np.isfinite(_np(out["masks"])).all()
    assert np.isfinite(_np(out["scores"])).all()


def test_predictor_returns_masks(tiny):
    cfg, params = tiny
    rng = np.random.default_rng(2)
    pred = Sam3ImagePredictor(params, cfg, threshold=0.0,
                              attn_backend="xla")
    img = (rng.uniform(size=(60, 80, 3)) * 255).astype(np.uint8)
    out = pred(img, text="a red ball")
    assert out["masks"].dtype == bool
    assert out["masks"].shape[1:] == (60, 80)
    assert out["boxes"].shape[-1] == 4
    assert len(out["scores"]) == len(out["masks"]) >= 1
