"""SAM3 video tracker — SAM2-style memory propagation, TPU-native.

Re-expresses the reference tracker stack in JAX with static shapes:

* SAM prompt encoder (preprocessing/sam3/sam/prompt_encoder.py:14-199):
  random-fourier point PE, 4 point-type embeddings + not-a-point, mask
  downscaling convs, no-mask embedding.
* SAM mask decoder (sam/mask_decoder.py:14-295): obj-score/IoU/mask
  tokens, TwoWayTransformer (sam/transformer.py:17-110, depth 2,
  attention downsample 2), output upscaling with high-res skips
  (conv_s0/conv_s1), hypernetwork MLPs, sigmoid IoU head, object-score
  MLP, dynamic multimask-via-stability fallback.
* Memory encoder (model/memory.py:15-213 SimpleMaskEncoder): strided
  mask downsampler (stride-2 convs to total stride 16), ConvNeXt
  (CXBlock) fuser, 1x1 out-projection to mem_dim=64.
* Memory attention (model/decoder.py:620-995
  TransformerEncoderCrossAttention of TransformerDecoderLayerv2 +
  sam/transformer.py:274-360 RoPEAttention): 4 pre-norm layers of
  axial-RoPE self-attention over the current frame plus cross-attention
  to spatial memories (RoPE repeated per memory frame) and object
  pointers (excluded from RoPE), with sine temporal position encodings
  (model/sam3_tracker_base.py:559-795).
* Per-frame step semantics (model/sam3_tracker_base.py:929-1104
  track_step, :217-435 _forward_sam_heads/_use_mask_as_output,
  :796-850 _encode_new_memory).

The memory bank is held as fixed-capacity arrays (slots + validity
masks) so the per-frame step compiles once; the host loop only decides
which past frames fill the slots (reference's dynamic python dict,
sam3_tracker_base.py:591-650).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .common import init_linear, linear, init_ln, ln, init_mlp, mlp, \
    sine_grid_pos

NO_OBJ_SCORE = -1024.0  # sam3_tracker_base.py:23


# ---------------------------------------------------------------------------
# config
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class TrackerConfig:
    d_model: int = 256
    image_size: int = 1008
    backbone_stride: int = 14
    num_maskmem: int = 7          # 1 cond + 6 previous frames
    mem_dim: int = 64
    max_obj_ptrs: int = 16
    mem_layers: int = 4
    mem_ffn: int = 2048
    mask_in_chans: int = 16
    num_multimask: int = 3
    twoway_depth: int = 2
    twoway_heads: int = 8
    twoway_mlp: int = 2048
    max_cond_frames: int = 4
    memory_stride: int = 1        # memory_temporal_stride_for_eval
    stability_delta: float = 0.05
    stability_thresh: float = 0.98
    sigmoid_scale_mem: float = 20.0
    sigmoid_bias_mem: float = -10.0
    rope_theta: float = 10000.0
    compute_dtype: Any = jnp.float32

    @property
    def embed_size(self) -> int:
        return self.image_size // self.backbone_stride

    @property
    def low_res_size(self) -> int:
        return self.embed_size * 4

    @classmethod
    def tiny(cls):
        return cls(d_model=32, image_size=112, backbone_stride=14,
                   mem_dim=8, max_obj_ptrs=4, mem_layers=2, mem_ffn=64,
                   mask_in_chans=8, twoway_heads=4, twoway_mlp=64,
                   num_maskmem=3)


# ---------------------------------------------------------------------------
# small conv helpers (NHWC)
# ---------------------------------------------------------------------------

def _init_conv(key, kh, kw, cin, cout, dtype, std=0.02):
    return {"w": (jax.random.normal(key, (kh, kw, cin, cout), jnp.float32)
                  * std).astype(dtype),
            "b": jnp.zeros((cout,), dtype)}


def _conv(x, p, stride=1, padding="SAME", groups=1):
    y = jax.lax.conv_general_dilated(
        x, p["w"], (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups)
    return y + p["b"]


def _deconv2x(x, p):
    y = jax.lax.conv_transpose(
        x, p["w"], (2, 2), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + p["b"]


def _resize(x, h, w, antialias=False):
    """Bilinear resize on NHWC (F.interpolate align_corners=False)."""
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[3]),
                            method="bilinear", antialias=antialias)


# ---------------------------------------------------------------------------
# axial RoPE (sam/rope.py compute_axial_cis_real / apply_rotary_enc_real)
# ---------------------------------------------------------------------------

def axial_rope_cos_sin(dim: int, end_x: int, end_y: int,
                       theta: float = 10000.0):
    """[end_x*end_y, dim//2] (cos, sin); x varies fastest
    (rope.py:19-23 init_t_xy)."""
    n = dim // 4
    freqs = 1.0 / (theta ** (np.arange(0, dim, 4, dtype=np.float32)[:n]
                             / dim))
    t = np.arange(end_x * end_y, dtype=np.float32)
    t_x, t_y = t % end_x, np.floor(t / end_x)
    fx = np.outer(t_x, freqs)
    fy = np.outer(t_y, freqs)
    cos = np.concatenate([np.cos(fx), np.cos(fy)], axis=-1)
    sin = np.concatenate([np.sin(fx), np.sin(fy)], axis=-1)
    return jnp.asarray(cos), jnp.asarray(sin)


def apply_rope(x, cos, sin, repeat: int = 1):
    """x: [..., L, D]; cos/sin [L0, D//2] with L = repeat * L0.
    Consecutive channel pairs rotate (rope.py:177-197 inplace real)."""
    if repeat > 1:
        cos = jnp.tile(cos, (repeat, 1))
        sin = jnp.tile(sin, (repeat, 1))
    xr = x[..., 0::2]
    xi = x[..., 1::2]
    or_ = xr * cos - xi * sin
    oi_ = xi * cos + xr * sin
    return jnp.stack([or_, oi_], axis=-1).reshape(x.shape)


# ---------------------------------------------------------------------------
# SAM prompt encoder
# ---------------------------------------------------------------------------

def init_prompt_encoder(key, cfg: TrackerConfig, dtype=jnp.float32):
    d, mic = cfg.d_model, cfg.mask_in_chans
    keys = jax.random.split(key, 8)
    return {
        "pe_gauss": jax.random.normal(keys[0], (2, d // 2), jnp.float32
                                      ).astype(dtype),
        # 0=neg point, 1=pos point, 2=box tl, 3=box br
        "point_embed": (jax.random.normal(keys[1], (4, d)) * 0.02
                        ).astype(dtype),
        "not_a_point": (jax.random.normal(keys[2], (d,)) * 0.02
                        ).astype(dtype),
        "no_mask": (jax.random.normal(keys[3], (d,)) * 0.02).astype(dtype),
        "mask_conv1": _init_conv(keys[4], 2, 2, 1, mic // 4, dtype),
        "mask_ln1": init_ln(mic // 4, dtype),
        "mask_conv2": _init_conv(keys[5], 2, 2, mic // 4, mic, dtype),
        "mask_ln2": init_ln(mic, dtype),
        "mask_conv3": _init_conv(keys[6], 1, 1, mic, d, dtype),
    }


def _random_pe(p, coords01):
    """coords01 [..., 2] in [0,1] -> [..., d] (prompt_encoder.py:216-223)."""
    c = 2.0 * coords01 - 1.0
    c = c @ p["pe_gauss"]
    c = 2.0 * np.pi * c
    return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1)


def dense_pe(p, size: int):
    """[size, size, d] grid PE (prompt_encoder.py:225-236)."""
    r = (jnp.arange(size, dtype=jnp.float32) + 0.5) / size
    gy = jnp.broadcast_to(r[:, None], (size, size))
    gx = jnp.broadcast_to(r[None, :], (size, size))
    return _random_pe(p, jnp.stack([gx, gy], axis=-1))


def prompt_encode(p, cfg: TrackerConfig, points=None, point_labels=None,
                  mask_input=None, batch: int = 1):
    """points [B,P,2] pixel xy; labels [B,P] (1 pos, 0 neg, -1 pad,
    2/3 box corners); mask_input [B,h,w,1] logits at any size (resized
    to 4*embed).  Returns sparse [B,N,d], dense [B,e,e,d]."""
    e, d = cfg.embed_size, cfg.d_model
    if points is not None:
        batch = points.shape[0]
    elif mask_input is not None:
        batch = mask_input.shape[0]
    if points is not None:
        # pad with one (0,0)/-1 point as the reference always does
        # (prompt_encoder.py:84-89 pad=True when no boxes)
        b = points.shape[0]
        pts = jnp.concatenate(
            [points, jnp.zeros((b, 1, 2), points.dtype)], axis=1)
        lab = jnp.concatenate(
            [point_labels, -jnp.ones((b, 1), point_labels.dtype)], axis=1)
        pts = (pts + 0.5) / cfg.image_size             # pixel centers
        emb = _random_pe(p, pts)
        lab = lab[..., None]
        emb = jnp.where(lab == -1, p["not_a_point"], emb)
        for i in range(4):
            emb = jnp.where(lab == i, emb + p["point_embed"][i], emb)
        sparse = emb
    else:
        # a single padding point (sam3_tracker_base.py:278-281)
        sparse = jnp.broadcast_to(p["not_a_point"], (batch, 1, d))
    if mask_input is not None:
        m = mask_input
        if m.shape[1] != 4 * e or m.shape[2] != 4 * e:
            m = _resize(m.astype(jnp.float32), 4 * e, 4 * e,
                        antialias=True).astype(m.dtype)
        y = jax.nn.gelu(ln(_conv(m, p["mask_conv1"], stride=2),
                           p["mask_ln1"]), approximate=False)
        y = jax.nn.gelu(ln(_conv(y, p["mask_conv2"], stride=2),
                           p["mask_ln2"]), approximate=False)
        dense = _conv(y, p["mask_conv3"])
    else:
        dense = jnp.broadcast_to(p["no_mask"], (batch, e, e, d))
    return sparse, dense


# ---------------------------------------------------------------------------
# SAM two-way mask decoder
# ---------------------------------------------------------------------------

def _init_attn(key, d, heads, ds=1, kv_dim=None, dtype=jnp.float32):
    kv = kv_dim if kv_dim is not None else d
    di = d // ds
    keys = jax.random.split(key, 4)
    return {"q": init_linear(keys[0], d, di, dtype),
            "k": init_linear(keys[1], kv, di, dtype),
            "v": init_linear(keys[2], kv, di, dtype),
            "o": init_linear(keys[3], di, d, dtype),
            "heads": heads}


def _attn(p, q, k, v):
    """sam/transformer.py:236-271 Attention (no mask)."""
    heads = p["heads"]
    qh = linear(q, p["q"])
    kh = linear(k, p["k"])
    vh = linear(v, p["v"])
    b, lq, di = qh.shape
    lk = kh.shape[1]
    hd = di // heads
    qh = qh.reshape(b, lq, heads, hd).transpose(0, 2, 1, 3)
    kh = kh.reshape(b, lk, heads, hd).transpose(0, 2, 1, 3)
    vh = vh.reshape(b, lk, heads, hd).transpose(0, 2, 1, 3)
    w = jax.nn.softmax(
        jnp.einsum("bhld,bhsd->bhls", qh, kh).astype(jnp.float32)
        / math.sqrt(hd), axis=-1).astype(qh.dtype)
    out = jnp.einsum("bhls,bhsd->bhld", w, vh)
    out = out.transpose(0, 2, 1, 3).reshape(b, lq, di)
    return linear(out, p["o"])


def init_mask_decoder(key, cfg: TrackerConfig, dtype=jnp.float32):
    d, h = cfg.d_model, cfg.twoway_heads
    nm = cfg.num_multimask + 1
    keys = jax.random.split(key, 24)
    ki = iter(keys)
    layers = []
    for _ in range(cfg.twoway_depth):
        layers.append({
            "self": _init_attn(next(ki), d, h, dtype=dtype),
            "norm1": init_ln(d, dtype),
            "cross_t2i": _init_attn(next(ki), d, h, ds=2, dtype=dtype),
            "norm2": init_ln(d, dtype),
            "mlp_in": init_linear(next(ki), d, cfg.twoway_mlp, dtype),
            "mlp_out": init_linear(next(ki), cfg.twoway_mlp, d, dtype),
            "norm3": init_ln(d, dtype),
            "cross_i2t": _init_attn(next(ki), d, h, ds=2, dtype=dtype),
            "norm4": init_ln(d, dtype),
        })
    return {
        "obj_token": (jax.random.normal(next(ki), (d,)) * 0.02
                      ).astype(dtype),
        "iou_token": (jax.random.normal(next(ki), (d,)) * 0.02
                      ).astype(dtype),
        "mask_tokens": (jax.random.normal(next(ki), (nm, d)) * 0.02
                        ).astype(dtype),
        "layers": layers,
        "final_attn": _init_attn(next(ki), d, h, ds=2, dtype=dtype),
        "norm_final": init_ln(d, dtype),
        "up1": _init_conv(next(ki), 2, 2, d, d // 4, dtype),
        "up_ln": init_ln(d // 4, dtype),
        "up2": _init_conv(next(ki), 2, 2, d // 4, d // 8, dtype),
        "conv_s0": _init_conv(next(ki), 1, 1, d, d // 8, dtype),
        "conv_s1": _init_conv(next(ki), 1, 1, d, d // 4, dtype),
        "hyper": [init_mlp(next(ki), d, d, d // 8, 3, dtype)
                  for _ in range(nm)],
        "iou_head": init_mlp(next(ki), d, 256 if d >= 256 else d, nm, 3,
                             dtype),
        "obj_head": init_mlp(next(ki), d, d, 1, 3, dtype),
    }


def _twoway(p, tokens, img, img_pe):
    """TwoWayTransformer (sam/transformer.py:63-110).
    tokens [B,N,d]; img/img_pe [B,HW,d]."""
    q, k = tokens, img
    for i, layer in enumerate(p["layers"]):
        if i == 0:
            # skip_first_layer_pe: attention output REPLACES the queries
            q = _attn(layer["self"], q, q, q)
        else:
            a = q + tokens
            q = q + _attn(layer["self"], a, a, q)
        q = ln(q, layer["norm1"])
        q = q + _attn(layer["cross_t2i"], q + tokens, k + img_pe, k)
        q = ln(q, layer["norm2"])
        q = q + linear(jax.nn.relu(linear(q, layer["mlp_in"])),
                       layer["mlp_out"])
        q = ln(q, layer["norm3"])
        k = k + _attn(layer["cross_i2t"], k + img_pe, q + tokens, q)
        k = ln(k, layer["norm4"])
    q = q + _attn(p["final_attn"], q + tokens, k + img_pe, k)
    q = ln(q, p["norm_final"])
    return q, k


def mask_decoder_forward(p, cfg: TrackerConfig, img_embed, image_pe,
                         sparse, dense, high_res=None):
    """img_embed [B,e,e,d]; image_pe [e,e,d]; sparse [B,N,d];
    dense [B,e,e,d]; high_res: (s0 [B,4e,4e,d/8], s1 [B,2e,2e,d/4]).
    -> masks [B,nm,4e,4e], ious [B,nm], mask_tokens_out [B,nm,d],
    obj_logits [B,1] (mask_decoder.py:170-245 predict_masks)."""
    b, e, _, d = img_embed.shape
    nm = cfg.num_multimask + 1
    out_tok = jnp.concatenate(
        [p["obj_token"][None], p["iou_token"][None], p["mask_tokens"]],
        axis=0)
    tokens = jnp.concatenate(
        [jnp.broadcast_to(out_tok, (b,) + out_tok.shape), sparse], axis=1)
    src = (img_embed + dense).reshape(b, e * e, d)
    pos = jnp.broadcast_to(image_pe.reshape(1, e * e, d), src.shape)
    hs, src = _twoway(p, tokens, src, pos)
    obj_logits = mlp(hs[:, 0], p["obj_head"])
    iou_tok = hs[:, 1]
    mask_tokens_out = hs[:, 2:2 + nm]

    src = src.reshape(b, e, e, d)
    up = _deconv2x(src, p["up1"])
    if high_res is not None:
        up = up + high_res[1]
    up = jax.nn.gelu(ln(up, p["up_ln"]), approximate=False)
    up = _deconv2x(up, p["up2"])
    if high_res is not None:
        up = up + high_res[0]
    up = jax.nn.gelu(up, approximate=False)       # [B,4e,4e,d/8]

    hyper = jnp.stack([mlp(mask_tokens_out[:, i], p["hyper"][i])
                       for i in range(nm)], axis=1)   # [B,nm,d/8]
    masks = jnp.einsum("bnc,bhwc->bnhw", hyper, up)
    ious = jax.nn.sigmoid(mlp(iou_tok, p["iou_head"]))
    return masks, ious, mask_tokens_out, obj_logits


def _stability_scores(mask_logits, delta):
    """mask_decoder.py:247-257."""
    flat = mask_logits.reshape(*mask_logits.shape[:-2], -1)
    ai = jnp.sum(flat > delta, axis=-1).astype(jnp.float32)
    au = jnp.sum(flat > -delta, axis=-1).astype(jnp.float32)
    return jnp.where(au > 0, ai / au, 1.0)


def select_masks(p, cfg: TrackerConfig, masks, ious, mask_tokens_out,
                 multimask: bool):
    """Output selection incl. dynamic-multimask-via-stability
    (mask_decoder.py:144-167, 259-295).  Returns (masks_sel [B,k,..],
    ious_sel [B,k], sam_tokens [B,k,d])."""
    if multimask:
        return masks[:, 1:], ious[:, 1:], mask_tokens_out[:, 1:]
    multi = masks[:, 1:]
    multi_iou = ious[:, 1:]
    best = jnp.argmax(multi_iou, axis=-1)
    bi = jnp.arange(masks.shape[0])
    best_m = multi[bi, best][:, None]
    best_i = multi_iou[bi, best][:, None]
    single = masks[:, 0:1]
    single_iou = ious[:, 0:1]
    stab = _stability_scores(single, cfg.stability_delta)
    ok = stab >= cfg.stability_thresh
    m = jnp.where(ok[..., None, None], single, best_m)
    i = jnp.where(ok, single_iou, best_i)
    return m, i, mask_tokens_out[:, 0:1]


# ---------------------------------------------------------------------------
# memory encoder
# ---------------------------------------------------------------------------

def init_memory_encoder(key, cfg: TrackerConfig, dtype=jnp.float32):
    d = cfg.d_model
    keys = jax.random.split(key, 16)
    ki = iter(keys)
    downs, cin, cout = [], 1, 1
    for _ in range(4):                      # total stride 16, stride 2
        cout = cout * 4
        downs.append({"conv": _init_conv(next(ki), 3, 3, cin, cout, dtype),
                      "ln": init_ln(cout, dtype)})
        cin = cout
    fuser = []
    for _ in range(2):                      # 2 CXBlocks (memory.py:84-139)
        fuser.append({
            "dw": _init_conv(next(ki), 7, 7, 1, d, dtype),  # depthwise
            "ln": init_ln(d, dtype),
            "pw1": init_linear(next(ki), d, 4 * d, dtype),
            "pw2": init_linear(next(ki), 4 * d, d, dtype),
            "gamma": jnp.full((d,), 1e-6, dtype),
        })
    return {
        "downs": downs,
        "down_proj": _init_conv(next(ki), 1, 1, cout, d, dtype),
        "pix_proj": _init_conv(next(ki), 1, 1, d, d, dtype),
        "fuser": fuser,
        "out_proj": _init_conv(next(ki), 1, 1, d, cfg.mem_dim, dtype),
    }


def encode_memory(p, cfg: TrackerConfig, pix_feat, mask_hi, obj_logits,
                  no_obj_embed_spatial, binarize: bool):
    """pix_feat [B,e,e,d]; mask_hi [B,H,W,1] mask logits at image res.
    -> mem [B, e*e, mem_dim] (_encode_new_memory
    sam3_tracker_base.py:796-850 + SimpleMaskEncoder)."""
    e = cfg.embed_size
    if binarize:
        m = (mask_hi > 0).astype(jnp.float32)
    else:
        m = jax.nn.sigmoid(mask_hi.astype(jnp.float32))
    m = m * cfg.sigmoid_scale_mem + cfg.sigmoid_bias_mem
    # interpolate to 16x the token grid, then conv-downsample by 16
    m = _resize(m, e * 16, e * 16, antialias=True)
    for st in p["downs"]:
        # torch Conv2d(k3, s2, p1) pads symmetrically; XLA SAME would not
        m = jax.nn.gelu(ln(_conv(m, st["conv"], stride=2,
                                 padding=((1, 1), (1, 1))), st["ln"]),
                        approximate=False)
    m = _conv(m, p["down_proj"])
    x = _conv(pix_feat, p["pix_proj"]) + m
    for blk in p["fuser"]:
        y = _conv(x, blk["dw"], groups=x.shape[-1])
        y = ln(y, blk["ln"], eps=1e-6)
        y = linear(jax.nn.gelu(linear(y, blk["pw1"]), approximate=False),
                   blk["pw2"])
        x = x + blk["gamma"] * y
    mem = _conv(x, p["out_proj"])            # [B,e,e,mem_dim]
    is_obj = (obj_logits > 0).astype(mem.dtype)       # [B,1]
    mem = mem + (1.0 - is_obj[:, :, None, None]) * no_obj_embed_spatial
    return mem.reshape(mem.shape[0], e * e, cfg.mem_dim)


# ---------------------------------------------------------------------------
# memory attention
# ---------------------------------------------------------------------------

def init_memory_attention(key, cfg: TrackerConfig, dtype=jnp.float32):
    d = cfg.d_model
    keys = jax.random.split(key, cfg.mem_layers * 4 + 2)
    layers = []
    for i in range(cfg.mem_layers):
        k4 = keys[i * 4:(i + 1) * 4]
        layers.append({
            "norm1": init_ln(d, dtype),
            "self": _init_attn(k4[0], d, 1, dtype=dtype),
            "norm2": init_ln(d, dtype),
            "cross": _init_attn(k4[1], d, 1, kv_dim=cfg.mem_dim,
                                dtype=dtype),
            "norm3": init_ln(d, dtype),
            "fc1": init_linear(k4[2], d, cfg.mem_ffn, dtype),
            "fc2": init_linear(k4[3], cfg.mem_ffn, d, dtype),
        })
    return {"layers": layers, "norm": init_ln(d, dtype)}


def _rope_attn(p, q_in, k_in, v_in, cos, sin, k_rope_repeat: int,
               num_k_rope: int, k_mask=None):
    """Single-head RoPE attention (sam/transformer.py:274-372): rope on
    q and the first num_k_rope keys (repeated per memory frame);
    k_mask [B, Lk] True=valid."""
    q = linear(q_in, p["q"])
    k = linear(k_in, p["k"])
    v = linear(v_in, p["v"])
    hd = q.shape[-1]
    q = apply_rope(q, cos, sin)
    if num_k_rope > 0:
        k_rope = apply_rope(k[:, :num_k_rope], cos, sin,
                            repeat=k_rope_repeat)
        k = jnp.concatenate([k_rope, k[:, num_k_rope:]], axis=1)
    logits = jnp.einsum("bld,bsd->bls", q, k).astype(jnp.float32) \
        / math.sqrt(hd)
    if k_mask is not None:
        logits = jnp.where(k_mask[:, None, :], logits, -1e30)
    w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("bls,bsd->bld", w, v)
    return linear(out, p["o"])


def memory_attention(p, cfg: TrackerConfig, cur, cur_pos, mem_k, mem_pos,
                     mem_mask, num_spatial: int, spatial_repeat: int):
    """cur [B,HW,d] current-frame tokens; cur_pos [HW,d]; mem_k
    [B,L,mem_dim] = spatial memories (first num_spatial tokens,
    spatial_repeat frames) then pointer tokens; mem_pos [B,L,mem_dim];
    mem_mask [B,L] True=valid.  decoder.py:620-726 + layer v2."""
    e = cfg.embed_size
    cos, sin = axial_rope_cos_sin(cfg.d_model, e, e, cfg.rope_theta)
    x = cur + 0.1 * cur_pos[None]            # pos_enc_at_input, alpha=0.1
    kv = mem_k + mem_pos                     # pos_enc_at_cross_attn_keys
    for layer in p["layers"]:
        h = ln(x, layer["norm1"])
        x = x + _rope_attn(layer["self"], h, h, h, cos, sin,
                           1, h.shape[1])
        h = ln(x, layer["norm2"])
        x = x + _rope_attn(layer["cross"], h, kv, mem_k, cos, sin,
                           spatial_repeat, num_spatial, k_mask=mem_mask)
        h = ln(x, layer["norm3"])
        x = x + linear(jax.nn.relu(linear(h, layer["fc1"])), layer["fc2"])
    return ln(x, p["norm"])


# ---------------------------------------------------------------------------
# full tracker
# ---------------------------------------------------------------------------

def init_tracker(key, cfg: TrackerConfig, dtype=jnp.float32):
    keys = jax.random.split(key, 10)
    d = cfg.d_model
    return {
        "prompt": init_prompt_encoder(keys[0], cfg, dtype),
        "decoder": init_mask_decoder(keys[1], cfg, dtype),
        "memenc": init_memory_encoder(keys[2], cfg, dtype),
        "memattn": init_memory_attention(keys[3], cfg, dtype),
        "mask_down": _init_conv(keys[4], 4, 4, 1, 1, dtype),
        "obj_ptr_proj": init_mlp(keys[5], d, d, d, 3, dtype),
        "obj_ptr_tpos": init_linear(keys[6], d, cfg.mem_dim, dtype),
        "no_mem_embed": (jax.random.normal(keys[7], (d,)) * 0.02
                         ).astype(dtype),
        "maskmem_tpos": (jax.random.normal(keys[8], (cfg.num_maskmem, 1,
                                                     cfg.mem_dim)) * 0.02
                         ).astype(dtype),
        "no_obj_ptr": (jax.random.normal(keys[9], (d,)) * 0.02
                       ).astype(dtype),
        "no_obj_spatial": jnp.zeros((cfg.mem_dim,), dtype),
    }


def _sine_1d(pos, dim, temperature=10000.0):
    """get_1d_sine_pe (sam3_tracker_utils.py:331-341); pos [...]."""
    half = dim // 2
    dim_t = jnp.arange(half, dtype=jnp.float32)
    dim_t = temperature ** (2.0 * (dim_t // 2) / half)
    pe = pos[..., None] / dim_t
    return jnp.concatenate([jnp.sin(pe), jnp.cos(pe)], axis=-1)


def forward_sam_heads(params, cfg: TrackerConfig, backbone_feat,
                      high_res, points=None, point_labels=None,
                      mask_input=None, multimask=False):
    """sam3_tracker_base.py:217-382.  backbone_feat [B,e,e,d] (already
    memory-conditioned); high_res (s0, s1) projected skips.
    Returns dict(low_res [B,1,4e,4e], high_res [B,1,H,W], ious,
    obj_ptr [B,d], obj_logits [B,1])."""
    b = backbone_feat.shape[0]
    sparse, dense = prompt_encode(
        params["prompt"], cfg, points, point_labels, mask_input, batch=b)
    pe = dense_pe(params["prompt"], cfg.embed_size)
    masks, ious, tok_out, obj_logits = mask_decoder_forward(
        params["decoder"], cfg, backbone_feat, pe, sparse, dense,
        high_res)
    is_obj = obj_logits > 0                                # [B,1]
    masks = jnp.where(is_obj[..., None, None], masks, NO_OBJ_SCORE)
    m_sel, i_sel, t_sel = select_masks(params["decoder"], cfg, masks,
                                       ious, tok_out, multimask)
    if multimask:
        best = jnp.argmax(i_sel, axis=-1)
        bi = jnp.arange(b)
        low = m_sel[bi, best][:, None]
        tok = t_sel[bi, best]
    else:
        low = m_sel
        tok = t_sel[:, 0]
    hi = _resize(low.transpose(0, 2, 3, 1).astype(jnp.float32),
                 cfg.image_size, cfg.image_size).transpose(0, 3, 1, 2)
    obj_ptr = mlp(tok, params["obj_ptr_proj"])
    lam = is_obj.astype(obj_ptr.dtype)
    obj_ptr = lam * obj_ptr + (1.0 - lam) * params["no_obj_ptr"]
    return {"low_res": low, "high_res": hi, "ious": i_sel,
            "obj_ptr": obj_ptr, "obj_logits": obj_logits}


def use_mask_as_output(params, cfg: TrackerConfig, backbone_feat,
                       high_res, mask_input):
    """sam3_tracker_base.py:388-435: input mask becomes the output;
    mask_input [B,H,W,1] float 0/1 at image resolution."""
    scale, bias = 20.0, -10.0
    m = mask_input.astype(jnp.float32)
    hi = (m * scale + bias).transpose(0, 3, 1, 2)           # [B,1,H,W]
    lr = cfg.low_res_size
    low = _resize(m * scale + bias, lr, lr,
                  antialias=True).transpose(0, 3, 1, 2)
    # object pointer via the SAM decoder on the downsampled mask
    md = _conv(m, params["mask_down"], stride=4, padding="VALID")
    out = forward_sam_heads(params, cfg, backbone_feat, high_res,
                            mask_input=md, multimask=False)
    is_obj = jnp.any(m.reshape(m.shape[0], -1) > 0.0, axis=-1)[:, None]
    lam = is_obj.astype(jnp.float32)
    obj_logits = scale * lam + bias
    obj_ptr = lam * out["obj_ptr"] + (1.0 - lam) * params["no_obj_ptr"]
    return {"low_res": low, "high_res": hi,
            "ious": jnp.ones((m.shape[0], 1), jnp.float32),
            "obj_ptr": obj_ptr, "obj_logits": obj_logits}


def condition_features(params, cfg: TrackerConfig, feat72, pos72,
                       spatial_mem, spatial_tpos_idx, spatial_valid,
                       obj_ptrs, ptr_rel_t, ptr_valid):
    """_prepare_memory_conditioned_features for a non-init frame.
    feat72 [B,e,e,d]; spatial_mem [B,S,HW,mem_dim]; spatial_tpos_idx
    [S] int; spatial_valid [B,S] bool; obj_ptrs [B,P,d]; ptr_rel_t
    [B,P] float; ptr_valid [B,P] bool."""
    b, e = feat72.shape[0], cfg.embed_size
    hw, d, md = e * e, cfg.d_model, cfg.mem_dim
    s, pn = spatial_mem.shape[1], obj_ptrs.shape[1]
    cur = feat72.reshape(b, hw, d)
    grid_pos = sine_grid_pos(e, e, md).reshape(hw, md)
    tpos = params["maskmem_tpos"][spatial_tpos_idx]        # [S,1,md]
    sp_pos = grid_pos[None, None] + tpos[None]             # [1,S,HW,md]
    sp_pos = jnp.broadcast_to(sp_pos, (b, s, hw, md))

    split = d // md
    ptr_pos = _sine_1d(ptr_rel_t / max(cfg.max_obj_ptrs - 1, 1), d)
    ptr_pos = linear(ptr_pos.astype(feat72.dtype),
                     params["obj_ptr_tpos"])               # [B,P,md]
    ptr_tok = obj_ptrs.reshape(b, pn, split, md)           # [B,P,split,md]
    ptr_pos = jnp.broadcast_to(ptr_pos[:, :, None, :], ptr_tok.shape)
    ptr_mask = jnp.broadcast_to(ptr_valid[:, :, None], (b, pn, split))

    mem_k = jnp.concatenate(
        [spatial_mem.reshape(b, s * hw, md),
         ptr_tok.reshape(b, pn * split, md)], axis=1)
    mem_pos = jnp.concatenate(
        [sp_pos.reshape(b, s * hw, md),
         ptr_pos.reshape(b, pn * split, md)], axis=1)
    mem_mask = jnp.concatenate(
        [jnp.broadcast_to(spatial_valid[:, :, None], (b, s, hw)
                          ).reshape(b, s * hw),
         ptr_mask.reshape(b, pn * split)], axis=1)
    cur_pos = pos72.reshape(hw, d)
    out = memory_attention(params["memattn"], cfg, cur, cur_pos, mem_k,
                           mem_pos, mem_mask, num_spatial=s * hw,
                           spatial_repeat=s)
    return out.reshape(b, e, e, d)
