"""MatAnyone — memory-based video matting (single-object inference).

TPU-native re-implementation of the reference MatAnyone stack
(/root/reference/preprocessing/matanyone/matanyone/):
- model/matanyone.py: ResNet50 pixel encoder (f16/f8/f4/f2/f1) +
  key projection (key/shrinkage/selection), ResNet18 mask encoder with
  a CAResBlock fusion + sensory GRU, XMem-style affinity memory
  readout (model/utils/memory_utils.py get_similarity:7-71 with the
  selection term), temporal-sparsity uncertainty gate
  (big_modules.py UncertPred:21-48, matanyone.py:152-156), pixel
  fusion, a 3-block object transformer with 16 learned queries
  (transformer/object_transformer.py) and an object summarizer
  (weighted pooling, object_summarizer.py:11-24), and a full-scale
  mask decoder with sensory GRU update (big_modules.py
  MaskDecoder:276-365);
- inference/inference_core.py semantics are condensed into
  MatAnyoneCore: first-frame mask conditioning, per-frame memory
  readout + decode, FIFO working memory with streaming-averaged object
  summaries.

Single-object mode only (the matting use in the reference app); masks
take values in [0, 1] (alpha matte head `pred_mat`).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

PIXEL_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
PIXEL_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


@dataclasses.dataclass(frozen=True)
class MatAnyoneConfig:
    pixel_dim: int = 256
    key_dim: int = 64
    value_dim: int = 256
    sensory_dim: int = 256
    embed_dim: int = 256
    # pixel encoder resnet50 channel plan (layers 1-3)
    enc_widths: Tuple[int, ...] = (256, 512, 1024)
    enc_blocks: Tuple[int, ...] = (3, 4, 6)
    # mask encoder resnet18
    menc_widths: Tuple[int, ...] = (64, 128, 256)
    menc_blocks: Tuple[int, ...] = (2, 2, 2)
    mask_final_dim: int = 256
    num_queries: int = 16
    num_heads: int = 8
    num_blocks: int = 3
    ff_dim: int = 2048
    pe_scale: float = 32.0
    pe_temperature: float = 128.0
    up_dims: Tuple[int, ...] = (256, 128, 128, 64, 16)


# -- primitives -------------------------------------------------------------

def _conv(x, p, stride=1, padding=0, dilation=1):
    y = jax.lax.conv_general_dilated(
        x, p["w"], (stride, stride),
        [(padding, padding), (padding, padding)],
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    if "b" in p:
        y = y + p["b"][None, :, None, None]
    return y


def _bn(x, p, eps=1e-5):
    inv = jax.lax.rsqrt(p["var"] + eps)
    return (x - p["mean"][None, :, None, None]) \
        * (p["w"] * inv)[None, :, None, None] \
        + p["b"][None, :, None, None]


def _maxpool3(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2),
        [(0, 0), (0, 0), (1, 1), (1, 1)])


def _interp(x, scale=None, size=None):
    b, c, h, w = x.shape
    if size is None:
        size = (int(h * scale), int(w * scale))
    return jax.image.resize(x, (b, c, *size), method="bilinear")


def _area_pool(x, size):
    b, c, h, w = x.shape
    oh, ow = size
    if h % oh == 0 and w % ow == 0:
        return x.reshape(b, c, oh, h // oh, ow, w // ow).mean((3, 5))
    return jax.image.resize(x, (b, c, oh, ow), method="linear")


# -- resnet backbones -------------------------------------------------------

def _basic_block(p, x, stride=1):
    idty = x
    y = jax.nn.relu(_bn(_conv(x, p["conv1"], stride, 1), p["bn1"]))
    y = _bn(_conv(y, p["conv2"], 1, 1), p["bn2"])
    if "down_conv" in p:
        idty = _bn(_conv(x, p["down_conv"], stride), p["down_bn"])
    return jax.nn.relu(y + idty)


def _bottleneck(p, x, stride=1, dilation=1):
    idty = x
    y = jax.nn.relu(_bn(_conv(x, p["conv1"]), p["bn1"]))
    y = jax.nn.relu(_bn(_conv(y, p["conv2"], stride, dilation, dilation),
                        p["bn2"]))
    y = _bn(_conv(y, p["conv3"]), p["bn3"])
    if "down_conv" in p:
        idty = _bn(_conv(x, p["down_conv"], stride), p["down_bn"])
    return jax.nn.relu(y + idty)


def _resnet_stem(p, x):
    y = _bn(_conv(x, p["conv1"], 2, 3), p["bn1"])
    return y


def pixel_encoder_forward(p, cfg: MatAnyoneConfig, image):
    """image: [B, 3, H, W] normalised.  Returns (f16, f8, f4, f2, f1)
    (big_modules.py PixelEncoder:77-91)."""
    f1 = image
    x = jax.nn.relu(_resnet_stem(p, image))
    f2 = x
    x = _maxpool3(x)
    for blk in p["layer1"]:
        x = _bottleneck(blk, x, stride=1)
    f4 = x
    for i, blk in enumerate(p["layer2"]):
        x = _bottleneck(blk, x, stride=2 if i == 0 else 1)
    f8 = x
    for i, blk in enumerate(p["layer3"]):
        x = _bottleneck(blk, x, stride=2 if i == 0 else 1)
    return x, f8, f4, f2, f1


def mask_encoder_backbone(p, x):
    """ResNet18 over [B, 4, H, W] (image + mask; big_modules.py
    MaskEncoder:196-205: relu AFTER maxpool)."""
    x = _resnet_stem(p, x)
    x = _maxpool3(x)
    x = jax.nn.relu(x)
    for blk in p["layer1"]:
        x = _basic_block(blk, x, 1)
    for i, blk in enumerate(p["layer2"]):
        x = _basic_block(blk, x, 2 if i == 0 else 1)
    for i, blk in enumerate(p["layer3"]):
        x = _basic_block(blk, x, 2 if i == 0 else 1)
    return x


# -- small blocks -----------------------------------------------------------

def ca_res_block(p, x):
    """CAResBlock (channel_attn.py:7-39): 2 convs + ECA gate."""
    r = x
    y = _conv(jax.nn.relu(x), p["conv1"], 1, 1)
    y = _conv(jax.nn.relu(y), p["conv2"], 1, 1)
    b, c = y.shape[:2]
    w = y.mean((2, 3)).reshape(b, 1, c)
    k = p["eca_w"].shape[-1]
    w = jax.lax.conv_general_dilated(
        w, p["eca_w"], (1,), [((k - 1) // 2, (k - 1) // 2)],
        dimension_numbers=("NCH", "OIH", "NCH"))
    gate = jax.nn.sigmoid(w.reshape(b, c, 1, 1))
    if "down" in p:
        r = _conv(r, p["down"])
    return y * gate + r


def fusion_block(p, x, g):
    """GroupFeatureFusionBlock (group_modules.py:101-125), single
    object: g [B, C_g, H, W]."""
    y = _conv(x, p["x_transform"]) + _conv(g, p["g_transform"])
    y = ca_res_block(p["block1"], y)
    return ca_res_block(p["block2"], y)


def gru_update(p, g, h):
    """SensoryDeepUpdater GRU (modules.py:50-59, 115-128)."""
    values = _conv(jnp.concatenate([g, h], axis=1), p, 1, 1)
    dim = values.shape[1] // 3
    forget = jax.nn.sigmoid(values[:, :dim])
    update = jax.nn.sigmoid(values[:, dim:2 * dim])
    new = jnp.tanh(values[:, 2 * dim:])
    return forget * h * (1 - update) + update * new


def positional_encoding_2d(h, w, dim, scale, temperature):
    """PositionalEncoding (positional_encoding.py:20-98):
    [h, w, 2*ceil(dim/4)*2] = [emb_x || emb_y], each interleaved
    sin/cos."""
    d = int(math.ceil(dim / 4) * 2)
    inv = 1.0 / (temperature ** (np.arange(0, d, 2, np.float64) / d))
    pos_y = np.arange(h, dtype=np.float64)
    pos_x = np.arange(w, dtype=np.float64)
    pos_y = pos_y / (pos_y[-1] + 1e-6) * scale
    pos_x = pos_x / (pos_x[-1] + 1e-6) * scale

    def emb1d(pos):
        ang = np.outer(pos, inv)
        return np.stack([np.sin(ang), np.cos(ang)],
                        axis=-1).reshape(len(pos), -1)

    ey = emb1d(pos_y)[:, None]
    ex = emb1d(pos_x)[None, :]
    out = np.zeros((h, w, 2 * d), np.float32)
    out[:, :, :d] = ex
    out[:, :, d:] = ey
    return jnp.asarray(out)


def _mha(p, q, k, v, nh, attn_mask=None):
    """torch nn.MultiheadAttention (packed in_proj + out_proj)."""
    b, lq, d = q.shape
    hd = d // nh
    wq, wk, wv = jnp.split(p["in_w"], 3, axis=1)
    bq, bk, bv = jnp.split(p["in_b"], 3)
    qh = (q @ wq + bq).reshape(b, lq, nh, hd)
    kh = (k @ wk + bk).reshape(b, -1, nh, hd)
    vh = (v @ wv + bv).reshape(b, -1, nh, hd)
    a = jnp.einsum("blnd,bmnd->bnlm", qh, kh) / math.sqrt(hd)
    if attn_mask is not None:
        a = jnp.where(attn_mask, -1e9, a)
    a = jax.nn.softmax(a, axis=-1)
    o = jnp.einsum("bnlm,bmnd->blnd", a, vh).reshape(b, lq, d)
    return o @ p["out_w"] + p["out_b"]


def _ln(x, w, b, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps) * w + b


# -- memory ops -------------------------------------------------------------

def get_affinity(mk, ms, qk, qe):
    """XMem affinity (memory_utils.py:7-107): L2 similarity with
    shrinkage + selection, softmax over memory positions.
    mk: [B, CK, N]; ms: [B, 1, N]; qk/qe: [B, CK, P]."""
    ck = mk.shape[1]
    mkT = mk.transpose(0, 2, 1)
    a_sq = (mkT ** 2) @ qe
    two_ab = 2 * (mkT @ (qk * qe))
    b_sq = (qe * qk ** 2).sum(1, keepdims=True)
    sim = (-a_sq + two_ab - b_sq).astype(jnp.float32)
    sim = sim * ms.transpose(0, 2, 1) / math.sqrt(ck)
    sim = sim - sim.max(axis=1, keepdims=True)
    e = jnp.exp(sim)
    return e / e.sum(axis=1, keepdims=True)


def readout(affinity, mv):
    """mv: [B, CV, N] x affinity [B, N, P] -> [B, CV, P]."""
    return jnp.einsum("bcn,bnp->bcp", mv, affinity)


# -- component forwards -----------------------------------------------------

def key_projection_forward(p, f16):
    """big_modules.py KeyProjection:99-124: 1x1 pix_feat_proj then
    key/shrinkage (d**2+1)/selection (sigmoid) heads."""
    x = _conv(f16, p["pix_feat_proj"])
    key = _conv(x, p["key"], 1, 1)
    shrinkage = _conv(x, p["d"], 1, 1) ** 2 + 1
    selection = jax.nn.sigmoid(_conv(x, p["e"], 1, 1))
    return key, shrinkage, selection


def mask_encoder_forward(p, image, pix_feat, sensory, mask,
                         deep_update=True):
    """big_modules.py MaskEncoder:127-226 (single object): resnet18
    over cat([image, mask]), fuse with pix_feat, optionally GRU-update
    the sensory memory."""
    g = jnp.concatenate([image, mask], axis=1)
    g = mask_encoder_backbone(p, g)
    g = fusion_block(p["fuser"], pix_feat, g)
    new_sensory = gru_update(p["sensory_update"], g, sensory) \
        if deep_update else sensory
    return g, new_sensory


def pixel_fuser_forward(p, pix_feat, pixel_memory, sensory, last_mask16):
    """big_modules.py PixelFeatureFuser:229-273 (single object)."""
    sr = _conv(jnp.concatenate([sensory, last_mask16], axis=1),
               p["sensory_compress"])
    return fusion_block(p["fuser"], pix_feat, pixel_memory + sr)


def uncert_pred_forward(p, last_pix_feat, cur_pix_feat, last_mask16,
                        mem_val_diff):
    """UncertPred (big_modules.py:21-48): frozen-BN conv stack ->
    1-channel uncertainty logits at stride 16."""
    x = jnp.concatenate([last_pix_feat, cur_pix_feat, last_mask16,
                         mem_val_diff], axis=1)
    x = jax.nn.relu(_bn(_conv(x, p["conv1x1"]), p["bn1"]))
    x = jax.nn.relu(_bn(_conv(x, p["conv3x3"], 1, 1), p["bn2"]))
    return _conv(x, p["conv3x3_out"], 1, 1)


def object_summarizer_forward(p, cfg: MatAnyoneConfig, mask, value):
    """object_summarizer.py:56-91 (single object): pooled summaries
    [B, Q, embed+1] = [sums, area]."""
    h, w = value.shape[-2:]
    m = _area_pool(mask, (h, w))[:, 0, :, :, None]        # [B, h, w, 1]
    nq = cfg.num_queries
    rep = jnp.concatenate(
        [jnp.broadcast_to(m, (*m.shape[:3], nq // 2)),
         jnp.broadcast_to(1 - m, (*m.shape[:3], nq // 2))], axis=-1)
    v = value.transpose(0, 2, 3, 1)
    v = v @ p["input_proj"]["w"] + p["input_proj"]["b"]
    pe = positional_encoding_2d(h, w, cfg.embed_dim, cfg.pe_scale,
                                cfg.pe_temperature)
    v = v + pe[None]
    feat = jax.nn.relu(v @ p["feat1"]["w"] + p["feat1"]["b"])
    feat = feat @ p["feat2"]["w"] + p["feat2"]["b"]
    logit = jax.nn.relu(v @ p["wt1"]["w"] + p["wt1"]["b"])
    logit = logit @ p["wt2"]["w"] + p["wt2"]["b"]
    weights = jax.nn.sigmoid(logit) * rep
    sums = jnp.einsum("bhwq,bhwc->bqc", weights, feat)
    area = weights.sum((1, 2))[..., None]
    return jnp.concatenate([sums, area], axis=-1)


def _lin(p, x):
    return x @ p["w"] + p["b"]


def _aux_attn_mask(logits, num_queries):
    """object_transformer.py _get_aux_mask:181-208 (single object):
    first half of the queries attends foreground only, second half
    background only; fully-blocked rows are unblocked."""
    b, _, h, w = logits.shape
    fg = (jax.nn.sigmoid(logits) >= 0.5).reshape(b, 1, 1, h * w)
    half = num_queries // 2
    block = jnp.concatenate(
        [jnp.broadcast_to(~fg, (b, 1, half, h * w)),
         jnp.broadcast_to(fg, (b, 1, half, h * w))], axis=2)
    all_blocked = block.all(axis=-1, keepdims=True)
    return block & ~all_blocked


def query_transformer_forward(p, cfg: MatAnyoneConfig, pixel,
                              obj_summaries):
    """object_transformer.py QueryTransformer:77-179 (single object).
    pixel: [B, embed, H, W]; obj_summaries: [B, Q, embed+1] (already
    time-summed).  Returns updated pixel features [B, embed, H, W]."""
    b, c, h, w = pixel.shape
    nq, nh = cfg.num_queries, cfg.num_heads
    obj_values = obj_summaries[..., :-1] / (obj_summaries[..., -1:]
                                            + 1e-4)
    query = p["query_init"][None] + _lin(p["summary_to_query_init"],
                                         obj_values)
    query_emb = p["query_emb"][None] + _lin(p["summary_to_query_emb"],
                                            obj_values)
    pixel_init = _conv(pixel, p["pixel_init_proj"])
    pixel_emb = _conv(pixel, p["pixel_emb_proj"])
    pe = positional_encoding_2d(h, w, cfg.embed_dim, cfg.pe_scale,
                                cfg.pe_temperature)
    pixel_pe = pe.reshape(1, h * w, -1) \
        + pixel_emb.reshape(b, c, h * w).transpose(0, 2, 1)
    pixel = pixel_init

    def mask_pred(i, px):
        return _conv(jax.nn.relu(px), p["mask_pred"][i])

    attn_mask = _aux_attn_mask(mask_pred(0, pixel), nq)
    x = query
    for i, blk in enumerate(p["blocks"]):
        pixel_flat = pixel.reshape(b, c, h * w).transpose(0, 2, 1)
        # read_from_pixel (post-norm residual on the normed input)
        y = _ln(x, blk["rfp_ln_w"], blk["rfp_ln_b"])
        x = y + _mha(blk["rfp"], y + query_emb, pixel_flat + pixel_pe,
                     pixel_flat, nh, attn_mask)
        # query self-attention
        y = _ln(x, blk["sa_ln_w"], blk["sa_ln_b"])
        x = y + _mha(blk["sa"], y + query_emb, y + query_emb, y, nh)
        # FFN (pre-norm residual on the un-normed input)
        y = _ln(x, blk["ffn_ln_w"], blk["ffn_ln_b"])
        x = x + _lin(blk["ffn2"], jax.nn.relu(_lin(blk["ffn1"], y)))
        # read_from_query (output_norm=False)
        pf = pixel_flat + _mha(blk["rfq"], pixel_flat + pixel_pe,
                               x + query_emb, x, nh)
        # pixel FFN (CAResBlock)
        pixel = ca_res_block(
            blk["pixel_ffn"],
            pf.transpose(0, 2, 1).reshape(b, c, h, w))
        attn_mask = _aux_attn_mask(mask_pred(i + 1, pixel), nq)
    return pixel


def group_res_block(p, g):
    out = _conv(jax.nn.relu(g), p["conv1"], 1, 1)
    out = _conv(jax.nn.relu(out), p["conv2"], 1, 1)
    if "down" in p:
        g = _conv(g, p["down"])
    return out + g


def mask_upsample_block(p, g, skip):
    g = _interp(g, scale=2)
    return group_res_block(p, g + skip)


def sensory_updater_fullscale(p, feats, h):
    """modules.py SensoryUpdater_fullscale:63-88: project 5 scales to
    mid_dim at stride 16, GRU update."""
    g = _conv(feats[0], p["g16"])
    for name, f, r in (("g8", feats[1], 2), ("g4", feats[2], 4),
                       ("g2", feats[3], 8), ("g1", feats[4], 16)):
        g = g + _conv(_area_pool(f, (f.shape[-2] // r,
                                     f.shape[-1] // r)), p[name])
    return gru_update(p["transform"], g, h)


def mask_decoder_forward(p, cfg: MatAnyoneConfig, ms_feats,
                         memory_readout, sensory, update_sensory=True):
    """big_modules.py MaskDecoder:276-365 (matting head): full-scale
    upsampling chain, alpha in [0, 1].  Returns (new_sensory, alpha)."""
    f8, f4, f2, f1 = [_conv(f, t) for f, t in zip(ms_feats[1:],
                                                  p["feat_proc"])]
    p16 = memory_readout
    p8 = mask_upsample_block(p["up_16_8"], p16, f8)
    p4 = mask_upsample_block(p["up_8_4"], p8, f4)
    p2 = mask_upsample_block(p["up_4_2"], p4, f2)
    p1 = mask_upsample_block(p["up_2_1"], p2, f1)
    logits = _conv(jax.nn.relu(p1), p["pred_mat"], 1, 1)
    alpha = jnp.clip(logits, 0.0, 1.0)
    if update_sensory:
        p1c = jnp.concatenate([p1, logits], axis=1)
        sensory = sensory_updater_fullscale(
            p["sensory_update"], [p16, p8, p4, p2, p1c], sensory)
    return sensory, alpha


# -- parameter init ---------------------------------------------------------

def _conv_init(key, cin, cout, k, bias=True):
    lim = 1.0 / math.sqrt(cin * k * k)
    p = {"w": jax.random.uniform(key, (cout, cin, k, k), jnp.float32,
                                 -lim, lim)}
    if bias:
        p["b"] = jnp.zeros((cout,), jnp.float32)
    return p


def _bn_init(c):
    return {"w": jnp.ones((c,)), "b": jnp.zeros((c,)),
            "mean": jnp.zeros((c,)), "var": jnp.ones((c,))}


def _eca_k(dim):
    t = int((abs(math.log2(dim)) + 1) // 2)
    return t if t % 2 else t + 1


def _ca_block_init(ks, cin, cout):
    p = {"conv1": _conv_init(next(ks), cin, cout, 3),
         "conv2": _conv_init(next(ks), cout, cout, 3),
         "eca_w": jax.random.normal(next(ks), (1, 1, _eca_k(cout)))
         * 0.1}
    if cin != cout:
        p["down"] = _conv_init(next(ks), cin, cout, 1)
    return p


def _fusion_init(ks, x_dim, g_dim, out_dim):
    return {"x_transform": _conv_init(next(ks), x_dim, out_dim, 1),
            "g_transform": _conv_init(next(ks), g_dim, out_dim, 1),
            "block1": _ca_block_init(ks, out_dim, out_dim),
            "block2": _ca_block_init(ks, out_dim, out_dim)}


def _bottleneck_init(ks, cin, planes, stride):
    p = {"conv1": _conv_init(next(ks), cin, planes, 1, False),
         "bn1": _bn_init(planes),
         "conv2": _conv_init(next(ks), planes, planes, 3, False),
         "bn2": _bn_init(planes),
         "conv3": _conv_init(next(ks), planes, planes * 4, 1, False),
         "bn3": _bn_init(planes * 4)}
    if stride != 1 or cin != planes * 4:
        p["down_conv"] = _conv_init(next(ks), cin, planes * 4, 1, False)
        p["down_bn"] = _bn_init(planes * 4)
    return p


def _basic_init(ks, cin, planes, stride):
    p = {"conv1": _conv_init(next(ks), cin, planes, 3, False),
         "bn1": _bn_init(planes),
         "conv2": _conv_init(next(ks), planes, planes, 3, False),
         "bn2": _bn_init(planes)}
    if stride != 1 or cin != planes:
        p["down_conv"] = _conv_init(next(ks), cin, planes, 1, False)
        p["down_bn"] = _bn_init(planes)
    return p


def _lin_init(key, din, dout):
    lim = 1.0 / math.sqrt(din)
    return {"w": jax.random.uniform(key, (din, dout), jnp.float32,
                                    -lim, lim),
            "b": jnp.zeros((dout,), jnp.float32)}


def init_matanyone(key, cfg: MatAnyoneConfig = MatAnyoneConfig()):
    ks = iter(jax.random.split(key, 4096))
    w1, w2, w3 = cfg.enc_widths
    stem_w = w1 // 4
    pe = {"conv1": _conv_init(next(ks), 3, stem_w, 7, False),
          "bn1": _bn_init(stem_w)}
    cin = stem_w
    for li, (w, n) in enumerate(zip(cfg.enc_widths, cfg.enc_blocks)):
        planes = w // 4
        blocks = []
        for bi in range(n):
            s = 2 if (li > 0 and bi == 0) else 1
            blocks.append(_bottleneck_init(ks, cin, planes, s))
            cin = planes * 4
        pe[f"layer{li + 1}"] = blocks
    m1, m2, m3 = cfg.menc_widths
    me = {"conv1": _conv_init(next(ks), 4, m1, 7, False),
          "bn1": _bn_init(m1)}
    cin = m1
    for li, (w, n) in enumerate(zip(cfg.menc_widths, cfg.menc_blocks)):
        blocks = []
        for bi in range(n):
            s = 2 if (li > 0 and bi == 0) else 1
            blocks.append(_basic_init(ks, cin, w, s))
            cin = w
        me[f"layer{li + 1}"] = blocks
    me["fuser"] = _fusion_init(ks, cfg.pixel_dim, cfg.mask_final_dim,
                               cfg.value_dim)
    me["sensory_update"] = _conv_init(
        next(ks), cfg.value_dim + cfg.sensory_dim, cfg.sensory_dim * 3,
        3)
    e = cfg.embed_dim
    up = cfg.up_dims

    def mha_init():
        return {"in_w": jax.random.normal(next(ks), (e, 3 * e)) * 0.02,
                "in_b": jnp.zeros((3 * e,)),
                "out_w": jax.random.normal(next(ks), (e, e)) * 0.02,
                "out_b": jnp.zeros((e,))}

    def qt_block():
        return {"rfp_ln_w": jnp.ones((e,)), "rfp_ln_b": jnp.zeros((e,)),
                "rfp": mha_init(),
                "sa_ln_w": jnp.ones((e,)), "sa_ln_b": jnp.zeros((e,)),
                "sa": mha_init(),
                "ffn_ln_w": jnp.ones((e,)), "ffn_ln_b": jnp.zeros((e,)),
                "ffn1": _lin_init(next(ks), e, cfg.ff_dim),
                "ffn2": _lin_init(next(ks), cfg.ff_dim, e),
                "rfq": mha_init(),
                "pixel_ffn": _ca_block_init(ks, e, e)}

    def up_block(cin_, cout_):
        p = {"conv1": _conv_init(next(ks), cin_, cout_, 3),
             "conv2": _conv_init(next(ks), cout_, cout_, 3)}
        if cin_ != cout_:
            p["down"] = _conv_init(next(ks), cin_, cout_, 1)
        return p

    ms_dims = (cfg.enc_widths[2], cfg.enc_widths[1],
               cfg.enc_widths[0], stem_w, 3)
    return {
        "pixel_encoder": pe,
        "pix_feat_proj": _conv_init(next(ks), ms_dims[0],
                                    cfg.pixel_dim, 1),
        "key_proj": {
            "pix_feat_proj": _conv_init(next(ks), ms_dims[0],
                                        cfg.pixel_dim, 1),
            "key": _conv_init(next(ks), cfg.pixel_dim, cfg.key_dim, 3),
            "d": _conv_init(next(ks), cfg.pixel_dim, 1, 3),
            "e": _conv_init(next(ks), cfg.pixel_dim, cfg.key_dim, 3)},
        "mask_encoder": me,
        "pixel_fuser": {
            "sensory_compress": _conv_init(
                next(ks), cfg.sensory_dim + 1, cfg.value_dim, 1),
            "fuser": _fusion_init(ks, cfg.pixel_dim, cfg.value_dim, e)},
        "object_summarizer": {
            "input_proj": _lin_init(next(ks), cfg.value_dim, e),
            "feat1": _lin_init(next(ks), e, e),
            "feat2": _lin_init(next(ks), e, e),
            "wt1": _lin_init(next(ks), e, e),
            "wt2": _lin_init(next(ks), e, cfg.num_queries)},
        "object_transformer": {
            "query_init": jax.random.normal(
                next(ks), (cfg.num_queries, e)) * 0.02,
            "query_emb": jax.random.normal(
                next(ks), (cfg.num_queries, e)) * 0.02,
            "summary_to_query_init": _lin_init(next(ks), e, e),
            "summary_to_query_emb": _lin_init(next(ks), e, e),
            "pixel_init_proj": _conv_init(next(ks), e, e, 1),
            "pixel_emb_proj": _conv_init(next(ks), e, e, 1),
            "blocks": [qt_block() for _ in range(cfg.num_blocks)],
            "mask_pred": [_conv_init(next(ks), e, 1, 1)
                          for _ in range(cfg.num_blocks + 1)]},
        "mask_decoder": {
            "feat_proc": [_conv_init(next(ks), d, o, 1)
                          for d, o in zip(ms_dims[1:], up[:-1])],
            "up_16_8": up_block(up[0], up[1]),
            "up_8_4": up_block(up[1], up[2]),
            "up_4_2": up_block(up[2], up[3]),
            "up_2_1": up_block(up[3], up[4]),
            "pred_mat": _conv_init(next(ks), up[4], 1, 3),
            "sensory_update": {
                "g16": _conv_init(next(ks), up[0], cfg.sensory_dim, 1),
                "g8": _conv_init(next(ks), up[1], cfg.sensory_dim, 1),
                "g4": _conv_init(next(ks), up[2], cfg.sensory_dim, 1),
                "g2": _conv_init(next(ks), up[3], cfg.sensory_dim, 1),
                "g1": _conv_init(next(ks), up[4] + 1,
                                 cfg.sensory_dim, 1),
                "transform": _conv_init(
                    next(ks), 2 * cfg.sensory_dim,
                    cfg.sensory_dim * 3, 3)}},
        "uncert_pred": {
            "conv1x1": _conv_init(next(ks), 2 * cfg.pixel_dim + 1
                                  + cfg.value_dim, 64, 1, False),
            "bn1": _bn_init(64),
            "conv3x3": _conv_init(next(ks), 64, 32, 3, False),
            "bn2": _bn_init(32),
            "conv3x3_out": _conv_init(next(ks), 32, 1, 3, False)},
    }


# -- full-model helpers -----------------------------------------------------

def encode_image(params, cfg: MatAnyoneConfig, image):
    """matanyone.py encode_image:113-117: normalise, pixel encoder,
    1x1 projection of f16."""
    x = (image - jnp.asarray(PIXEL_MEAN)[None, :, None, None]) \
        / jnp.asarray(PIXEL_STD)[None, :, None, None]
    ms = pixel_encoder_forward(params["pixel_encoder"], cfg, x)
    return ms, _conv(ms[0], params["pix_feat_proj"])


def encode_mask(params, cfg: MatAnyoneConfig, image, pix_feat, sensory,
                mask, deep_update=True):
    """matanyone.py encode_mask:119-139 (single object): mask value +
    sensory update + object summaries."""
    x = (image - jnp.asarray(PIXEL_MEAN)[None, :, None, None]) \
        / jnp.asarray(PIXEL_STD)[None, :, None, None]
    value, sensory = mask_encoder_forward(
        params["mask_encoder"], x, pix_feat, sensory, mask,
        deep_update=deep_update)
    summaries = object_summarizer_forward(params["object_summarizer"],
                                          cfg, mask, value)
    return value, sensory, summaries


def read_memory(params, cfg: MatAnyoneConfig, mem_key, mem_shrinkage,
                mem_value, query_key, query_selection, pix_feat,
                last_pix_feat, last_mask16, last_msk_value):
    """matanyone.py read_memory:124-160: affinity readout blended with
    the last frame's mask value by predicted temporal uncertainty."""
    b, cv, h, w = last_msk_value.shape
    qk = query_key.reshape(b, -1, h * w)
    qe = query_selection.reshape(b, -1, h * w)
    affinity = get_affinity(mem_key, mem_shrinkage, qk, qe)
    ro = readout(affinity, mem_value).reshape(b, cv, h, w)
    uncert_logits = uncert_pred_forward(
        params["uncert_pred"], last_pix_feat, pix_feat, last_mask16,
        ro - last_msk_value)
    prob = jax.nn.sigmoid(uncert_logits)
    return ro * prob + last_msk_value * (1 - prob)


def query_readout(params, cfg: MatAnyoneConfig, pix_feat,
                  pixel_readout, sensory, last_mask16, obj_mem):
    """pixel_fusion + readout_query (matanyone.py:199-230)."""
    fused = pixel_fuser_forward(params["pixel_fuser"], pix_feat,
                                pixel_readout, sensory, last_mask16)
    return query_transformer_forward(params["object_transformer"], cfg,
                                     fused, obj_mem)


class MatAnyoneCore:
    """Condensed InferenceCore (inference/inference_core.py:200-386)
    for single-object matting, batch 1:
    - ``reset(image, mask)`` encodes the given first-frame mask into
      working memory (step with mask, :295-360);
    - ``step(image, warmup=True)`` re-predicts the first frame from its
      own mask value (read_first_frame path, :165) and resets temporal
      memory, mirroring first_frame_pred=True warmup iterations;
    - ``step(image)`` propagates: memory read with uncertainty
      blending, object transformer, full-scale decode, FIFO working
      memory refreshed every ``mem_every`` frames (first frame stays
      permanent), streaming-averaged object summaries (:319).
    Images are [H, W, 3] float in [0, 1]; masks/alphas [H, W] in [0, 1].
    """

    def __init__(self, params, cfg: MatAnyoneConfig = MatAnyoneConfig(),
                 mem_every: int = 5, max_mem_frames: int = 5):
        self.params = params
        self.cfg = cfg
        self.mem_every = mem_every
        self.max_mem_frames = max_mem_frames
        self._reset_state()

    def _reset_state(self):
        self.mem_keys: List[jnp.ndarray] = []
        self.mem_shrinkages: List[jnp.ndarray] = []
        self.mem_values: List[jnp.ndarray] = []
        self.obj_mem = None
        self.sensory = None
        self.last_mask = None
        self.last_msk_value = None
        self.last_pix_feat = None
        self.curr_ti = -1
        self.last_mem_ti = 0
        self._pad = None

    def _prep(self, image):
        img = np.asarray(image, np.float32)
        h, w = img.shape[:2]
        ph, pw = (-h) % 16, (-w) % 16
        self._pad = (ph // 2, ph - ph // 2, pw // 2, pw - pw // 2)
        t, bq, lq, r = self._pad
        img = np.pad(img, ((t, bq), (lq, r), (0, 0)))
        return jnp.asarray(img.transpose(2, 0, 1))[None], (h, w)

    def _unpad(self, x):
        t, b, lq, r = self._pad
        h, w = x.shape[-2:]
        return x[..., t:h - b, lq:w - r]

    def _pad_mask(self, mask):
        t, b, lq, r = self._pad
        m = np.pad(np.asarray(mask, np.float32), ((t, b), (lq, r)))
        return jnp.asarray(m)[None, None]

    def _add_memory(self, image, pix_feat, key, shrinkage):
        value, self.sensory, summaries = encode_mask(
            self.params, self.cfg, image, pix_feat, self.sensory,
            self.last_mask, deep_update=True)
        b, ck = key.shape[:2]
        self.mem_keys.append(key.reshape(b, ck, -1))
        self.mem_shrinkages.append(shrinkage.reshape(b, 1, -1))
        self.mem_values.append(value.reshape(b, value.shape[1], -1))
        # streaming average: accumulate (sums, area); the query
        # transformer divides by total area (memory_manager.py:319)
        self.obj_mem = summaries if self.obj_mem is None \
            else self.obj_mem + summaries
        if len(self.mem_keys) > self.max_mem_frames:
            # FIFO keeps the permanent first frame (index 0)
            for buf in (self.mem_keys, self.mem_shrinkages,
                        self.mem_values):
                del buf[1]
        self.last_msk_value = value
        self.last_mem_ti = self.curr_ti

    def reset(self, image, mask):
        """Encode the given first-frame mask into memory; returns the
        (identity) alpha for frame 0."""
        self._reset_state()
        self.curr_ti = 0
        img, _ = self._prep(image)
        ms, pix_feat = encode_image(self.params, self.cfg, img)
        key, shrinkage, _ = key_projection_forward(
            self.params["key_proj"], ms[0])
        self.sensory = jnp.zeros(
            (1, self.cfg.sensory_dim, *ms[0].shape[-2:]), jnp.float32)
        self.last_mask = self._pad_mask(mask)
        self.last_pix_feat = pix_feat
        self._add_memory(img, pix_feat, key, shrinkage)
        return np.asarray(mask, np.float32)

    def step(self, image, warmup: bool = False):
        self.curr_ti = 0 if warmup else self.curr_ti + 1
        img, _ = self._prep(image)
        ms, pix_feat = encode_image(self.params, self.cfg, img)
        key, shrinkage, selection = key_projection_forward(
            self.params["key_proj"], ms[0])
        h16 = ms[0].shape[-2:]
        last_mask16 = _area_pool(self.last_mask, h16)
        if warmup:
            # read_first_frame (memory_manager.py:115): last mask value
            # is the pixel memory, no affinity lookup
            pixel_readout = self.last_msk_value
        else:
            pixel_readout = read_memory(
                self.params, self.cfg,
                jnp.concatenate(self.mem_keys, -1),
                jnp.concatenate(self.mem_shrinkages, -1),
                jnp.concatenate(self.mem_values, -1),
                key, selection, pix_feat, self.last_pix_feat,
                last_mask16, self.last_msk_value)
        mem_readout = query_readout(self.params, self.cfg, pix_feat,
                                    pixel_readout, self.sensory,
                                    last_mask16, self.obj_mem)
        self.sensory, alpha = mask_decoder_forward(
            self.params["mask_decoder"], self.cfg, ms, mem_readout,
            self.sensory)
        self.last_mask = alpha
        self.last_pix_feat = pix_feat
        if warmup:
            # first_frame_pred resets temporal memory (:354-356)
            self.mem_keys, self.mem_shrinkages = [], []
            self.mem_values, self.obj_mem = [], None
            self._add_memory(img, pix_feat, key, shrinkage)
        elif self.curr_ti - self.last_mem_ti >= self.mem_every:
            self._add_memory(img, pix_feat, key, shrinkage)
        else:
            value, _, _ = encode_mask(
                self.params, self.cfg, img, pix_feat, self.sensory,
                self.last_mask, deep_update=False)
            self.last_msk_value = value
        return np.asarray(self._unpad(alpha))[0, 0]


def matanyone_matting(params, frames, mask,
                      cfg: MatAnyoneConfig = MatAnyoneConfig(),
                      n_warmup: int = 10, mem_every: int = 5,
                      max_mem_frames: int = 5) -> np.ndarray:
    """matanyone_wrapper.py:24-79: warm up on the first frame, then
    propagate.  frames: [T, H, W, 3] in [0, 1]; mask: [H, W] in [0, 1].
    Returns alphas [T, H, W] in [0, 1]."""
    core = MatAnyoneCore(params, cfg, mem_every=mem_every,
                         max_mem_frames=max_mem_frames)
    core.reset(frames[0], mask)
    for _ in range(n_warmup):
        alpha = core.step(frames[0], warmup=True)
    out = [alpha]
    for frame in frames[1:]:
        out.append(core.step(frame))
    return np.stack(out)


# -- checkpoint loading -----------------------------------------------------

def load_matanyone_params(sd: Dict[str, np.ndarray],
                          cfg: MatAnyoneConfig = MatAnyoneConfig()):
    """Load the reference MatAnyone checkpoint (HF pq-yang/MatAnyone,
    single-object: mask_encoder.conv1 has 4 input channels).  Returns
    (params, leftover_keys)."""
    sd = {k[7:] if k.startswith("module.") else k: v
          for k, v in sd.items()}

    def t(name):
        return jnp.asarray(np.asarray(sd.pop(name), np.float32))

    def conv(name, bias=True):
        p = {"w": t(f"{name}.weight")}
        if bias:
            p["b"] = t(f"{name}.bias")
        return p

    def bn(name):
        return {"w": t(f"{name}.weight"), "b": t(f"{name}.bias"),
                "mean": t(f"{name}.running_mean"),
                "var": t(f"{name}.running_var")}

    def lin(name):
        return {"w": jnp.asarray(np.asarray(
                    sd.pop(f"{name}.weight"), np.float32).T),
                "b": t(f"{name}.bias")}

    def res_block(pre, kinds):
        p = {}
        for i in kinds:
            p[f"conv{i}"] = conv(f"{pre}.conv{i}", bias=False)
            p[f"bn{i}"] = bn(f"{pre}.bn{i}")
        if f"{pre}.downsample.0.weight" in sd:
            p["down_conv"] = conv(f"{pre}.downsample.0", bias=False)
            p["down_bn"] = bn(f"{pre}.downsample.1")
        return p

    def res_layer(pre, n, kinds):
        return [res_block(f"{pre}.{i}", kinds) for i in range(n)]

    def ca_block(pre):
        p = {"conv1": conv(f"{pre}.conv1"),
             "conv2": conv(f"{pre}.conv2"),
             "eca_w": t(f"{pre}.conv.weight")}
        if f"{pre}.downsample.weight" in sd:
            p["down"] = conv(f"{pre}.downsample")
        return p

    def fusion(pre):
        return {"x_transform": conv(f"{pre}.distributor.x_transform"),
                "g_transform": conv(f"{pre}.distributor.g_transform"),
                "block1": ca_block(f"{pre}.block1"),
                "block2": ca_block(f"{pre}.block2")}

    def mha(pre):
        return {"in_w": jnp.asarray(np.asarray(
                    sd.pop(f"{pre}.in_proj_weight"), np.float32).T),
                "in_b": t(f"{pre}.in_proj_bias"),
                "out_w": jnp.asarray(np.asarray(
                    sd.pop(f"{pre}.out_proj.weight"), np.float32).T),
                "out_b": t(f"{pre}.out_proj.bias")}

    def group_res(pre):
        p = {"conv1": conv(f"{pre}.conv1"), "conv2": conv(f"{pre}.conv2")}
        if f"{pre}.downsample.weight" in sd:
            p["down"] = conv(f"{pre}.downsample")
        return p

    pe = {"conv1": conv("pixel_encoder.conv1", bias=False),
          "bn1": bn("pixel_encoder.bn1"),
          "layer1": res_layer("pixel_encoder.res2",
                              cfg.enc_blocks[0], (1, 2, 3)),
          "layer2": res_layer("pixel_encoder.layer2",
                              cfg.enc_blocks[1], (1, 2, 3)),
          "layer3": res_layer("pixel_encoder.layer3",
                              cfg.enc_blocks[2], (1, 2, 3))}
    me = {"conv1": conv("mask_encoder.conv1", bias=False),
          "bn1": bn("mask_encoder.bn1"),
          "layer1": res_layer("mask_encoder.layer1",
                              cfg.menc_blocks[0], (1, 2)),
          "layer2": res_layer("mask_encoder.layer2",
                              cfg.menc_blocks[1], (1, 2)),
          "layer3": res_layer("mask_encoder.layer3",
                              cfg.menc_blocks[2], (1, 2)),
          "fuser": fusion("mask_encoder.fuser"),
          "sensory_update": conv("mask_encoder.sensory_update.transform")}
    ot = {"query_init": t("object_transformer.query_init.weight"),
          "query_emb": t("object_transformer.query_emb.weight"),
          "summary_to_query_init": lin(
              "object_transformer.summary_to_query_init"),
          "summary_to_query_emb": lin(
              "object_transformer.summary_to_query_emb"),
          "pixel_init_proj": conv("object_transformer.pixel_init_proj"),
          "pixel_emb_proj": conv("object_transformer.pixel_emb_proj"),
          "blocks": [], "mask_pred": []}
    for i in range(cfg.num_blocks):
        bp = f"object_transformer.blocks.{i}"
        ot["blocks"].append({
            "rfp_ln_w": t(f"{bp}.read_from_pixel.norm.weight"),
            "rfp_ln_b": t(f"{bp}.read_from_pixel.norm.bias"),
            "rfp": mha(f"{bp}.read_from_pixel.cross_attn"),
            "sa_ln_w": t(f"{bp}.self_attn.norm.weight"),
            "sa_ln_b": t(f"{bp}.self_attn.norm.bias"),
            "sa": mha(f"{bp}.self_attn.self_attn"),
            "ffn_ln_w": t(f"{bp}.ffn.norm.weight"),
            "ffn_ln_b": t(f"{bp}.ffn.norm.bias"),
            "ffn1": lin(f"{bp}.ffn.linear1"),
            "ffn2": lin(f"{bp}.ffn.linear2"),
            "rfq": mha(f"{bp}.read_from_query.cross_attn"),
            "pixel_ffn": ca_block(f"{bp}.pixel_ffn.conv")})
    for i in range(cfg.num_blocks + 1):
        ot["mask_pred"].append(conv(f"object_transformer.mask_pred.{i}.1"))
    md = {"feat_proc": [conv(f"mask_decoder.decoder_feat_proc."
                             f"transforms.{i}") for i in range(4)],
          "up_16_8": group_res("mask_decoder.up_16_8.out_conv"),
          "up_8_4": group_res("mask_decoder.up_8_4.out_conv"),
          "up_4_2": group_res("mask_decoder.up_4_2.out_conv"),
          "up_2_1": group_res("mask_decoder.up_2_1.out_conv"),
          "pred_mat": conv("mask_decoder.pred_mat"),
          "sensory_update": {
              "g16": conv("mask_decoder.sensory_update.g16_conv"),
              "g8": conv("mask_decoder.sensory_update.g8_conv"),
              "g4": conv("mask_decoder.sensory_update.g4_conv"),
              "g2": conv("mask_decoder.sensory_update.g2_conv"),
              "g1": conv("mask_decoder.sensory_update.g1_conv"),
              "transform": conv("mask_decoder.sensory_update.transform")}}
    params = {
        "pixel_encoder": pe,
        "pix_feat_proj": conv("pix_feat_proj"),
        "key_proj": {"pix_feat_proj": conv("key_proj.pix_feat_proj"),
                     "key": conv("key_proj.key_proj"),
                     "d": conv("key_proj.d_proj"),
                     "e": conv("key_proj.e_proj")},
        "mask_encoder": me,
        "pixel_fuser": {
            "sensory_compress": conv("pixel_fuser.sensory_compress"),
            "fuser": fusion("pixel_fuser.fuser")},
        "object_summarizer": {
            "input_proj": lin("object_summarizer.input_proj"),
            "feat1": lin("object_summarizer.feature_pred.0"),
            "feat2": lin("object_summarizer.feature_pred.2"),
            "wt1": lin("object_summarizer.weights_pred.0"),
            "wt2": lin("object_summarizer.weights_pred.2")},
        "object_transformer": ot,
        "mask_decoder": md,
        "uncert_pred": {
            "conv1x1": conv("temp_sparity.conv1x1_v2", bias=False),
            "bn1": bn("temp_sparity.bn1"),
            "conv3x3": conv("temp_sparity.conv3x3", bias=False),
            "bn2": bn("temp_sparity.bn2"),
            "conv3x3_out": conv("temp_sparity.conv3x3_out",
                                bias=False)},
    }
    leftover = [k for k in sd
                if "pred_seg" not in k and "aux_" not in k
                and "pixel_mean" not in k and "pixel_std" not in k
                and "inv_freq" not in k and "aux" not in k]
    return params, sorted(leftover)
