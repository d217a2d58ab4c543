"""MatAnyone video matting tests (torch-oracle + e2e)."""
import math

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from wan2gp_tpu.preprocessing import matanyone as ma

torch = pytest.importorskip("torch")
nn = torch.nn
F = torch.nn.functional


TINY = ma.MatAnyoneConfig(
    pixel_dim=16, key_dim=8, value_dim=16, sensory_dim=16, embed_dim=16,
    enc_widths=(32, 64, 128), enc_blocks=(1, 1, 1),
    menc_widths=(8, 12, 16), menc_blocks=(1, 1, 1), mask_final_dim=16,
    num_queries=4, num_heads=2, num_blocks=2, ff_dim=32,
    up_dims=(16, 12, 12, 8, 4))


def _np(x):
    return np.asarray(x)


# -- torch oracles for the risky primitives ---------------------------------

class TorchBottleneck(nn.Module):
    def __init__(self, cin, planes, stride):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.downsample = None
        if stride != 1 or cin != planes * 4:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, planes * 4, 1, stride, bias=False),
                nn.BatchNorm2d(planes * 4))

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = F.relu(self.bn2(self.conv2(y)))
        return F.relu(self.bn3(self.conv3(y)) + r)


def _rand_bn(bn):
    with torch.no_grad():
        bn.weight.uniform_(0.5, 1.5)
        bn.bias.uniform_(-0.3, 0.3)
        bn.running_mean.uniform_(-0.5, 0.5)
        bn.running_var.uniform_(0.5, 2.0)


def _conv_sd(conv, has_bias=None):
    p = {"w": jnp.asarray(conv.weight.detach().numpy())}
    if conv.bias is not None:
        p["b"] = jnp.asarray(conv.bias.detach().numpy())
    return p


def _bn_sd(bn):
    return {"w": jnp.asarray(bn.weight.detach().numpy()),
            "b": jnp.asarray(bn.bias.detach().numpy()),
            "mean": jnp.asarray(bn.running_mean.numpy()),
            "var": jnp.asarray(bn.running_var.numpy())}


def test_bottleneck_matches_torch():
    torch.manual_seed(0)
    blk = TorchBottleneck(8, 4, 2).eval()
    for m in blk.modules():
        if isinstance(m, nn.BatchNorm2d):
            _rand_bn(m)
    p = {"conv1": _conv_sd(blk.conv1), "bn1": _bn_sd(blk.bn1),
         "conv2": _conv_sd(blk.conv2), "bn2": _bn_sd(blk.bn2),
         "conv3": _conv_sd(blk.conv3), "bn3": _bn_sd(blk.bn3),
         "down_conv": _conv_sd(blk.downsample[0]),
         "down_bn": _bn_sd(blk.downsample[1])}
    x = torch.randn(1, 8, 12, 10)
    ref = blk(x).detach().numpy()
    out = _np(ma._bottleneck(p, jnp.asarray(x.numpy()), stride=2))
    np.testing.assert_allclose(out, ref, atol=2e-4)


def test_resnet_stem_and_maxpool_matches_torch():
    torch.manual_seed(1)
    conv = nn.Conv2d(3, 8, 7, 2, 3, bias=False)
    bn = nn.BatchNorm2d(8).eval()
    _rand_bn(bn)
    x = torch.randn(1, 3, 32, 48)
    with torch.no_grad():
        # reference MaskEncoder order: conv/bn -> maxpool -> relu
        ref = F.relu(F.max_pool2d(bn(conv(x)), 3, 2, 1)).numpy()
    p = {"conv1": _conv_sd(conv), "bn1": _bn_sd(bn)}
    y = ma._resnet_stem(p, jnp.asarray(x.numpy()))
    out = _np(jax.nn.relu(ma._maxpool3(y)))
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_mha_matches_torch():
    torch.manual_seed(2)
    d, nh = 16, 4
    mha = nn.MultiheadAttention(d, nh, batch_first=True).eval()
    q = torch.randn(2, 5, d)
    k = torch.randn(2, 9, d)
    mask = torch.rand(2 * nh, 5, 9) > 0.7
    mask[..., 0] = False    # keep at least one position open
    with torch.no_grad():
        ref = mha(q, k, k, attn_mask=mask, need_weights=False)[0].numpy()
    p = {"in_w": jnp.asarray(mha.in_proj_weight.detach().numpy().T),
         "in_b": jnp.asarray(mha.in_proj_bias.detach().numpy()),
         "out_w": jnp.asarray(mha.out_proj.weight.detach().numpy().T),
         "out_b": jnp.asarray(mha.out_proj.bias.detach().numpy())}
    jmask = jnp.asarray(mask.numpy().reshape(2, nh, 5, 9))
    out = _np(ma._mha(p, jnp.asarray(q.numpy()), jnp.asarray(k.numpy()),
                      jnp.asarray(k.numpy()), nh, jmask))
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_positional_encoding_matches_reference_formula():
    # positional_encoding.py:41-96 re-derived in torch
    h, w, dim, scale, temp = 5, 7, 16, 32.0, 128.0
    d = int(np.ceil(dim / 4) * 2)
    inv = 1.0 / (temp ** (torch.arange(0, d, 2).float() / d))
    pos_y = torch.arange(h).float()
    pos_x = torch.arange(w).float()
    pos_y = pos_y / (pos_y[-1] + 1e-6) * scale
    pos_x = pos_x / (pos_x[-1] + 1e-6) * scale

    def emb(p):
        s = torch.einsum("i,j->ij", p, inv)
        return torch.stack((s.sin(), s.cos()), -1).flatten(-2)

    ref = torch.zeros(h, w, 2 * d)
    ref[:, :, :d] = emb(pos_x)
    ref[:, :, d:] = emb(pos_y).unsqueeze(1)
    out = _np(ma.positional_encoding_2d(h, w, dim, scale, temp))
    np.testing.assert_allclose(out, ref.numpy(), atol=1e-5)


def test_affinity_matches_xmem_formula():
    # memory_utils.py:7-71 re-derived in torch
    torch.manual_seed(3)
    b, ck, n, p_ = 1, 8, 12, 6
    mk = torch.randn(b, ck, n)
    ms = torch.rand(b, 1, n) + 1.0
    qk = torch.randn(b, ck, p_)
    qe = torch.rand(b, ck, p_)
    mkT = mk.transpose(1, 2)
    sim = (-(mkT.pow(2) @ qe) + 2 * (mkT @ (qk * qe))
           - (qe * qk.pow(2)).sum(1, keepdim=True))
    sim = sim * ms.transpose(1, 2) / math.sqrt(ck)
    ref = torch.softmax(sim, dim=1).numpy()
    out = _np(ma.get_affinity(jnp.asarray(mk.numpy()),
                              jnp.asarray(ms.numpy()),
                              jnp.asarray(qk.numpy()),
                              jnp.asarray(qe.numpy())))
    np.testing.assert_allclose(out, ref, atol=1e-5)
    ro = _np(ma.readout(jnp.asarray(ref), jnp.asarray(mk.numpy())))
    np.testing.assert_allclose(ro, (mk @ torch.from_numpy(ref)).numpy(),
                               atol=1e-5)


def test_ca_res_block_matches_torch():
    # channel_attn.py:7-39 re-derived in torch
    torch.manual_seed(4)
    cin, cout = 6, 16
    conv1 = nn.Conv2d(cin, cout, 3, padding=1)
    conv2 = nn.Conv2d(cout, cout, 3, padding=1)
    t = int((abs(math.log2(cout)) + 1) // 2)
    k = t if t % 2 else t + 1
    eca = nn.Conv1d(1, 1, k, padding=(k - 1) // 2, bias=False)
    down = nn.Conv2d(cin, cout, 1)
    x = torch.randn(1, cin, 7, 9)
    with torch.no_grad():
        y = conv2(F.relu(conv1(F.relu(x))))
        wgt = eca(y.mean((2, 3)).view(1, 1, cout))
        wgt = wgt.transpose(-1, -2).unsqueeze(-1).sigmoid()
        ref = (y * wgt + down(x)).numpy()
    p = {"conv1": _conv_sd(conv1), "conv2": _conv_sd(conv2),
         "eca_w": jnp.asarray(eca.weight.detach().numpy()),
         "down": _conv_sd(down)}
    out = _np(ma.ca_res_block(p, jnp.asarray(x.numpy())))
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_gru_update_matches_reference():
    # modules.py:50-59 _recurrent_update re-derived in torch
    torch.manual_seed(5)
    dim = 6
    conv = nn.Conv2d(2 * dim, 3 * dim, 3, padding=1)
    g = torch.randn(1, dim, 4, 5)
    h = torch.randn(1, dim, 4, 5)
    with torch.no_grad():
        v = conv(torch.cat([g, h], 1))
        fg = torch.sigmoid(v[:, :dim])
        ug = torch.sigmoid(v[:, dim:2 * dim])
        nv = torch.tanh(v[:, 2 * dim:])
        ref = (fg * h * (1 - ug) + ug * nv).numpy()
    out = _np(ma.gru_update(_conv_sd(conv), jnp.asarray(g.numpy()),
                            jnp.asarray(h.numpy())))
    np.testing.assert_allclose(out, ref, atol=2e-5)


# -- structural & e2e -------------------------------------------------------

def test_component_shapes():
    params = ma.init_matanyone(jax.random.PRNGKey(0), TINY)
    img = jnp.zeros((1, 3, 32, 48))
    ms, pix_feat = ma.encode_image(params, TINY, img)
    assert ms[0].shape == (1, 128, 2, 3)
    assert ms[1].shape == (1, 64, 4, 6)
    assert ms[2].shape == (1, 32, 8, 12)
    assert ms[3].shape == (1, 8, 16, 24)
    assert pix_feat.shape == (1, 16, 2, 3)
    key, shr, sel = ma.key_projection_forward(params["key_proj"], ms[0])
    assert key.shape == (1, 8, 2, 3)
    assert shr.shape == (1, 1, 2, 3)
    assert float(shr.min()) >= 1.0
    assert sel.shape == (1, 8, 2, 3)
    sensory = jnp.zeros((1, 16, 2, 3))
    mask = jnp.zeros((1, 1, 32, 48))
    value, new_sensory, summaries = ma.encode_mask(
        params, TINY, img, pix_feat, sensory, mask)
    assert value.shape == (1, 16, 2, 3)
    assert new_sensory.shape == sensory.shape
    assert summaries.shape == (1, 4, 17)
    readout16 = ma.query_readout(params, TINY, pix_feat, value, sensory,
                                 ma._area_pool(mask, (2, 3)), summaries)
    assert readout16.shape == (1, 16, 2, 3)
    new_s, alpha = ma.mask_decoder_forward(
        params["mask_decoder"], TINY, ms, readout16, sensory)
    assert alpha.shape == (1, 1, 32, 48)
    assert new_s.shape == sensory.shape
    assert float(alpha.min()) >= 0.0 and float(alpha.max()) <= 1.0


def test_matting_e2e():
    params = ma.init_matanyone(jax.random.PRNGKey(1), TINY)
    rng = np.random.RandomState(0)
    frames = rng.rand(3, 30, 44, 3).astype(np.float32)
    mask = (rng.rand(30, 44) > 0.5).astype(np.float32)
    alphas = ma.matanyone_matting(params, frames, mask, TINY,
                                  n_warmup=2, mem_every=1,
                                  max_mem_frames=2)
    assert alphas.shape == (3, 30, 44)
    assert np.isfinite(alphas).all()
    assert alphas.min() >= 0.0 and alphas.max() <= 1.0


def _synthetic_state_dict(cfg):
    """Emit a random torch-layout state dict with the reference's key
    names (model/matanyone.py state_dict) for loader coverage."""
    rng = np.random.RandomState(0)
    sd = {}

    def conv(name, cin, cout, k, bias=True):
        sd[f"{name}.weight"] = rng.randn(cout, cin, k, k).astype(
            np.float32) * 0.1
        if bias:
            sd[f"{name}.bias"] = np.zeros(cout, np.float32)

    def bn(name, c):
        sd[f"{name}.weight"] = np.ones(c, np.float32)
        sd[f"{name}.bias"] = np.zeros(c, np.float32)
        sd[f"{name}.running_mean"] = np.zeros(c, np.float32)
        sd[f"{name}.running_var"] = np.ones(c, np.float32)

    def lin(name, din, dout):
        sd[f"{name}.weight"] = rng.randn(dout, din).astype(
            np.float32) * 0.1
        sd[f"{name}.bias"] = np.zeros(dout, np.float32)

    def bott(pre, cin, planes, stride):
        conv(f"{pre}.conv1", cin, planes, 1, False)
        bn(f"{pre}.bn1", planes)
        conv(f"{pre}.conv2", planes, planes, 3, False)
        bn(f"{pre}.bn2", planes)
        conv(f"{pre}.conv3", planes, planes * 4, 1, False)
        bn(f"{pre}.bn3", planes * 4)
        if stride != 1 or cin != planes * 4:
            conv(f"{pre}.downsample.0", cin, planes * 4, 1, False)
            bn(f"{pre}.downsample.1", planes * 4)

    def basic(pre, cin, planes, stride):
        conv(f"{pre}.conv1", cin, planes, 3, False)
        bn(f"{pre}.bn1", planes)
        conv(f"{pre}.conv2", planes, planes, 3, False)
        bn(f"{pre}.bn2", planes)
        if stride != 1 or cin != planes:
            conv(f"{pre}.downsample.0", cin, planes, 1, False)
            bn(f"{pre}.downsample.1", planes)

    def eca(name, dim):
        sd[f"{name}.weight"] = rng.randn(1, 1, ma._eca_k(dim)).astype(
            np.float32) * 0.1

    def ca(pre, cin, cout):
        conv(f"{pre}.conv1", cin, cout, 3)
        conv(f"{pre}.conv2", cout, cout, 3)
        eca(f"{pre}.conv", cout)
        if cin != cout:
            conv(f"{pre}.downsample", cin, cout, 1)

    def fusion(pre, xd, gd, od):
        conv(f"{pre}.distributor.x_transform", xd, od, 1)
        conv(f"{pre}.distributor.g_transform", gd, od, 1)
        ca(f"{pre}.block1", od, od)
        ca(f"{pre}.block2", od, od)

    def mha(pre, d):
        sd[f"{pre}.in_proj_weight"] = rng.randn(3 * d, d).astype(
            np.float32) * 0.1
        sd[f"{pre}.in_proj_bias"] = np.zeros(3 * d, np.float32)
        lin(f"{pre}.out_proj", d, d)

    def ln(pre, d):
        sd[f"{pre}.weight"] = np.ones(d, np.float32)
        sd[f"{pre}.bias"] = np.zeros(d, np.float32)

    stem = cfg.enc_widths[0] // 4
    conv("pixel_encoder.conv1", 3, stem, 7, False)
    bn("pixel_encoder.bn1", stem)
    cin = stem
    for name, (w, n) in zip(("res2", "layer2", "layer3"),
                            zip(cfg.enc_widths, cfg.enc_blocks)):
        for i in range(n):
            s = 2 if (name != "res2" and i == 0) else 1
            bott(f"pixel_encoder.{name}.{i}", cin, w // 4, s)
            cin = w
    conv("pix_feat_proj", cfg.enc_widths[2], cfg.pixel_dim, 1)
    conv("key_proj.pix_feat_proj", cfg.enc_widths[2], cfg.pixel_dim, 1)
    conv("key_proj.key_proj", cfg.pixel_dim, cfg.key_dim, 3)
    conv("key_proj.d_proj", cfg.pixel_dim, 1, 3)
    conv("key_proj.e_proj", cfg.pixel_dim, cfg.key_dim, 3)
    conv("mask_encoder.conv1", 4, cfg.menc_widths[0], 7, False)
    bn("mask_encoder.bn1", cfg.menc_widths[0])
    cin = cfg.menc_widths[0]
    for li, (w, n) in enumerate(zip(cfg.menc_widths, cfg.menc_blocks)):
        for i in range(n):
            s = 2 if (li > 0 and i == 0) else 1
            basic(f"mask_encoder.layer{li + 1}.{i}", cin, w, s)
            cin = w
    fusion("mask_encoder.fuser", cfg.pixel_dim, cfg.mask_final_dim,
           cfg.value_dim)
    conv("mask_encoder.sensory_update.transform",
         cfg.value_dim + cfg.sensory_dim, 3 * cfg.sensory_dim, 3)
    conv("pixel_fuser.sensory_compress", cfg.sensory_dim + 1,
         cfg.value_dim, 1)
    fusion("pixel_fuser.fuser", cfg.pixel_dim, cfg.value_dim,
           cfg.embed_dim)
    e = cfg.embed_dim
    lin("object_summarizer.input_proj", cfg.value_dim, e)
    lin("object_summarizer.feature_pred.0", e, e)
    lin("object_summarizer.feature_pred.2", e, e)
    lin("object_summarizer.weights_pred.0", e, e)
    lin("object_summarizer.weights_pred.2", e, cfg.num_queries)
    sd["object_transformer.query_init.weight"] = rng.randn(
        cfg.num_queries, e).astype(np.float32) * 0.1
    sd["object_transformer.query_emb.weight"] = rng.randn(
        cfg.num_queries, e).astype(np.float32) * 0.1
    lin("object_transformer.summary_to_query_init", e, e)
    lin("object_transformer.summary_to_query_emb", e, e)
    conv("object_transformer.pixel_init_proj", e, e, 1)
    conv("object_transformer.pixel_emb_proj", e, e, 1)
    for i in range(cfg.num_blocks):
        bp = f"object_transformer.blocks.{i}"
        ln(f"{bp}.read_from_pixel.norm", e)
        mha(f"{bp}.read_from_pixel.cross_attn", e)
        ln(f"{bp}.self_attn.norm", e)
        mha(f"{bp}.self_attn.self_attn", e)
        ln(f"{bp}.ffn.norm", e)
        lin(f"{bp}.ffn.linear1", e, cfg.ff_dim)
        lin(f"{bp}.ffn.linear2", cfg.ff_dim, e)
        mha(f"{bp}.read_from_query.cross_attn", e)
        ca(f"{bp}.pixel_ffn.conv", e, e)
    for i in range(cfg.num_blocks + 1):
        conv(f"object_transformer.mask_pred.{i}.1", e, 1, 1)
    up = cfg.up_dims
    ms1 = (cfg.enc_widths[1], cfg.enc_widths[0], stem, 3)
    for i, (d, o) in enumerate(zip(ms1, up[:-1])):
        conv(f"mask_decoder.decoder_feat_proc.transforms.{i}", d, o, 1)

    def gres(pre, ci, co):
        conv(f"{pre}.conv1", ci, co, 3)
        conv(f"{pre}.conv2", co, co, 3)
        if ci != co:
            conv(f"{pre}.downsample", ci, co, 1)

    gres("mask_decoder.up_16_8.out_conv", up[0], up[1])
    gres("mask_decoder.up_8_4.out_conv", up[1], up[2])
    gres("mask_decoder.up_4_2.out_conv", up[2], up[3])
    gres("mask_decoder.up_2_1.out_conv", up[3], up[4])
    conv("mask_decoder.pred_mat", up[4], 1, 3)
    for nm, d in (("g16", up[0]), ("g8", up[1]), ("g4", up[2]),
                  ("g2", up[3]), ("g1", up[4] + 1)):
        conv(f"mask_decoder.sensory_update.{nm}_conv", d,
             cfg.sensory_dim, 1)
    conv("mask_decoder.sensory_update.transform", 2 * cfg.sensory_dim,
         3 * cfg.sensory_dim, 3)
    conv("temp_sparity.conv1x1_v2", 2 * cfg.pixel_dim + 1
         + cfg.value_dim, 64, 1, False)
    bn("temp_sparity.bn1", 64)
    conv("temp_sparity.conv3x3", 64, 32, 3, False)
    bn("temp_sparity.bn2", 32)
    conv("temp_sparity.conv3x3_out", 32, 1, 3, False)
    return sd


def test_loader_covers_reference_keys_and_runs():
    sd = _synthetic_state_dict(TINY)
    params, leftover = ma.load_matanyone_params(sd, TINY)
    assert leftover == []
    rng = np.random.RandomState(1)
    frames = rng.rand(2, 32, 32, 3).astype(np.float32)
    mask = np.zeros((32, 32), np.float32)
    mask[8:24, 8:24] = 1.0
    alphas = ma.matanyone_matting(params, frames, mask, TINY,
                                  n_warmup=1, mem_every=1)
    assert alphas.shape == (2, 32, 32)
    assert np.isfinite(alphas).all()
