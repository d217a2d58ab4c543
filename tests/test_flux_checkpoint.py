"""Flux checkpoint conversion tests (synthetic BFL/HF-layout state dicts)."""
import numpy as np
import jax
import jax.numpy as jnp

from wan2gp_tpu.io.flux_checkpoint import (
    load_flux_params, load_flux_vae_params, load_clip_text_params,
    normalize_flux_sd)
from wan2gp_tpu.models.flux.dit import (
    FluxConfig, flux_forward, rope_from_ids, make_img_ids)
from wan2gp_tpu.models.flux.vae import (
    FluxVAEConfig, flux_vae_decode, flux_vae_encode)
from wan2gp_tpu.models.flux.clip import ClipTextConfig, clip_text_encode

TINY = FluxConfig(in_channels=16, out_channels=16, vec_in_dim=8,
                  context_in_dim=12, hidden_size=32, mlp_ratio=2.0,
                  num_heads=4, depth=2, depth_single_blocks=2,
                  axes_dim=(4, 2, 2), guidance_embed=True)


def _rand_flux_sd(cfg, rng):
    sd = {}

    def lin(name, din, dout, bias=True):
        sd[f"{name}.weight"] = rng.standard_normal(
            (dout, din)).astype(np.float32) * 0.05
        if bias:
            sd[f"{name}.bias"] = np.zeros(dout, np.float32)

    h = cfg.hidden_size
    lin("img_in", cfg.in_channels, h)
    lin("txt_in", cfg.context_in_dim, h)
    for name, din in (("time_in", 256), ("vector_in", cfg.vec_in_dim),
                      ("guidance_in", 256)):
        lin(f"{name}.in_layer", din, h)
        lin(f"{name}.out_layer", h, h)
    for i in range(cfg.depth):
        for s in ("img", "txt"):
            lin(f"double_blocks.{i}.{s}_mod.lin", h, 6 * h)
            lin(f"double_blocks.{i}.{s}_attn.qkv", h, 3 * h)
            sd[f"double_blocks.{i}.{s}_attn.norm.query_norm.scale"] = \
                np.ones(cfg.head_dim, np.float32)
            sd[f"double_blocks.{i}.{s}_attn.norm.key_norm.scale"] = \
                np.ones(cfg.head_dim, np.float32)
            lin(f"double_blocks.{i}.{s}_attn.proj", h, h)
            lin(f"double_blocks.{i}.{s}_mlp.0", h, cfg.mlp_hidden)
            lin(f"double_blocks.{i}.{s}_mlp.2", cfg.mlp_hidden, h)
    for i in range(cfg.depth_single_blocks):
        lin(f"single_blocks.{i}.modulation.lin", h, 3 * h)
        lin(f"single_blocks.{i}.linear1", h, 3 * h + cfg.mlp_hidden)
        lin(f"single_blocks.{i}.linear2", h + cfg.mlp_hidden, h)
        sd[f"single_blocks.{i}.norm.query_norm.scale"] = \
            np.ones(cfg.head_dim, np.float32)
        sd[f"single_blocks.{i}.norm.key_norm.scale"] = \
            np.ones(cfg.head_dim, np.float32)
    lin("final_layer.adaLN_modulation.1", h, 2 * h)
    lin("final_layer.linear", h, cfg.out_channels)
    return sd


def test_flux_dit_loader():
    rng = np.random.default_rng(0)
    sd = {"model.diffusion_model." + k: v
          for k, v in _rand_flux_sd(TINY, rng).items()}
    params, leftover = load_flux_params(normalize_flux_sd(sd), TINY)
    assert leftover == []
    img = jnp.asarray(rng.standard_normal((1, 4, 16)), jnp.float32)
    txt = jnp.asarray(rng.standard_normal((1, 3, 12)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((1, 8)), jnp.float32)
    ids = np.concatenate([np.zeros((3, 3)), make_img_ids(2, 2)])
    cos, sin = rope_from_ids(ids, TINY.axes_dim, TINY.theta)
    out = flux_forward(params, TINY, img, txt, y, jnp.asarray([0.5]),
                       cos, sin, guidance=jnp.asarray([3.5]),
                       attn_backend="xla")
    assert out.shape == (1, 4, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_flux_vae_loader():
    cfg = FluxVAEConfig(ch=8, ch_mult=(1, 2), num_res_blocks=1, z_channels=4)
    rng = np.random.default_rng(1)
    sd = {}

    def conv(name, cin, cout, k=3):
        sd[f"{name}.weight"] = rng.standard_normal(
            (cout, cin, k, k)).astype(np.float32) * 0.05
        sd[f"{name}.bias"] = np.zeros(cout, np.float32)

    def norm(name, c):
        sd[f"{name}.weight"] = np.ones(c, np.float32)
        sd[f"{name}.bias"] = np.zeros(c, np.float32)

    def res(name, cin, cout):
        norm(f"{name}.norm1", cin)
        conv(f"{name}.conv1", cin, cout)
        norm(f"{name}.norm2", cout)
        conv(f"{name}.conv2", cout, cout)
        if cin != cout:
            conv(f"{name}.nin_shortcut", cin, cout, k=1)

    def attn(name, c):
        norm(f"{name}.norm", c)
        for m in ("q", "k", "v", "proj_out"):
            conv(f"{name}.{m}", c, c, k=1)

    conv("encoder.conv_in", 3, 8)
    res("encoder.down.0.block.0", 8, 8)
    conv("encoder.down.0.downsample.conv", 8, 8)
    res("encoder.down.1.block.0", 8, 16)
    res("encoder.mid.block_1", 16, 16)
    attn("encoder.mid.attn_1", 16)
    res("encoder.mid.block_2", 16, 16)
    norm("encoder.norm_out", 16)
    conv("encoder.conv_out", 16, 8)
    conv("decoder.conv_in", 4, 16)
    res("decoder.mid.block_1", 16, 16)
    attn("decoder.mid.attn_1", 16)
    res("decoder.mid.block_2", 16, 16)
    res("decoder.up.1.block.0", 16, 16)
    res("decoder.up.1.block.1", 16, 16)
    conv("decoder.up.1.upsample.conv", 16, 16)
    res("decoder.up.0.block.0", 16, 8)
    res("decoder.up.0.block.1", 8, 8)
    norm("decoder.norm_out", 8)
    conv("decoder.conv_out", 8, 3)

    params, leftover = load_flux_vae_params(sd, cfg)
    assert leftover == []
    img = jnp.asarray(rng.uniform(-1, 1, (1, 8, 8, 3)), jnp.float32)
    z = flux_vae_encode(params, cfg, img)
    assert z.shape == (1, 4, 4, 4)
    out = flux_vae_decode(params, cfg, z)
    assert out.shape == (1, 8, 8, 3)


def test_clip_text_loader():
    cfg = ClipTextConfig(vocab_size=50, dim=16, num_heads=2, num_layers=2,
                         mlp_dim=32, max_len=10, eos_token_id=49)
    rng = np.random.default_rng(2)
    sd = {"text_model.embeddings.token_embedding.weight":
          rng.standard_normal((50, 16)).astype(np.float32),
          "text_model.embeddings.position_embedding.weight":
          rng.standard_normal((10, 16)).astype(np.float32),
          "text_model.final_layer_norm.weight": np.ones(16, np.float32),
          "text_model.final_layer_norm.bias": np.zeros(16, np.float32)}
    for i in range(2):
        pre = f"text_model.encoder.layers.{i}"
        for m in ("q_proj", "k_proj", "v_proj", "out_proj"):
            sd[f"{pre}.self_attn.{m}.weight"] = rng.standard_normal(
                (16, 16)).astype(np.float32) * 0.05
            sd[f"{pre}.self_attn.{m}.bias"] = np.zeros(16, np.float32)
        for ln in ("layer_norm1", "layer_norm2"):
            sd[f"{pre}.{ln}.weight"] = np.ones(16, np.float32)
            sd[f"{pre}.{ln}.bias"] = np.zeros(16, np.float32)
        sd[f"{pre}.mlp.fc1.weight"] = rng.standard_normal(
            (32, 16)).astype(np.float32) * 0.05
        sd[f"{pre}.mlp.fc1.bias"] = np.zeros(32, np.float32)
        sd[f"{pre}.mlp.fc2.weight"] = rng.standard_normal(
            (16, 32)).astype(np.float32) * 0.05
        sd[f"{pre}.mlp.fc2.bias"] = np.zeros(16, np.float32)
    params, leftover = load_clip_text_params(sd, cfg)
    assert leftover == []
    ids = jnp.asarray([[3, 5, 49, 49]], jnp.int32)
    hidden, pooled = clip_text_encode(params, cfg, ids)
    assert hidden.shape == (1, 4, 16) and pooled.shape == (1, 16)


def test_fold_1x1_composition():
    """quant-conv folding must equal running the two convs in sequence."""
    import numpy as np
    from wan2gp_tpu.io.flux_checkpoint import _fold_1x1, _fold_1x1_pre

    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 5, 5)).astype(np.float32)       # [C,H,W]
    wi = rng.standard_normal((4, 3, 3, 3)).astype(np.float32)   # inner conv
    bi = rng.standard_normal(4).astype(np.float32)
    wq = rng.standard_normal((6, 4, 1, 1)).astype(np.float32)   # 1x1 after
    bq = rng.standard_normal(6).astype(np.float32)

    def conv(x, w, b):
        co, ci, kh, kw = w.shape
        h, wdt = x.shape[1] - kh + 1, x.shape[2] - kw + 1
        out = np.zeros((co, h, wdt), np.float32)
        for i in range(h):
            for j in range(wdt):
                patch = x[:, i:i + kh, j:j + kw]
                out[:, i, j] = np.tensordot(w, patch, 3) + b
        return out

    seq = conv(conv(x, wi, bi), wq, bq)
    wf, bf = _fold_1x1(wq, bq, wi, bi)
    np.testing.assert_allclose(conv(x, wf, bf), seq, rtol=1e-4, atol=1e-4)

    # pre-fold: 1x1 then kxk
    wq2 = rng.standard_normal((3, 3, 1, 1)).astype(np.float32)
    bq2 = rng.standard_normal(3).astype(np.float32)
    seq2 = conv(conv(x, wq2, bq2), wi, bi)
    wf2, bf2 = _fold_1x1_pre(wi, bi, wq2, bq2)
    np.testing.assert_allclose(conv(x, wf2, bf2), seq2, rtol=1e-4, atol=1e-4)


def test_diffusers_vae_key_mapping():
    """diffusers AutoencoderKL keys load through the BFL flux VAE loader."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from wan2gp_tpu.io.flux_checkpoint import (normalize_diffusers_vae_sd,
                                               load_flux_vae_params)
    from wan2gp_tpu.models.flux.vae import (FluxVAEConfig, init_flux_vae,
                                            flux_vae_decode)
    cfg = FluxVAEConfig(ch=8, ch_mult=(1, 2), num_res_blocks=1,
                        z_channels=4)
    rng = np.random.default_rng(1)

    def conv(co, ci, k=3):
        return (rng.standard_normal((co, ci, k, k)).astype(np.float32)
                * 0.05, np.zeros(co, np.float32))

    sd = {}

    def put(name, co, ci, k=3):
        w, b = conv(co, ci, k)
        sd[f"{name}.weight"] = w
        sd[f"{name}.bias"] = b

    def put_norm(name, c):
        sd[f"{name}.weight"] = np.ones(c, np.float32)
        sd[f"{name}.bias"] = np.zeros(c, np.float32)

    def put_res(pre, cin, cout):
        put_norm(f"{pre}.norm1", cin)
        put(f"{pre}.conv1", cout, cin)
        put_norm(f"{pre}.norm2", cout)
        put(f"{pre}.conv2", cout, cout)
        if cin != cout:
            put(f"{pre}.conv_shortcut", cout, cin, 1)

    def put_attn(pre, c):
        put_norm(f"{pre}.group_norm", c)
        for m in ("to_q", "to_k", "to_v", "to_out.0"):
            sd[f"{pre}.{m}.weight"] = \
                rng.standard_normal((c, c)).astype(np.float32) * 0.05
            sd[f"{pre}.{m}.bias"] = np.zeros(c, np.float32)

    chs = [8, 16]   # ch * ch_mult
    # encoder
    put("encoder.conv_in", 8, 3)
    cin = 8
    for i, c in enumerate(chs):
        put_res(f"encoder.down_blocks.{i}.resnets.0", cin, c)
        cin = c
        if i != len(chs) - 1:
            put(f"encoder.down_blocks.{i}.downsamplers.0.conv", c, c)
    put_res("encoder.mid_block.resnets.0", 16, 16)
    put_attn("encoder.mid_block.attentions.0", 16)
    put_res("encoder.mid_block.resnets.1", 16, 16)
    put_norm("encoder.conv_norm_out", 16)
    put("encoder.conv_out", 8, 16)     # 2*z
    put("quant_conv", 8, 8, 1)
    # decoder (diffusers order: high channels first)
    put("post_quant_conv", 4, 4, 1)
    put("decoder.conv_in", 16, 4)
    put_res("decoder.mid_block.resnets.0", 16, 16)
    put_attn("decoder.mid_block.attentions.0", 16)
    put_res("decoder.mid_block.resnets.1", 16, 16)
    rev = list(reversed(chs))           # [16, 8]
    cin = 16
    for i, c in enumerate(rev):
        for j in range(cfg.num_res_blocks + 1):
            put_res(f"decoder.up_blocks.{i}.resnets.{j}", cin, c)
            cin = c
        if i != len(chs) - 1:
            put(f"decoder.up_blocks.{i}.upsamplers.0.conv", c, c)
    put_norm("decoder.conv_norm_out", 8)
    put("decoder.conv_out", 3, 8)

    bfl = normalize_diffusers_vae_sd(sd, n_stages=len(chs))
    params, left = load_flux_vae_params(bfl, cfg)
    assert left == [], left[:6]
    z = jnp.asarray(rng.standard_normal((1, 4, 4, 4)).transpose(0, 2, 3, 1),
                    jnp.float32)
    img = flux_vae_decode(params, cfg, z)
    assert img.shape == (1, 8, 8, 3)
    assert np.isfinite(np.asarray(img)).all()
