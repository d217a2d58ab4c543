"""MMAudio TOD-VAE + BigVGAN vocoder (reference postprocessing/mmaudio/
ext/autoencoder, ext/bigvgan)."""
import math

import numpy as np
import jax
import jax.numpy as jnp

from wan2gp_tpu.postprocessing.mmaudio_vae import (
    MMAudioVAEConfig, BigVGANConfig, init_mmaudio_vae_decoder,
    mmaudio_vae_decode, bigvgan_vocode, mmaudio_latents_to_wave,
    load_mmaudio_vae_params, DATA_MEAN_80D, DATA_STD_80D)

TINY = MMAudioVAEConfig(data_dim=6, embed_dim=4, hidden_dim=8,
                        ch_mult=(1, 2, 4), num_res_blocks=1)


def _tiny_params(seed=0):
    p = init_mmaudio_vae_decoder(jax.random.key(seed), TINY)
    p["data_mean"] = jnp.zeros((6,), jnp.float32)
    p["data_std"] = jnp.ones((6,), jnp.float32)
    return p


def test_vae_decoder_torch_oracle():
    """Inline torch re-derivation of Decoder1D (vae.py:323-346) with the
    edm2 magnitude-preserving ops."""
    import torch
    import torch.nn.functional as F
    params = _tiny_params()
    rng = np.random.default_rng(0)
    z = rng.standard_normal((1, 5, 4)).astype(np.float32)
    ours = np.asarray(mmaudio_vae_decode(params, TINY, jnp.asarray(z)))
    assert ours.shape == (1, 10, 6)        # one 2x upsample

    def t(a):
        return torch.from_numpy(np.asarray(a, np.float32).copy())

    def conv(p, v):        # v [B, C, T]; our w [k, cin, cout]
        w = t(np.asarray(p["w"]).transpose(2, 1, 0))
        return F.conv1d(v, w, padding=w.shape[-1] // 2)

    def msilu(v):
        return F.silu(v) / 0.596

    def msum(a, b, tt=0.3):
        return torch.lerp(a, b, tt) / math.sqrt((1 - tt) ** 2 + tt ** 2)

    def pnorm(v, eps=1e-4):
        n = torch.linalg.vector_norm(v, dim=1, keepdim=True)
        n = torch.add(eps, n, alpha=math.sqrt(1.0 / v.shape[1]))
        return v / n

    def res(p, v):
        h = pnorm(v)
        y = conv(p["conv1"], msilu(h))
        y = conv(p["conv2"], msilu(y))
        if "nin" in p:
            h = conv(p["nin"], h)
        return msum(h, y, 0.3)

    def attn(p, v):
        y = conv(p["qkv"], v)
        b, c3, tt = y.shape
        c = c3 // 3
        y = y.reshape(b, 1, c, 3, tt)
        n = torch.linalg.vector_norm(y, dim=2, keepdim=True)
        n = torch.add(1e-4, n, alpha=math.sqrt(1.0 / c))
        q, k, vv = (y / n).unbind(3)
        q = q.permute(0, 1, 3, 2)
        k = k.permute(0, 1, 3, 2)
        vv = vv.permute(0, 1, 3, 2)
        h = F.scaled_dot_product_attention(q, k, vv)
        h = h.permute(0, 1, 3, 2).reshape(b, c, tt)
        return msum(v, conv(p["proj"], h), 0.3)

    with torch.no_grad():
        x = conv(params["conv_in"], t(z).permute(0, 2, 1))
        x = res(params["mid_block1"], x)
        x = attn(params["mid_attn"], x)
        x = res(params["mid_block2"], x)
        x = x.clamp(-256, 256)
        for i_level in reversed(range(3)):
            lev = params["up"][i_level]
            for bp in lev["blocks"]:
                x = res(bp, x).clamp(-256, 256)
            if "upsample" in lev:
                x = F.interpolate(x, scale_factor=2.0,
                                  mode="nearest-exact")
                x = conv(lev["upsample"], x)
        x = msilu(x)
        w = t(np.asarray(params["conv_out"]["w"]).transpose(2, 1, 0))
        x = F.conv1d(x, w * (1.0 + float(params["gain"])), padding=1)
        want = x.permute(0, 2, 1).numpy()
    np.testing.assert_allclose(ours, want, rtol=1e-4, atol=1e-4)


def test_vae_loader_roundtrip():
    params = _tiny_params(1)
    sd = {}

    def put(name, p):
        # invert the load fusion: store a weight whose fused form equals
        # ours — since fusion is normalize+scale, store w * sqrt(fan_in)
        # with unit norm already present; easiest: store fused weights
        # scaled so the loader's re-fusion reproduces them.
        w = np.asarray(p["w"]).transpose(2, 1, 0)     # [out, in, k]
        sd[f"decoder.{name}.weight"] = w

    put("conv_in", params["conv_in"])
    for nm in ("mid_block1", "mid_block2"):
        tgt = "mid.block_1" if nm == "mid_block1" else "mid.block_2"
        put(f"{tgt}.conv1", params[nm]["conv1"])
        put(f"{tgt}.conv2", params[nm]["conv2"])
        if "nin" in params[nm]:
            put(f"{tgt}.nin_shortcut", params[nm]["nin"])
    put("mid.attn_1.qkv", params["mid_attn"]["qkv"])
    put("mid.attn_1.proj_out", params["mid_attn"]["proj"])
    for i, lev in enumerate(params["up"]):
        for j, bp in enumerate(lev["blocks"]):
            put(f"up.{i}.block.{j}.conv1", bp["conv1"])
            put(f"up.{i}.block.{j}.conv2", bp["conv2"])
            if "nin" in bp:
                put(f"up.{i}.block.{j}.nin_shortcut", bp["nin"])
        if "upsample" in lev:
            put(f"up.{i}.upsample.conv", lev["upsample"])
    put("conv_out", params["conv_out"])
    sd["decoder.learnable_gain"] = np.asarray(params["gain"])
    loaded, left = load_mmaudio_vae_params(sd, TINY)
    assert left == []
    z = jnp.asarray(np.random.default_rng(2).standard_normal((1, 5, 4)),
                    jnp.float32)
    a = np.asarray(mmaudio_vae_decode(loaded, TINY, z,
                                      unnormalize=False))
    b = np.asarray(mmaudio_vae_decode(params, TINY, z,
                                      unnormalize=False))
    # loading re-normalizes the (already normalized) weights -> equal up
    # to the norm-eps; direction preserved
    corr = np.corrcoef(a.reshape(-1), b.reshape(-1))[0, 1]
    assert corr > 0.999


def test_bigvgan_shapes():
    from wan2gp_tpu.postprocessing.mmaudio_vae import (
        load_bigvgan_vocoder_params)
    cfg = BigVGANConfig(num_mels=6, upsample_initial_channel=8,
                        upsample_rates=(2, 2),
                        upsample_kernel_sizes=(4, 4),
                        resblock_kernel_sizes=(3,),
                        resblock_dilation_sizes=((1, 3),))
    rng = np.random.default_rng(3)
    sd = {}
    sd["conv_pre.weight"] = rng.standard_normal((8, 6, 7)).astype(
        np.float32) * 0.1
    sd["conv_pre.bias"] = np.zeros(8, np.float32)
    ch = 8
    for i in range(2):
        sd[f"ups.{i}.0.weight"] = rng.standard_normal(
            (ch, ch // 2, 4)).astype(np.float32) * 0.1
        sd[f"ups.{i}.0.bias"] = np.zeros(ch // 2, np.float32)
        ch //= 2
        pre = f"resblocks.{i}"
        for j in range(2):
            c = 8 // 2 ** (i + 1)
            sd[f"{pre}.convs1.{j}.weight"] = rng.standard_normal(
                (c, c, 3)).astype(np.float32) * 0.1
            sd[f"{pre}.convs1.{j}.bias"] = np.zeros(c, np.float32)
            sd[f"{pre}.convs2.{j}.weight"] = rng.standard_normal(
                (c, c, 3)).astype(np.float32) * 0.1
            sd[f"{pre}.convs2.{j}.bias"] = np.zeros(c, np.float32)
            for a in (2 * j, 2 * j + 1):
                sd[f"{pre}.activations.{a}.act.alpha"] = np.zeros(
                    c, np.float32)
                sd[f"{pre}.activations.{a}.act.beta"] = np.zeros(
                    c, np.float32)
    sd["activation_post.act.alpha"] = np.zeros(2, np.float32)
    sd["activation_post.act.beta"] = np.zeros(2, np.float32)
    sd["conv_post.weight"] = rng.standard_normal((1, 2, 7)).astype(
        np.float32) * 0.1
    sd["conv_post.bias"] = np.zeros(1, np.float32)
    params, left = load_bigvgan_vocoder_params(sd, cfg)
    assert left == []
    mel = jnp.asarray(rng.standard_normal((1, 10, 6)), jnp.float32)
    wave = bigvgan_vocode(params, cfg, mel)
    assert wave.shape == (1, 40)             # x4 upsample
    assert np.isfinite(np.asarray(wave)).all()
    assert np.abs(np.asarray(wave)).max() <= 1.0


# -- MMAudio flow network ---------------------------------------------------

def test_mmaudio_net_forward_and_generate():
    from wan2gp_tpu.postprocessing.mmaudio_net import (
        MMAudioNetConfig, init_mmaudio_net,
        mmaudio_preprocess_conditions, empty_conditions,
        mmaudio_predict_flow, mmaudio_generate_latents)
    cfg = MMAudioNetConfig(latent_dim=4, clip_dim=8, sync_dim=16,
                           text_dim=8, hidden_dim=16, depth=3,
                           fused_depth=1, num_heads=2,
                           latent_seq_len=10, clip_seq_len=4,
                           sync_seq_len=8, text_seq_len=5)
    params = init_mmaudio_net(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    clip_f = jnp.asarray(rng.standard_normal((1, 4, 8)), jnp.float32)
    sync_f = jnp.asarray(rng.standard_normal((1, 8, 16)), jnp.float32)
    text_f = jnp.asarray(rng.standard_normal((1, 5, 8)), jnp.float32)
    cond = mmaudio_preprocess_conditions(params, cfg, clip_f, sync_f,
                                         text_f)
    assert cond["sync_f"].shape == (1, 10, 16)   # resampled to latent
    lat = jnp.asarray(rng.standard_normal((1, 10, 4)), jnp.float32)
    v1 = mmaudio_predict_flow(params, cfg, lat, jnp.asarray([0.3]),
                              cond)
    assert v1.shape == (1, 10, 4)
    assert np.isfinite(np.asarray(v1)).all()
    # timestep and text features steer the flow
    v2 = mmaudio_predict_flow(params, cfg, lat, jnp.asarray([0.9]),
                              cond)
    assert not np.allclose(np.asarray(v1), np.asarray(v2))
    cond2 = mmaudio_preprocess_conditions(params, cfg, clip_f, sync_f,
                                          text_f * -1.0)
    v3 = mmaudio_predict_flow(params, cfg, lat, jnp.asarray([0.3]),
                              cond2)
    assert not np.allclose(np.asarray(v1), np.asarray(v3))

    un = empty_conditions(params, cfg)
    out = mmaudio_generate_latents(params, cfg, cond, un, num_steps=2,
                                   cfg_strength=4.5,
                                   key=jax.random.key(1))
    assert out.shape == (1, 10, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_mmaudio_net_loader_roundtrip():
    from wan2gp_tpu.postprocessing.mmaudio_net import (
        MMAudioNetConfig, init_mmaudio_net, load_mmaudio_net_params,
        mmaudio_preprocess_conditions, mmaudio_predict_flow)
    cfg = MMAudioNetConfig(latent_dim=4, clip_dim=8, sync_dim=16,
                           text_dim=8, hidden_dim=16, depth=3,
                           fused_depth=1, num_heads=2,
                           latent_seq_len=10, clip_seq_len=4,
                           sync_seq_len=8, text_seq_len=5)
    params = init_mmaudio_net(jax.random.key(2), cfg)
    sd = {}

    def put_lin(name, p):
        sd[f"{name}.weight"] = np.asarray(p["w"]).T
        if "b" in p:
            sd[f"{name}.bias"] = np.asarray(p["b"])

    def put_auto(name, p):
        w = np.asarray(p["w"])
        if w.ndim == 3:
            sd[f"{name}.weight"] = w.transpose(2, 1, 0)
            if "b" in p:
                sd[f"{name}.bias"] = np.asarray(p["b"])
        else:
            put_lin(name, p)

    def put_swiglu(name, p):
        for k in ("w1", "w2", "w3"):
            put_auto(f"{name}.{k}", p[k])

    put_auto("audio_input_proj.0", params["audio_in"]["in"])
    put_swiglu("audio_input_proj.2", params["audio_in"]["mlp"])
    put_auto("clip_input_proj.0", params["clip_in"]["in"])
    put_swiglu("clip_input_proj.1", params["clip_in"]["mlp"])
    put_auto("sync_input_proj.0", params["sync_in"]["in"])
    put_swiglu("sync_input_proj.2", params["sync_in"]["mlp"])
    put_auto("text_input_proj.0", params["text_in"]["in"])
    put_swiglu("text_input_proj.1", params["text_in"]["mlp"])
    put_lin("clip_cond_proj", params["clip_cond_proj"])
    put_lin("text_cond_proj", params["text_cond_proj"])
    put_swiglu("global_cond_mlp", params["global_cond_mlp"])
    sd["sync_pos_emb"] = np.asarray(params["sync_pos_emb"])
    put_lin("t_embed.mlp.0", params["t_embed"]["fc1"])
    put_lin("t_embed.mlp.2", params["t_embed"]["fc2"])
    put_lin("final_layer.adaLN_modulation.1", params["final_mod"])
    put_auto("final_layer.conv", params["final_conv"])
    for k in ("latent_mean", "latent_std", "empty_string_feat",
              "empty_clip_feat", "empty_sync_feat"):
        sd[k] = np.asarray(params[k])

    def put_block(name, bp):
        put_lin(f"{name}.attn.qkv", bp["qkv"])
        sd[f"{name}.attn.q_norm.weight"] = np.asarray(bp["q_norm"])
        sd[f"{name}.attn.k_norm.weight"] = np.asarray(bp["k_norm"])
        put_lin(f"{name}.adaLN_modulation.1", bp["mod"])
        if not bp["pre_only"]:
            put_auto(f"{name}.linear1", bp["linear1"])
            put_swiglu(f"{name}.ffn", bp["ffn"])

    for i, jb in enumerate(params["joint_blocks"]):
        put_block(f"joint_blocks.{i}.latent_block", jb["latent"])
        put_block(f"joint_blocks.{i}.clip_block", jb["clip"])
        put_block(f"joint_blocks.{i}.text_block", jb["text"])
    for i, fb in enumerate(params["fused_blocks"]):
        put_block(f"fused_blocks.{i}", fb)
    loaded, left = load_mmaudio_net_params(sd, cfg)
    assert left == []
    rng = np.random.default_rng(3)
    clip_f = jnp.asarray(rng.standard_normal((1, 4, 8)), jnp.float32)
    sync_f = jnp.asarray(rng.standard_normal((1, 8, 16)), jnp.float32)
    text_f = jnp.asarray(rng.standard_normal((1, 5, 8)), jnp.float32)
    lat = jnp.asarray(rng.standard_normal((1, 10, 4)), jnp.float32)
    c1 = mmaudio_preprocess_conditions(params, cfg, clip_f, sync_f,
                                       text_f)
    c2 = mmaudio_preprocess_conditions(loaded, cfg, clip_f, sync_f,
                                       text_f)
    np.testing.assert_allclose(
        np.asarray(mmaudio_predict_flow(loaded, cfg, lat,
                                        jnp.asarray([0.4]), c2)),
        np.asarray(mmaudio_predict_flow(params, cfg, lat,
                                        jnp.asarray([0.4]), c1)),
        atol=1e-5)
