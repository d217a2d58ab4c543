"""Parity vs goldens executed by the REFERENCE'S OWN code.

tests/goldens/*_ref_*.npz / wan_block_ref.npz were produced by
tests/goldens/generate_from_reference.py, which imports the actual
modules under /root/reference (shared/utils/fm_solvers_unipc.py,
fm_solvers.py, basic_flowmatch.py, models/wan/modules/model.py) behind
minimal diffusers/mmgp shims — unlike generate.py's re-derived oracles,
a transcription error cannot self-confirm here."""
import numpy as np
import jax.numpy as jnp

from tests.test_goldens import _load


def _velocity(x, t):
    """Same deterministic fake velocity as the reference-side generator."""
    return 0.3 * x * np.float32(np.cos(float(t) / 250.0)) - 0.1


def _run_solver(name, n, shift, x0, timesteps, **kw):
    from wan2gp_tpu.schedulers import make_schedule
    from wan2gp_tpu.schedulers.base import solver_step, init_solver_state
    sched = make_schedule(name, n, shift=shift, **kw)
    np.testing.assert_allclose(np.asarray(sched.timesteps, np.float64),
                               np.asarray(timesteps, np.float64),
                               rtol=0, atol=1e-4)
    x = jnp.asarray(x0, jnp.float32)
    state = init_solver_state(sched, x)
    traj = []
    for i in range(n):
        ci = {k: v[i] for k, v in sched.coeffs.items()}
        v = jnp.asarray(_velocity(np.asarray(x), sched.timesteps[i]))
        x, state = solver_step(sched, i, ci, v, x, state)
        traj.append(np.asarray(x))
    return sched, np.stack(traj)


def test_ref_unipc_orders():
    g = _load("unipc_ref_trace.npz")
    for order in (2, 3):
        sched, traj = _run_solver("unipc", 8, 5.0, g["x0"],
                                  g[f"timesteps_o{order}"],
                                  solver_order=order)
        # the reference keeps a trailing sigma row; compare the N steps
        np.testing.assert_allclose(
            np.asarray(sched.sigmas, np.float64),
            g[f"sigmas_o{order}"][:len(np.asarray(sched.sigmas))],
            rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(traj, g[f"traj_o{order}"],
                                   rtol=5e-4, atol=5e-4)


def test_ref_dpm():
    g = _load("dpm_ref_trace.npz")
    _, traj = _run_solver("dpm++", 8, 5.0, g["x0"], g["timesteps"],
                          solver_order=2)
    np.testing.assert_allclose(traj, g["traj"], rtol=5e-4, atol=5e-4)


def test_ref_causvid_flowmatch():
    g = _load("flowmatch_ref_trace.npz")
    _, traj = _run_solver("causvid", 9, 8.0, g["x0"], g["timesteps"])
    np.testing.assert_allclose(traj, g["traj"], rtol=5e-4, atol=5e-4)


def test_ref_wan_block():
    from wan2gp_tpu.models.wan.dit import _block, WanDiTConfig
    from wan2gp_tpu.ops.rope import build_rope_3d
    g = _load("wan_block_ref.npz")
    dim, n_heads, ffn_dim = (int(v) for v in g["dims"])
    f, h, w = (int(v) for v in g["grid"])
    cfg = WanDiTConfig(dim=dim, ffn_dim=ffn_dim, num_heads=n_heads,
                       num_layers=1, compute_dtype=jnp.float32)

    def lin(prefix):
        return {"w": jnp.asarray(g[prefix + "__weight"].T),
                "b": jnp.asarray(g[prefix + "__bias"])}

    def attn(prefix):
        return {"q": lin(prefix + "__q"), "k": lin(prefix + "__k"),
                "v": lin(prefix + "__v"), "o": lin(prefix + "__o"),
                "norm_q": jnp.asarray(g[prefix + "__norm_q__weight"]),
                "norm_k": jnp.asarray(g[prefix + "__norm_k__weight"])}

    bp = {
        "self_attn": attn("self_attn"),
        "cross_attn": attn("cross_attn"),
        "norm3": {"w": jnp.asarray(g["norm3__weight"]),
                  "b": jnp.asarray(g["norm3__bias"])},
        "ffn": {"fc1": lin("ffn__0"), "fc2": lin("ffn__2")},
        "modulation": jnp.asarray(g["modulation__weight"][0]),
    }
    cos, sin = build_rope_3d((f, h, w), head_dim=dim // n_heads)
    # the reference block receives e [B, 6, C]; ours takes [B, T, 6, C]
    e6 = jnp.asarray(g["e"])[:, None]
    out = _block(bp, jnp.asarray(g["x"]), e6, jnp.asarray(g["ctx"]),
                 None, cos, sin, cfg, attn_backend="xla")
    np.testing.assert_allclose(np.asarray(out), g["out"],
                               rtol=5e-4, atol=5e-4)


def test_ref_flux_blocks():
    """Flux Double/SingleStreamBlock vs the reference's OWN executed
    layers.py modules (float64 oracle, app-style pre-split linears,
    EmbedND pe) — generate_from_reference.py gen_flux_blocks_ref."""
    import dataclasses
    from wan2gp_tpu.models.flux.dit import (FluxConfig, _double_block,
                                            _single_block, rope_from_ids)
    g = _load("flux_blocks_ref.npz")
    h, n, mlp = (int(v) for v in g["dims"])
    cfg = FluxConfig(hidden_size=h, num_heads=n, mlp_ratio=mlp / h,
                     axes_dim=tuple(int(a) for a in g["axes_dim"]),
                     depth=1, depth_single_blocks=1)
    cfg = dataclasses.replace(cfg, compute_dtype=jnp.float32)

    def lin(k):
        return {"w": jnp.asarray(g[k + "__weight"].T),
                "b": jnp.asarray(g[k + "__bias"])}

    def stream(s):
        return {"mod": lin(f"dbl__{s}_mod__lin"),
                "qkv": lin(f"dbl__{s}_attn__qkv"),
                "proj": lin(f"dbl__{s}_attn__proj"),
                "mlp1": lin(f"dbl__{s}_mlp__0"),
                "mlp2": lin(f"dbl__{s}_mlp__2"),
                "norm_q": jnp.asarray(
                    g[f"dbl__{s}_attn__norm__query_norm__scale"]),
                "norm_k": jnp.asarray(
                    g[f"dbl__{s}_attn__norm__key_norm__scale"])}

    bp = {"img": stream("img"), "txt": stream("txt")}
    cos, sin = rope_from_ids(jnp.asarray(g["ids"]), cfg.axes_dim, cfg.theta)
    txt_len = g["txt"].shape[1]
    img, txt = _double_block(bp, jnp.asarray(g["img"]),
                             jnp.asarray(g["txt"]), jnp.asarray(g["vec"]),
                             cos, sin, txt_len, cfg, "xla")
    np.testing.assert_allclose(np.asarray(img), g["out_img"],
                               rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(txt), g["out_txt"],
                               rtol=5e-4, atol=5e-4)

    sp = {"mod": lin("sgl__modulation__lin"),
          "linear1": lin("sgl__linear1"),
          "linear2": lin("sgl__linear2"),
          "norm_q": jnp.asarray(g["sgl__norm__query_norm__scale"]),
          "norm_k": jnp.asarray(g["sgl__norm__key_norm__scale"])}
    out = _single_block(sp, jnp.asarray(g["x"]), jnp.asarray(g["vec"]),
                        cos, sin, cfg, "xla")
    np.testing.assert_allclose(np.asarray(out), g["out_sgl"],
                               rtol=5e-4, atol=5e-4)


def test_ref_hyvideo_double_block():
    """Hunyuan MMDoubleStreamBlock vs the reference's OWN executed
    models.py module (its production bf16 — the forward hard-casts
    modulated streams to bf16, so tolerance is bf16-grade) with the
    model's own get_nd_rotary_pos_embed freqs (theta 256)."""
    import dataclasses
    from wan2gp_tpu.models.hyvideo.dit import (HunyuanConfig, _double_block,
                                               build_hunyuan_rope)
    g = _load("hyvideo_block_ref.npz")
    h, n, mlp = (int(v) for v in g["dims"])
    grid = tuple(int(v) for v in g["grid"])
    cfg = HunyuanConfig(hidden_size=h, heads_num=n,
                        rope_dim_list=tuple(int(v) for v in g["rope_dims"]),
                        mm_double_blocks_depth=1, mm_single_blocks_depth=1)
    cfg = dataclasses.replace(cfg, compute_dtype=jnp.float32)

    def fuse(*keys):
        return jnp.asarray(np.concatenate([g[k] for k in keys], axis=0).T)

    def stream(s):
        return {
            "mod": {"w": jnp.asarray(g[f"{s}_mod__linear__weight"].T),
                    "b": jnp.asarray(g[f"{s}_mod__linear__bias"])},
            "qkv": {"w": fuse(f"{s}_attn_q__weight", f"{s}_attn_k__weight",
                              f"{s}_attn_v__weight"),
                    "b": jnp.asarray(np.concatenate(
                        [g[f"{s}_attn_q__bias"], g[f"{s}_attn_k__bias"],
                         g[f"{s}_attn_v__bias"]]))},
            "proj": {"w": jnp.asarray(g[f"{s}_attn_proj__weight"].T),
                     "b": jnp.asarray(g[f"{s}_attn_proj__bias"])},
            "mlp1": {"w": jnp.asarray(g[f"{s}_mlp__fc1__weight"].T),
                     "b": jnp.asarray(g[f"{s}_mlp__fc1__bias"])},
            "mlp2": {"w": jnp.asarray(g[f"{s}_mlp__fc2__weight"].T),
                     "b": jnp.asarray(g[f"{s}_mlp__fc2__bias"])},
            "norm_q": jnp.asarray(g[f"{s}_attn_q_norm__weight"]),
            "norm_k": jnp.asarray(g[f"{s}_attn_k_norm__weight"]),
        }

    bp = {"img": stream("img"), "txt": stream("txt")}
    lt = g["txt"].shape[1]
    li = g["img"].shape[1]
    cos, sin = build_hunyuan_rope(grid, cfg.rope_dim_list, txt_len=lt,
                                  theta=256.0)
    img, txt = _double_block(bp, jnp.asarray(g["img"]),
                             jnp.asarray(g["txt"]), jnp.asarray(g["vec"]),
                             jnp.asarray(cos), jnp.asarray(sin), li, cfg,
                             "xla")
    np.testing.assert_allclose(np.asarray(img), g["out_img"],
                               rtol=4e-2, atol=4e-2)
    np.testing.assert_allclose(np.asarray(txt), g["out_txt"],
                               rtol=4e-2, atol=4e-2)


def test_ref_ltx2_block():
    """LTX-2 BasicAVTransformerBlock (video+audio self/text-cross/
    av-cross/FFN, gated attention) vs the reference's OWN executed
    transformer.py module with its own precompute_freqs_cis interleaved
    rope — generate_from_reference.py gen_ltx2_block_ref (fp32 oracle:
    the reference's in-place rms_norm pins accumulation to fp32)."""
    from wan2gp_tpu.models.ltx2.dit import LTX2Config, _block
    g = _load("ltx2_block_ref.npz")
    dv, hv, da, ha = (int(v) for v in g["dims"])
    cfg = LTX2Config(num_layers=1, num_heads=hv, head_dim=dv // hv,
                     audio_num_heads=ha, audio_head_dim=da // ha,
                     gated_attention=True, cross_attention_adaln=False,
                     rope_type="interleaved",
                     compute_dtype=jnp.float32,
                     residual_dtype=jnp.float32)

    def lin(k):
        return {"w": jnp.asarray(g[k + "__weight"].T),
                "b": jnp.asarray(g[k + "__bias"])}

    def attnp(s):
        return {"to_q": lin(f"{s}__to_q"), "to_k": lin(f"{s}__to_k"),
                "to_v": lin(f"{s}__to_v"), "to_out": lin(f"{s}__to_out__0"),
                "q_norm": jnp.asarray(g[f"{s}__q_norm__weight"]),
                "k_norm": jnp.asarray(g[f"{s}__k_norm__weight"]),
                "to_gate_logits": lin(f"{s}__to_gate_logits")}

    def ffp(s):
        return {"fc1": lin(f"{s}__net__0__proj"),
                "fc2": lin(f"{s}__net__2")}

    bp = {"attn1": attnp("attn1"), "attn2": attnp("attn2"),
          "ff": ffp("ff"),
          "scale_shift_table": jnp.asarray(g["scale_shift_table"]),
          "audio_attn1": attnp("audio_attn1"),
          "audio_attn2": attnp("audio_attn2"),
          "audio_ff": ffp("audio_ff"),
          "audio_scale_shift_table":
              jnp.asarray(g["audio_scale_shift_table"]),
          "audio_to_video_attn": attnp("audio_to_video_attn"),
          "video_to_audio_attn": attnp("video_to_audio_attn"),
          "sst_av_audio": jnp.asarray(g["scale_shift_table_a2v_ca_audio"]),
          "sst_av_video": jnp.asarray(g["scale_shift_table_a2v_ca_video"])}

    def rp(name, heads, hd):
        # reference interleaved freqs: [1, L, inner] with one value per
        # adjacent pair (repeat_interleave; front pad is pair-aligned) ->
        # ours [L, H, hd//2] (pair index p = flat//2, head = p//(hd//2))
        cos, sin = g[f"{name}_cos"][0], g[f"{name}_sin"][0]
        L = cos.shape[0]
        return (jnp.asarray(cos[:, 0::2].reshape(L, heads, hd // 2)),
                jnp.asarray(sin[:, 0::2].reshape(L, heads, hd // 2)))

    ropes = (rp("pe_v", hv, dv // hv), rp("pe_a", ha, da // ha),
             rp("pe_vx", ha, da // ha), rp("pe_ax", ha, da // ha))
    mods = (jnp.asarray(g["v_t"]), jnp.asarray(g["a_t"]),
            jnp.asarray(g["v_css"]), jnp.asarray(g["v_cg"]),
            jnp.asarray(g["a_css"]), jnp.asarray(g["a_cg"]), None, None)
    masks = (jnp.asarray(g["v_ctx"]), jnp.asarray(g["a_ctx"]), None, None)

    out_v, out_a = _block(bp, cfg, jnp.asarray(g["vx"]),
                          jnp.asarray(g["ax"]), mods, ropes, masks, "xla")
    np.testing.assert_allclose(np.asarray(out_v), g["out_v"],
                               rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(out_a), g["out_a"],
                               rtol=5e-4, atol=5e-4)


def test_ref_qwen_block():
    """QwenImageTransformerBlock + QwenEmbedRope(scale_rope=True) vs the
    reference's OWN executed transformer_qwenimage.py:480/:149 (float64
    oracle behind diffusers-layout shims; the attention/modulation math
    run is the reference processor's) — generate_from_reference.py
    gen_qwen_block_ref."""
    from wan2gp_tpu.models.qwen.dit import (QwenImageConfig, _block,
                                            qwen_rope)
    g = _load("qwen_block_ref.npz")
    d, n, hd = (int(v) for v in g["dims"])
    cfg = QwenImageConfig(num_layers=1, attention_head_dim=hd,
                          num_attention_heads=n, axes_dims_rope=(4, 6, 6),
                          compute_dtype=jnp.float32)
    assert cfg.inner_dim == d

    def lin(k):
        return {"w": jnp.asarray(g[k + "__weight"].T),
                "b": jnp.asarray(g[k + "__bias"])}

    bp = {"img_mod": lin("img_mod__1"), "txt_mod": lin("txt_mod__1"),
          "img_attn": {"q": lin("attn__to_q"), "k": lin("attn__to_k"),
                       "v": lin("attn__to_v"),
                       "norm_q": jnp.asarray(g["attn__norm_q__weight"]),
                       "norm_k": jnp.asarray(g["attn__norm_k__weight"])},
          "txt_attn": {"q": lin("attn__add_q_proj"),
                       "k": lin("attn__add_k_proj"),
                       "v": lin("attn__add_v_proj"),
                       "norm_q": jnp.asarray(
                           g["attn__norm_added_q__weight"]),
                       "norm_k": jnp.asarray(
                           g["attn__norm_added_k__weight"])},
          "to_out": lin("attn__to_out__0"),
          "to_add_out": lin("attn__to_add_out"),
          "img_mlp1": lin("img_mlp__net__0__proj"),
          "img_mlp2": lin("img_mlp__net__2"),
          "txt_mlp1": lin("txt_mlp__net__0__proj"),
          "txt_mlp2": lin("txt_mlp__net__2")}

    f, h, w = (int(v) for v in g["grid"])
    lt = g["txt"].shape[1]
    cos, sin = qwen_rope((f, h, w), lt, cfg)
    # rope parity vs the model's own QwenEmbedRope ([txt, img] order)
    ref_cos = np.concatenate([g["txt_freqs"][..., 0],
                              g["vid_freqs"][..., 0]])
    ref_sin = np.concatenate([g["txt_freqs"][..., 1],
                              g["vid_freqs"][..., 1]])
    np.testing.assert_allclose(np.asarray(cos), ref_cos,
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(sin), ref_sin,
                               rtol=2e-5, atol=2e-5)

    img, txt = _block(bp, jnp.asarray(g["img"]), jnp.asarray(g["txt"]),
                      jnp.asarray(g["vec"]), cos, sin, lt, cfg, "xla")
    np.testing.assert_allclose(np.asarray(img), g["out_img"],
                               rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(txt), g["out_txt"],
                               rtol=5e-4, atol=5e-4)


def test_ref_wan_vae_end_to_end():
    """Full encode+decode vs the reference's OWN executed WanVAE_
    (float64, tiny dims) — including the chunked [1,4,...] encode and
    the frame-streamed 'Rep'-sentinel decode, which the repo implements
    as equivalent full-sequence causal convolutions
    (wan2gp_tpu/models/wan/vae.py docstring) —
    generate_from_reference.py gen_wan_vae_ref."""
    from wan2gp_tpu.models.wan.vae import (WanVAEConfig, vae_encode,
                                           vae_decode, VAE_MEAN, VAE_STD)
    from wan2gp_tpu.io.wan_checkpoint import load_wan_vae_params
    g = _load("wan_vae_ref.npz")
    sd = {k.replace("__", "."): g[k] for k in g if "__" in k}
    cfg = WanVAEConfig(dim=8, z_dim=16, dim_mult=(1, 2),
                       num_res_blocks=1, temporal_downsample=(True,))
    params, left = load_wan_vae_params(sd, cfg)
    assert left == []

    video = jnp.asarray(np.transpose(g["x"], (0, 2, 3, 4, 1)))
    lat = vae_encode(params, cfg, video)
    mu = np.asarray(lat) * VAE_STD + VAE_MEAN      # undo normalization
    ref_mu = np.transpose(g["mu"], (0, 2, 3, 4, 1))
    np.testing.assert_allclose(mu, ref_mu, rtol=2e-4, atol=2e-4)

    norm_lat = jnp.asarray((ref_mu - VAE_MEAN) / VAE_STD, jnp.float32)
    out = vae_decode(params, cfg, norm_lat)
    # vae_decode clips to [-1, 1]; clip the oracle identically
    ref_out = np.clip(np.transpose(g["out"], (0, 2, 3, 4, 1)), -1.0, 1.0)
    np.testing.assert_allclose(np.asarray(out), ref_out,
                               rtol=2e-4, atol=2e-4)


def test_ref_wan22_vae_end_to_end():
    """Wan 2.2 VAE full encode+decode vs the reference's OWN executed
    vae2_2.py WanVAE_ (float64, tiny dims, production 4-stage topology)
    — chunked patchified encode, frame-streamed decode, AvgDown3D/
    DupUp3D parameter-free shortcuts with first_chunk semantics — and
    the new io/wan_checkpoint.py load_wan22_vae_params loader —
    generate_from_reference.py gen_wan22_vae_ref."""
    from wan2gp_tpu.models.wan.vae2_2 import (
        Wan22VAEConfig, wan22_vae_encode, wan22_vae_decode,
        WAN22_MEAN, WAN22_STD)
    from wan2gp_tpu.io.wan_checkpoint import load_wan22_vae_params
    g = _load("wan22_vae_ref.npz")
    sd = {k.replace("__", "."): g[k] for k in g if "__" in k}
    cfg = Wan22VAEConfig(dim=4, dec_dim=4, z_dim=48, dim_mult=(1, 2, 4, 4),
                         num_res_blocks=1,
                         temporal_downsample=(False, True, True))
    params, left = load_wan22_vae_params(sd, cfg)
    assert left == []

    video = jnp.asarray(np.transpose(g["x"], (0, 2, 3, 4, 1)))
    lat = wan22_vae_encode(params, cfg, video)
    mu = np.asarray(lat) * WAN22_STD + WAN22_MEAN   # undo normalization
    ref_mu = np.transpose(g["mu"], (0, 2, 3, 4, 1))
    np.testing.assert_allclose(mu, ref_mu, rtol=2e-4, atol=2e-4)

    norm_lat = jnp.asarray((ref_mu - WAN22_MEAN) / WAN22_STD, jnp.float32)
    out = wan22_vae_decode(params, cfg, norm_lat)
    ref_out = np.clip(np.transpose(g["out"], (0, 2, 3, 4, 1)), -1.0, 1.0)
    np.testing.assert_allclose(np.asarray(out), ref_out,
                               rtol=2e-4, atol=2e-4)
