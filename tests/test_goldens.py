"""Reference-parity golden tests.

The tensors under tests/goldens/*.npz were produced by
tests/goldens/generate.py executing the REFERENCE algorithms (re-derived
in torch from the cited formulas) at tiny dims with fixed seeds.  Any
numeric drift of the TPU implementation against those recordings fails
here — the evidence for BASELINE's "within tolerance of the PyTorch
reference" requirement.
"""
import os

import numpy as np
import jax
import jax.numpy as jnp

HERE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")


def _load(name):
    return dict(np.load(os.path.join(HERE, name)))


def test_golden_wan_rope():
    from wan2gp_tpu.ops.rope import build_rope_3d, apply_rope
    g = _load("wan_rope.npz")
    f, h, w = (int(v) for v in g["grid"])
    cos, sin = build_rope_3d((f, h, w), head_dim=int(g["head_dim"]))
    out = apply_rope(jnp.asarray(g["x"]), cos, sin)
    np.testing.assert_allclose(np.asarray(out), g["out"],
                               rtol=2e-5, atol=2e-5)


def test_golden_wan_vae_block():
    from wan2gp_tpu.models.wan.vae import _resblock
    g = _load("wan_vae_block.npz")
    # torch NCDHW weights [cout, cin, kt, kh, kw] -> [kt, kh, kw, cin, cout]
    p = {
        "norm1": jnp.asarray(g["g1"][:, 0, 0, 0]),
        "conv1": {"w": jnp.asarray(g["w1"].transpose(2, 3, 4, 1, 0)),
                  "b": jnp.asarray(g["b1"])},
        "norm2": jnp.asarray(g["g2"][:, 0, 0, 0]),
        "conv2": {"w": jnp.asarray(g["w2"].transpose(2, 3, 4, 1, 0)),
                  "b": jnp.asarray(g["b2"])},
        "shortcut": {"w": jnp.asarray(g["ws"].transpose(2, 3, 4, 1, 0)),
                     "b": jnp.asarray(g["bs"])},
    }
    x = jnp.asarray(g["x"].transpose(0, 2, 3, 4, 1))     # -> NTHWC
    out = _resblock(p, x)
    ref = g["out"].transpose(0, 2, 3, 4, 1)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=3e-5, atol=3e-5)


def test_golden_wan_block():
    from wan2gp_tpu.models.wan.dit import _block, WanDiTConfig
    from wan2gp_tpu.ops.rope import build_rope_3d
    g = _load("wan_block.npz")
    dim, n_heads, ffn_dim = (int(v) for v in g["dims"])
    f, h, w = (int(v) for v in g["grid"])
    cfg = WanDiTConfig(dim=dim, ffn_dim=ffn_dim, num_heads=n_heads,
                       num_layers=1, compute_dtype=jnp.float32)

    def lin(wk, bk):
        return {"w": jnp.asarray(g[wk].T), "b": jnp.asarray(g[bk])}

    bp = {
        "self_attn": {"q": lin("qw", "qb"), "k": lin("kw", "kb"),
                      "v": lin("vw", "vb"), "o": lin("ow", "ob"),
                      "norm_q": jnp.asarray(g["nq"]),
                      "norm_k": jnp.asarray(g["nk"])},
        "cross_attn": {"q": lin("cqw", "cqb"), "k": lin("ckw", "ckb"),
                       "v": lin("cvw", "cvb"), "o": lin("cow", "cob"),
                       "norm_q": jnp.asarray(g["cnq"]),
                       "norm_k": jnp.asarray(g["cnk"])},
        "norm3": {"w": jnp.asarray(g["n3w"]), "b": jnp.asarray(g["n3b"])},
        "ffn": {"fc1": lin("f1w", "f1b"), "fc2": lin("f2w", "f2b")},
        "modulation": jnp.asarray(g["mod"]),
    }
    cos, sin = build_rope_3d((f, h, w), head_dim=dim // n_heads)
    e6 = jnp.asarray(g["e"])                               # [1, 1, 6, dim]
    out = _block(bp, jnp.asarray(g["x"]), e6, jnp.asarray(g["ctx"]),
                 None, cos, sin, cfg, attn_backend="xla")
    np.testing.assert_allclose(np.asarray(out), g["out"],
                               rtol=5e-4, atol=5e-4)


def test_golden_unipc_trace():
    from wan2gp_tpu.schedulers import make_schedule
    from wan2gp_tpu.schedulers.base import solver_step, init_solver_state
    g = _load("unipc_trace.npz")
    n, shift = int(g["n_steps"]), float(g["shift"])
    for order, key in ((2, "x_order2"), (3, "x_order3")):
        sched = make_schedule("unipc", n, shift=shift, solver_order=order)
        np.testing.assert_allclose(np.asarray(sched.sigmas), g["sigmas"],
                                   rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(np.asarray(sched.timesteps),
                                   g["timesteps"], atol=0)
        x = jnp.asarray(g["x0"], jnp.float32)
        state = init_solver_state(sched, x)
        for i in range(n):
            ci = {k: v[i] for k, v in sched.coeffs.items()}
            x, state = solver_step(sched, i, ci,
                                   jnp.asarray(g["outputs"][i], jnp.float32),
                                   x, state)
        np.testing.assert_allclose(np.asarray(x), g[key],
                                   rtol=5e-4, atol=5e-4)


def test_golden_t5_relpos():
    from wan2gp_tpu.models.wan.t5 import relative_position_buckets
    g = _load("t5_relpos.npz")
    got = relative_position_buckets(int(g["length"]))
    np.testing.assert_array_equal(np.asarray(got), g["buckets"])


def test_golden_flux_double_block():
    from wan2gp_tpu.models.flux.dit import (FluxConfig, _double_block,
                                            rope_from_ids)
    g = _load("flux_double_block.npz")
    h, n, mlp = (int(v) for v in g["dims"])
    cfg = FluxConfig(hidden_size=h, num_heads=n, mlp_ratio=mlp / h,
                     axes_dim=tuple(int(a) for a in g["axes_dim"]),
                     depth=1, depth_single_blocks=1)

    def lin(k):
        return {"w": jnp.asarray(g[k + "_w"].T),
                "b": jnp.asarray(g[k + "_b"])}

    def stream(s):
        return {"mod": lin(s + "mod"), "qkv": lin(s + "qkv"),
                "proj": lin(s + "proj"), "mlp1": lin(s + "m1"),
                "mlp2": lin(s + "m2"),
                "norm_q": jnp.asarray(g[s + "nq"]),
                "norm_k": jnp.asarray(g[s + "nk"])}

    bp = {"img": stream("i"), "txt": stream("t")}
    cos, sin = rope_from_ids(jnp.asarray(g["ids"]), cfg.axes_dim, cfg.theta)
    # _double_block computes in cfg.compute_dtype; force fp32 for parity
    import dataclasses
    cfg = dataclasses.replace(cfg, compute_dtype=jnp.float32)
    txt_len = g["txt"].shape[1]
    img, txt = _double_block(bp, jnp.asarray(g["img"]),
                             jnp.asarray(g["txt"]), jnp.asarray(g["vec"]),
                             cos, sin, txt_len, cfg, "xla")
    np.testing.assert_allclose(np.asarray(img), g["out_img"],
                               rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(txt), g["out_txt"],
                               rtol=5e-4, atol=5e-4)


def test_golden_flux_single_block():
    from wan2gp_tpu.models.flux.dit import (FluxConfig, _single_block,
                                            rope_from_ids)
    import dataclasses
    g = _load("flux_single_block.npz")
    h, n, mlp = (int(v) for v in g["dims"])
    cfg = FluxConfig(hidden_size=h, num_heads=n, mlp_ratio=mlp / h,
                     axes_dim=tuple(int(a) for a in g["axes_dim"]),
                     depth=1, depth_single_blocks=1)
    cfg = dataclasses.replace(cfg, compute_dtype=jnp.float32)
    bp = {"mod": {"w": jnp.asarray(g["mod_w"].T),
                  "b": jnp.asarray(g["mod_b"])},
          "linear1": {"w": jnp.asarray(g["lin1_w"].T),
                      "b": jnp.asarray(g["lin1_b"])},
          "linear2": {"w": jnp.asarray(g["lin2_w"].T),
                      "b": jnp.asarray(g["lin2_b"])},
          "norm_q": jnp.asarray(g["nq"]), "norm_k": jnp.asarray(g["nk"])}
    cos, sin = rope_from_ids(jnp.asarray(g["ids"]), cfg.axes_dim, cfg.theta)
    out = _single_block(bp, jnp.asarray(g["x"]), jnp.asarray(g["vec"]),
                        cos, sin, cfg, "xla")
    np.testing.assert_allclose(np.asarray(out), g["out"],
                               rtol=5e-4, atol=5e-4)


def test_golden_hyvideo_double_block():
    from wan2gp_tpu.models.hyvideo.dit import (HunyuanConfig, _double_block,
                                               build_hunyuan_rope)
    import dataclasses
    g = _load("hyvideo_double_block.npz")
    h, n, mlp = (int(v) for v in g["dims"])
    grid = tuple(int(v) for v in g["grid"])
    cfg = HunyuanConfig(hidden_size=h, heads_num=n,
                        rope_dim_list=tuple(int(v) for v in g["rope_dims"]),
                        mm_double_blocks_depth=1, mm_single_blocks_depth=1)
    cfg = dataclasses.replace(cfg, compute_dtype=jnp.float32)

    def lin(k):
        p = {"w": jnp.asarray(g[k + "_w"].T)}
        if k + "_b" in g:
            p["b"] = jnp.asarray(g[k + "_b"])
        return p

    def stream(s):
        return {"mod": lin(s + "mod"), "qkv": lin(s + "qkv"),
                "proj": lin(s + "proj"), "mlp1": lin(s + "m1"),
                "mlp2": lin(s + "m2"),
                "norm_q": jnp.asarray(g[s + "nq"]),
                "norm_k": jnp.asarray(g[s + "nk"])}

    bp = {"img": stream("i"), "txt": stream("t")}
    lt = g["txt"].shape[1]
    li = g["img"].shape[1]
    cos, sin = build_hunyuan_rope(grid, cfg.rope_dim_list, txt_len=lt,
                                  theta=256.0)
    img, txt = _double_block(bp, jnp.asarray(g["img"]),
                             jnp.asarray(g["txt"]), jnp.asarray(g["vec"]),
                             jnp.asarray(cos), jnp.asarray(sin), li, cfg,
                             "xla")
    np.testing.assert_allclose(np.asarray(img), g["out_img"],
                               rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(txt), g["out_txt"],
                               rtol=5e-4, atol=5e-4)


def test_golden_dpm_trace():
    from wan2gp_tpu.schedulers import make_schedule
    from wan2gp_tpu.schedulers.base import solver_step, init_solver_state
    g = _load("dpm_trace.npz")
    n, shift = int(g["n_steps"]), float(g["shift"])
    sched = make_schedule("dpm++", n, shift=shift)
    np.testing.assert_allclose(np.asarray(sched.sigmas)[:n], g["sigmas"][:n],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sched.timesteps), g["timesteps"],
                               rtol=1e-5, atol=1e-3)
    x = jnp.asarray(g["x0"], jnp.float32)
    state = init_solver_state(sched, x)
    for i in range(n):
        ci = {k: v[i] for k, v in sched.coeffs.items()}
        x, state = solver_step(sched, i, ci,
                               jnp.asarray(g["outputs"][i], jnp.float32),
                               x, state)
    np.testing.assert_allclose(np.asarray(x), g["x_final"],
                               rtol=5e-4, atol=5e-4)


def test_golden_lcm_trace():
    from wan2gp_tpu.schedulers import make_schedule
    from wan2gp_tpu.schedulers.base import solver_step, init_solver_state
    g = _load("lcm_trace.npz")
    n, shift = int(g["n_steps"]), float(g["shift"])
    sched = make_schedule("lcm", n, shift=shift)
    np.testing.assert_allclose(np.asarray(sched.sigmas), g["sigmas"],
                               rtol=1e-5, atol=1e-6)
    x = jnp.asarray(g["x0"], jnp.float32)
    state = init_solver_state(sched, x)
    for i in range(n):
        ci = {k: v[i] for k, v in sched.coeffs.items()}
        x, state = solver_step(sched, i, ci,
                               jnp.asarray(g["outputs"][i], jnp.float32),
                               x, state)
    np.testing.assert_allclose(np.asarray(x), g["x_final"],
                               rtol=5e-4, atol=5e-4)


def test_golden_vae_tile_blend():
    from wan2gp_tpu.models.wan.vae_scan import blend_v, blend_h
    g = _load("vae_tile_blend.npz")

    def to_nthwc(a):
        return jnp.asarray(a.transpose(0, 2, 3, 4, 1))

    ext = int(g["extent"])
    out_v = blend_v(to_nthwc(g["top"]), to_nthwc(g["tile"]), ext)
    np.testing.assert_allclose(np.asarray(out_v),
                               g["out_v"].transpose(0, 2, 3, 4, 1),
                               rtol=1e-6, atol=1e-6)
    out_h = blend_h(to_nthwc(g["left"]), to_nthwc(g["tile"]), ext)
    np.testing.assert_allclose(np.asarray(out_h),
                               g["out_h"].transpose(0, 2, 3, 4, 1),
                               rtol=1e-6, atol=1e-6)


def test_golden_ltx2_av_block():
    """LTX-2 BasicAVTransformerBlock vs the reference formulas
    (models/ltx2/ltx_core/model/transformer/transformer.py:228-470)."""
    from wan2gp_tpu.models.ltx2.dit import _block, LTX2Config
    g = _load("ltx2_av_block.npz")

    cfg = LTX2Config(num_layers=1, num_heads=2, head_dim=16,
                     audio_num_heads=2, audio_head_dim=8,
                     rope_type="split",
                     compute_dtype=jnp.float32,
                     residual_dtype=jnp.float32)

    def attnp(name):
        return {
            "to_q": {"w": jnp.asarray(g[f"{name}.to_q.w"]),
                     "b": jnp.asarray(g[f"{name}.to_q.b"])},
            "to_k": {"w": jnp.asarray(g[f"{name}.to_k.w"]),
                     "b": jnp.asarray(g[f"{name}.to_k.b"])},
            "to_v": {"w": jnp.asarray(g[f"{name}.to_v.w"]),
                     "b": jnp.asarray(g[f"{name}.to_v.b"])},
            "to_out": {"w": jnp.asarray(g[f"{name}.to_out.w"]),
                       "b": jnp.asarray(g[f"{name}.to_out.b"])},
            "q_norm": jnp.asarray(g[f"{name}.q_norm"]),
            "k_norm": jnp.asarray(g[f"{name}.k_norm"]),
        }

    def ff(name):
        return {"fc1": {"w": jnp.asarray(g[f"{name}.fc1.w"]),
                        "b": jnp.asarray(g[f"{name}.fc1.b"])},
                "fc2": {"w": jnp.asarray(g[f"{name}.fc2.w"]),
                        "b": jnp.asarray(g[f"{name}.fc2.b"])}}

    bp = {
        "attn1": attnp("attn1"), "attn2": attnp("attn2"), "ff": ff("ff"),
        "scale_shift_table": jnp.asarray(g["sst_v"]),
        "audio_attn1": attnp("audio_attn1"),
        "audio_attn2": attnp("audio_attn2"), "audio_ff": ff("audio_ff"),
        "audio_scale_shift_table": jnp.asarray(g["sst_a"]),
        "audio_to_video_attn": attnp("a2v"),
        "video_to_audio_attn": attnp("v2a"),
        "sst_av_audio": jnp.asarray(g["sst_av_a"]),
        "sst_av_video": jnp.asarray(g["sst_av_v"]),
    }
    mods = (jnp.asarray(g["v_t"]), jnp.asarray(g["a_t"]),
            jnp.asarray(g["v_css"]), jnp.asarray(g["v_cg"]),
            jnp.asarray(g["a_css"]), jnp.asarray(g["a_cg"]), None, None)
    ropes = ((jnp.asarray(g["v_pe_cos"]), jnp.asarray(g["v_pe_sin"])),
             (jnp.asarray(g["a_pe_cos"]), jnp.asarray(g["a_pe_sin"])),
             (jnp.asarray(g["v_xpe_cos"]), jnp.asarray(g["v_xpe_sin"])),
             (jnp.asarray(g["a_xpe_cos"]), jnp.asarray(g["a_xpe_sin"])))
    masks = (jnp.asarray(g["v_ctx"]), jnp.asarray(g["a_ctx"]), None, None)

    vx, ax = _block(bp, cfg, jnp.asarray(g["vx"]), jnp.asarray(g["ax"]),
                    mods, ropes, masks, "xla")
    np.testing.assert_allclose(np.asarray(vx), g["out_vx"],
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(ax), g["out_ax"],
                               rtol=2e-4, atol=2e-4)
