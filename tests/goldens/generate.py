"""Golden-tensor generator: executes the REFERENCE algorithms (re-derived
in dependency-light torch from the cited file:line formulas) at tiny dims
with fixed seeds and records inputs/weights/outputs as .npz under
tests/goldens/.  `pytest -k golden` then fails on any numeric drift of the
TPU implementation against these recordings (BASELINE: "latents and pixels
within tolerance of the PyTorch reference").

Run: python tests/goldens/generate.py   (regenerates all .npz in place)

Covered:
  wan_rope.npz       — complex-polar 3D RoPE (models/wan/modules/model.py
                       rope_params:35 / rope_apply:47 via multitalk_model)
  wan_vae_block.npz  — CausalConv3d + RMS_norm resblock (modules/vae.py
                       :43-103, :238-276)
  wan_block.npz      — WanAttentionBlock adaLN-zero modulation + self/cross
                       attention + FFN (modules/model.py:574-718)
  unipc_trace.npz    — FlowUniPC sigma table + 8-step trajectory, orders
                       2 and 3 (shared/utils/fm_solvers_unipc.py)
  t5_relpos.npz      — UMT5 relative-position buckets (modules/t5.py)
  flux_double_block.npz / flux_single_block.npz — Flux MMDiT blocks
  hyvideo_double_block.npz — Hunyuan dual-stream block
  dpm_trace.npz / lcm_trace.npz — DPM++ and LCM solver trajectories
  vae_tile_blend.npz — Wan VAE tile seam blending
  ltx2_av_block.npz  — LTX-2 BasicAVTransformerBlock (self/text/a2v/v2a
                       attention + 5-slot AV tables, split rope;
                       ltx_core/model/transformer/transformer.py:228-470)
"""
import math
import os

import numpy as np
import torch
import torch.nn.functional as F

HERE = os.path.dirname(os.path.abspath(__file__))


def save(name, **arrs):
    np.savez(os.path.join(HERE, name),
             **{k: np.asarray(v) for k, v in arrs.items()})
    print(f"wrote {name}: {sorted(arrs)}")


# ---------------------------------------------------------------------------
# 1. Wan 3D RoPE (model.py rope_params / rope_apply)
# ---------------------------------------------------------------------------

def rope_params(max_seq_len, dim, theta=10000):
    freqs = torch.outer(
        torch.arange(max_seq_len),
        1.0 / torch.pow(theta,
                        torch.arange(0, dim, 2).to(torch.float64).div(dim)))
    return torch.polar(torch.ones_like(freqs), freqs)


def rope_apply(x, grid_sizes, freqs):
    n, c = x.size(2), x.size(3) // 2
    freqs = freqs.split([c - 2 * (c // 3), c // 3, c // 3], dim=1)
    output = []
    for i, (f, h, w) in enumerate(grid_sizes.tolist()):
        seq_len = f * h * w
        x_i = torch.view_as_complex(
            x[i, :seq_len].to(torch.float64).reshape(seq_len, n, -1, 2))
        freqs_i = torch.cat([
            freqs[0][:f].view(f, 1, 1, -1).expand(f, h, w, -1),
            freqs[1][:h].view(1, h, 1, -1).expand(f, h, w, -1),
            freqs[2][:w].view(1, 1, w, -1).expand(f, h, w, -1),
        ], dim=-1).reshape(seq_len, 1, -1)
        x_i = torch.view_as_real(x_i * freqs_i).flatten(2)
        output.append(x_i)
    return torch.stack(output).float()


def gen_wan_rope():
    rng = np.random.default_rng(0)
    head_dim, n_heads = 16, 2
    f, h, w = 3, 4, 5
    x = rng.standard_normal((1, f * h * w, n_heads, head_dim)).astype(
        np.float32)
    d = head_dim
    freqs = torch.cat([
        rope_params(32, d - 4 * (d // 6)),
        rope_params(32, 2 * (d // 6)),
        rope_params(32, 2 * (d // 6)),
    ], dim=1)
    out = rope_apply(torch.tensor(x), torch.tensor([[f, h, w]]), freqs)
    save("wan_rope.npz", x=x, out=out.numpy(),
         grid=np.array([f, h, w]), head_dim=head_dim)


# ---------------------------------------------------------------------------
# 2. Wan VAE residual block (vae.py CausalConv3d / RMS_norm / ResidualBlock)
# ---------------------------------------------------------------------------

def causal_conv3d(x, w, b):
    kt, kh, kw = w.shape[2:]
    x = F.pad(x, (kw // 2, kw // 2, kh // 2, kh // 2, 2 * (kt // 2), 0))
    return F.conv3d(x, w, b)


def vae_rms_norm(x, gamma):
    # RMS_norm channel_first images=False (vae.py:85-103)
    return F.normalize(x, dim=1) * math.sqrt(x.shape[1]) * gamma


def gen_wan_vae_block():
    rng = np.random.default_rng(1)
    cin, cout = 4, 6
    x = rng.standard_normal((1, cin, 3, 5, 5)).astype(np.float32)
    g1 = rng.standard_normal((cin, 1, 1, 1)).astype(np.float32)
    w1 = (rng.standard_normal((cout, cin, 3, 3, 3)) * 0.1).astype(np.float32)
    b1 = rng.standard_normal(cout).astype(np.float32) * 0.1
    g2 = rng.standard_normal((cout, 1, 1, 1)).astype(np.float32)
    w2 = (rng.standard_normal((cout, cout, 3, 3, 3)) * 0.1).astype(np.float32)
    b2 = rng.standard_normal(cout).astype(np.float32) * 0.1
    ws = (rng.standard_normal((cout, cin, 1, 1, 1)) * 0.1).astype(np.float32)
    bs = rng.standard_normal(cout).astype(np.float32) * 0.1

    with torch.no_grad():
        t = torch.tensor(x)
        h = vae_rms_norm(t, torch.tensor(g1))
        h = F.silu(h)
        h = causal_conv3d(h, torch.tensor(w1), torch.tensor(b1))
        h = vae_rms_norm(h, torch.tensor(g2))
        h = F.silu(h)
        h = causal_conv3d(h, torch.tensor(w2), torch.tensor(b2))
        sc = causal_conv3d(t, torch.tensor(ws), torch.tensor(bs))
        out = (sc + h).numpy()
    save("wan_vae_block.npz", x=x, g1=g1, w1=w1, b1=b1, g2=g2, w2=w2,
         b2=b2, ws=ws, bs=bs, out=out)


# ---------------------------------------------------------------------------
# 3. Wan attention block (model.py:574-718, fp32 modulation path)
# ---------------------------------------------------------------------------

def gen_wan_block():
    rng = np.random.default_rng(2)
    dim, n_heads, ffn_dim, text_len = 32, 2, 64, 4
    hd = dim // n_heads
    f, h, w = 2, 2, 2
    seq = f * h * w

    def lin(din, dout):
        return ((rng.standard_normal((dout, din)) * 0.1).astype(np.float32),
                (rng.standard_normal(dout) * 0.05).astype(np.float32))

    x = rng.standard_normal((1, seq, dim)).astype(np.float32)
    e = rng.standard_normal((1, 1, 6, dim)).astype(np.float32)
    ctx = rng.standard_normal((1, text_len, dim)).astype(np.float32)
    mod = (rng.standard_normal((1, 6, dim)) / math.sqrt(dim)).astype(
        np.float32)
    qw, qb = lin(dim, dim); kw, kb = lin(dim, dim)
    vw, vb = lin(dim, dim); ow, ob = lin(dim, dim)
    nq = rng.standard_normal(dim).astype(np.float32)
    nk = rng.standard_normal(dim).astype(np.float32)
    cqw, cqb = lin(dim, dim); ckw, ckb = lin(dim, dim)
    cvw, cvb = lin(dim, dim); cow, cob = lin(dim, dim)
    cnq = rng.standard_normal(dim).astype(np.float32)
    cnk = rng.standard_normal(dim).astype(np.float32)
    n3w = rng.standard_normal(dim).astype(np.float32)
    n3b = rng.standard_normal(dim).astype(np.float32)
    f1w, f1b = lin(dim, ffn_dim); f2w, f2b = lin(ffn_dim, dim)

    d = hd
    freqs = torch.cat([
        rope_params(16, d - 4 * (d // 6)),
        rope_params(16, 2 * (d // 6)),
        rope_params(16, 2 * (d // 6)),
    ], dim=1)

    def wan_rms(t, g):
        # WanRMSNorm (multitalk_model.py:72-89): x * rsqrt(mean(x^2)+eps) * g
        return (t * torch.rsqrt(t.pow(2).mean(-1, keepdim=True) + 1e-6)
                ) * torch.tensor(g)

    with torch.no_grad():
        t = torch.tensor(x)
        ee = (torch.tensor(mod) + torch.tensor(e)[:, 0]).chunk(6, dim=1)
        # self-attention
        y = F.layer_norm(t, (dim,)) * (1 + ee[1]) + ee[0]
        q = wan_rms(y @ torch.tensor(qw).T + torch.tensor(qb), nq)
        k = wan_rms(y @ torch.tensor(kw).T + torch.tensor(kb), nk)
        v = y @ torch.tensor(vw).T + torch.tensor(vb)
        q = q.view(1, seq, n_heads, hd)
        k = k.view(1, seq, n_heads, hd)
        v = v.view(1, seq, n_heads, hd)
        q = rope_apply(q, torch.tensor([[f, h, w]]), freqs)
        k = rope_apply(k, torch.tensor([[f, h, w]]), freqs)
        a = F.scaled_dot_product_attention(
            q.transpose(1, 2), k.transpose(1, 2), v.transpose(1, 2))
        a = a.transpose(1, 2).reshape(1, seq, dim)
        yo = a @ torch.tensor(ow).T + torch.tensor(ob)
        t = t + yo * ee[2]
        # cross-attention (norm3 affine)
        y = F.layer_norm(t, (dim,), torch.tensor(n3w), torch.tensor(n3b))
        q = wan_rms(y @ torch.tensor(cqw).T + torch.tensor(cqb), cnq)
        kc = wan_rms(torch.tensor(ctx) @ torch.tensor(ckw).T
                     + torch.tensor(ckb), cnk)
        vc = torch.tensor(ctx) @ torch.tensor(cvw).T + torch.tensor(cvb)
        q = q.view(1, seq, n_heads, hd).transpose(1, 2)
        kc = kc.view(1, text_len, n_heads, hd).transpose(1, 2)
        vc = vc.view(1, text_len, n_heads, hd).transpose(1, 2)
        a = F.scaled_dot_product_attention(q, kc, vc)
        a = a.transpose(1, 2).reshape(1, seq, dim)
        t = t + (a @ torch.tensor(cow).T + torch.tensor(cob))
        # FFN
        y = F.layer_norm(t, (dim,)) * (1 + ee[4]) + ee[3]
        y = y @ torch.tensor(f1w).T + torch.tensor(f1b)
        y = F.gelu(y, approximate="tanh")
        y = y @ torch.tensor(f2w).T + torch.tensor(f2b)
        out = (t + y * ee[5]).numpy()

    save("wan_block.npz", x=x, e=e, ctx=ctx, mod=mod[0],
         qw=qw, qb=qb, kw=kw, kb=kb, vw=vw, vb=vb, ow=ow, ob=ob,
         nq=nq, nk=nk, cqw=cqw, cqb=cqb, ckw=ckw, ckb=ckb, cvw=cvw,
         cvb=cvb, cow=cow, cob=cob, cnq=cnq, cnk=cnk, n3w=n3w, n3b=n3b,
         f1w=f1w, f1b=f1b, f2w=f2w, f2b=f2b, out=out,
         grid=np.array([f, h, w]), dims=np.array([dim, n_heads, ffn_dim]))


# ---------------------------------------------------------------------------
# 4. UniPC trace (sigma table + trajectory, orders 2 and 3)
# ---------------------------------------------------------------------------

def gen_unipc_trace():
    # reuse the in-repo generic-order oracle (mirrors
    # fm_solvers_unipc.py:350-739) to record a fixed trajectory
    import sys
    sys.path.insert(0, os.path.join(HERE, ".."))
    sys.path.insert(0, os.path.join(HERE, "..", ".."))
    from test_schedulers import _unipc_oracle

    rng = np.random.default_rng(3)
    N, shift, T = 8, 5.0, 1000
    sigma_max = 1.0 - 1.0 / T
    s = np.linspace(sigma_max, 0.0, N + 1, dtype=np.float64)[:-1]
    s = shift * s / (1 + (shift - 1) * s)
    ts = np.trunc(s * T)
    sigmas = np.concatenate([s, [0.0]])
    outputs = [rng.standard_normal(4) for _ in range(N)]
    x0 = rng.standard_normal(4)
    x2 = _unipc_oracle(sigmas, outputs, x0.copy(), solver_order=2)
    x3 = _unipc_oracle(sigmas, outputs, x0.copy(), solver_order=3)
    save("unipc_trace.npz", sigmas=sigmas, timesteps=ts,
         outputs=np.stack(outputs), x0=x0, x_order2=x2, x_order3=x3,
         n_steps=N, shift=shift)


# ---------------------------------------------------------------------------
# 5. UMT5 relative-position buckets (t5.py / HF T5 bidirectional)
# ---------------------------------------------------------------------------

def gen_t5_relpos():
    def bucket(rel, num_buckets=32, max_dist=128):
        # HF T5 _relative_position_bucket, bidirectional
        ret = 0
        n = num_buckets // 2
        ret += (rel > 0).astype(np.int64) * n
        rel = np.abs(rel)
        max_exact = n // 2
        is_small = rel < max_exact
        large = max_exact + (
            np.log(rel.clip(1) / max_exact) / np.log(max_dist / max_exact)
            * (n - max_exact)).astype(np.int64)
        large = np.minimum(large, n - 1)
        return ret + np.where(is_small, rel, large)

    q = np.arange(12)[:, None]
    k = np.arange(12)[None, :]
    rel = k - q
    save("t5_relpos.npz", buckets=bucket(rel), length=12)


if __name__ == "__main__":
    gen_wan_rope()
    gen_wan_vae_block()
    gen_wan_block()
    gen_unipc_trace()
    gen_t5_relpos()


# ---------------------------------------------------------------------------
# 6. Flux double/single stream blocks (models/flux/modules/layers.py:198-:315)
# ---------------------------------------------------------------------------

def _rms(x, scale, eps=1e-6):
    xf = x.float()
    return (xf * torch.rsqrt(xf.pow(2).mean(-1, keepdim=True) + eps)) * scale


def _ln(x, eps=1e-6):
    return F.layer_norm(x.float(), (x.shape[-1],), eps=eps)


def _flux_rope_cs(ids, axes_dim, theta=10000.0):
    """EmbedND rope tables (layers.py:34-45 / math.py rope): per-axis
    omega = theta^(-2i/dim), interleaved pairs; returns cos/sin [L, D/2]."""
    parts_c, parts_s = [], []
    for a, dim in enumerate(axes_dim):
        omega = 1.0 / theta ** (torch.arange(0, dim, 2).double() / dim)
        ang = ids[:, a].double()[:, None] * omega[None]
        parts_c.append(torch.cos(ang))
        parts_s.append(torch.sin(ang))
    return (torch.cat(parts_c, -1).float(), torch.cat(parts_s, -1).float())


def _rope_interleaved(x, cos, sin):
    """x: [B, L, N, D]; interleaved-pair rotation (math.py apply_rope)."""
    xp = x.float().reshape(*x.shape[:-1], -1, 2)
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    x0 = xp[..., 0] * c - xp[..., 1] * s
    x1 = xp[..., 0] * s + xp[..., 1] * c
    return torch.stack([x0, x1], -1).reshape(x.shape)


def _sdpa(q, k, v):
    """[B, L, N, D] fp32 attention."""
    qt = q.permute(0, 2, 1, 3)
    kt = k.permute(0, 2, 1, 3)
    vt = v.permute(0, 2, 1, 3)
    o = F.scaled_dot_product_attention(qt.float(), kt.float(), vt.float())
    return o.permute(0, 2, 1, 3)


def gen_flux_double():
    torch.manual_seed(10)
    h, n, mlp = 32, 2, 64
    li, lt = 12, 4
    g = torch.Generator().manual_seed(10)

    def lin(i, o):
        return (torch.randn(o, i, generator=g) * 0.2,
                torch.randn(o, generator=g) * 0.05)

    img = torch.randn(1, li, h, generator=g)
    txt = torch.randn(1, lt, h, generator=g)
    vec = torch.randn(1, h, generator=g)
    p = {}
    for s in ("i", "t"):
        p[s + "mod"] = lin(h, 6 * h)
        p[s + "qkv"] = lin(h, 3 * h)
        p[s + "proj"] = lin(h, h)
        p[s + "m1"] = lin(h, mlp)
        p[s + "m2"] = lin(mlp, h)
        p[s + "nq"] = torch.randn(h // n, generator=g) * 0.1 + 1
        p[s + "nk"] = torch.randn(h // n, generator=g) * 0.1 + 1
    # ids: txt rows all-zero, img rows (0, y, x) (flux_main img_ids)
    ids = torch.zeros(lt + li, 3)
    ids[lt:, 1] = torch.arange(li) // 4
    ids[lt:, 2] = torch.arange(li) % 4
    axes_dim = (4, 6, 6)
    cos, sin = _flux_rope_cs(ids, axes_dim)

    def mod6(key, v):
        w, b = p[key]
        out = F.silu(v.float()) @ w.T.float() + b.float()
        return out[:, None, :].chunk(6, dim=-1)

    def qkv(s, x):
        w, b = p[s + "qkv"]
        o = x.float() @ w.T.float() + b.float()
        q, k, v = o.chunk(3, -1)
        q = q.reshape(1, -1, n, h // n)
        k = k.reshape(1, -1, n, h // n)
        v = v.reshape(1, -1, n, h // n)
        q = _rms(q, p[s + "nq"].float())
        k = _rms(k, p[s + "nk"].float())
        return q, k, v

    is1, isc1, ig1, is2, isc2, ig2 = mod6("imod", vec)
    ts1, tsc1, tg1, ts2, tsc2, tg2 = mod6("tmod", vec)
    iq, ik, iv = qkv("i", _ln(img) * (1 + isc1) + is1)
    tq, tk, tv = qkv("t", _ln(txt) * (1 + tsc1) + ts1)
    q = torch.cat([tq, iq], 1)
    k = torch.cat([tk, ik], 1)
    v = torch.cat([tv, iv], 1)
    q = _rope_interleaved(q, cos, sin)
    k = _rope_interleaved(k, cos, sin)
    attn = _sdpa(q, k, v).reshape(1, lt + li, h)
    t_attn, i_attn = attn[:, :lt], attn[:, lt:]

    def proj(key, x):
        w, b = p[key]
        return x.float() @ w.T.float() + b.float()

    img2 = img + ig1 * proj("iproj", i_attn)
    y = _ln(img2) * (1 + isc2) + is2
    img2 = img2 + ig2 * proj("im2", F.gelu(proj("im1", y), approximate="tanh"))
    txt2 = txt + tg1 * proj("tproj", t_attn)
    y = _ln(txt2) * (1 + tsc2) + ts2
    txt2 = txt2 + tg2 * proj("tm2", F.gelu(proj("tm1", y), approximate="tanh"))

    arrs = {}
    for kk, vv in p.items():
        if isinstance(vv, tuple):
            arrs[kk + "_w"], arrs[kk + "_b"] = vv[0].numpy(), vv[1].numpy()
        else:
            arrs[kk] = vv.numpy()
    save("flux_double_block.npz",
         img=img, txt=txt, vec=vec, ids=ids.numpy(),
         out_img=img2.detach(), out_txt=txt2.detach(),
         dims=np.array([h, n, mlp]), axes_dim=np.array(axes_dim), **arrs)


def gen_flux_single():
    torch.manual_seed(11)
    h, n, mlp = 32, 2, 64
    l, lt = 16, 4
    g = torch.Generator().manual_seed(11)

    def lin(i, o):
        return (torch.randn(o, i, generator=g) * 0.2,
                torch.randn(o, generator=g) * 0.05)

    x = torch.randn(1, l, h, generator=g)
    vec = torch.randn(1, h, generator=g)
    mod_w = lin(h, 3 * h)
    lin1 = lin(h, 3 * h + mlp)
    lin2 = lin(h + mlp, h)
    nq = torch.randn(h // n, generator=g) * 0.1 + 1
    nk = torch.randn(h // n, generator=g) * 0.1 + 1
    ids = torch.zeros(l, 3)
    ids[lt:, 1] = torch.arange(l - lt) // 4
    ids[lt:, 2] = torch.arange(l - lt) % 4
    axes_dim = (4, 6, 6)
    cos, sin = _flux_rope_cs(ids, axes_dim)

    m = F.silu(vec.float()) @ mod_w[0].T.float() + mod_w[1].float()
    shift, scale, gate = m[:, None, :].chunk(3, -1)
    x_mod = _ln(x) * (1 + scale) + shift
    h1 = x_mod @ lin1[0].T.float() + lin1[1].float()
    qkv, mlp_in = h1[..., :3 * h], h1[..., 3 * h:]
    q, k, v = (t.reshape(1, l, n, h // n) for t in qkv.chunk(3, -1))
    q = _rms(q, nq.float())
    k = _rms(k, nk.float())
    q = _rope_interleaved(q, cos, sin)
    k = _rope_interleaved(k, cos, sin)
    attn = _sdpa(q, k, v).reshape(1, l, h)
    act = F.gelu(mlp_in, approximate="tanh")
    out = x + gate * (torch.cat([attn, act], -1) @ lin2[0].T.float()
                      + lin2[1].float())

    save("flux_single_block.npz",
         x=x, vec=vec, ids=ids.numpy(), out=out.detach(),
         dims=np.array([h, n, mlp]), axes_dim=np.array(axes_dim),
         mod_w=mod_w[0], mod_b=mod_w[1], lin1_w=lin1[0], lin1_b=lin1[1],
         lin2_w=lin2[0], lin2_b=lin2[1], nq=nq, nk=nk)


# ---------------------------------------------------------------------------
# 7. Hunyuan dual-stream block (models/hyvideo/modules/models.py:34-318)
# ---------------------------------------------------------------------------

def _hy_rope_cs(grid, rope_dim_list, txt_len, theta=256.0):
    """get_nd_rotary_pos_embed (posemb_layers.py) tables: per-axis
    omega = theta^(-2i/dim) over the (f, h, w) grid, concatenated, with
    identity rows (cos=1, sin=0) for the txt tokens appended AFTER the
    img rows (HV attention order: img first, models.py:255-262)."""
    f, h, w = grid
    parts = []
    for dim, n in zip(rope_dim_list, (f, h, w)):
        omega = 1.0 / theta ** (torch.arange(0, dim, 2).double() / dim)
        parts.append(omega)
    of, oh, ow = parts
    tf = torch.arange(f).double()
    th = torch.arange(h).double()
    tw = torch.arange(w).double()
    ang = torch.cat([
        (tf[:, None] * of[None]).reshape(f, 1, 1, -1).expand(f, h, w, -1),
        (th[:, None] * oh[None]).reshape(1, h, 1, -1).expand(f, h, w, -1),
        (tw[:, None] * ow[None]).reshape(1, 1, w, -1).expand(f, h, w, -1),
    ], -1).reshape(f * h * w, -1)
    cos = torch.cat([torch.cos(ang), torch.ones(txt_len, ang.shape[1],
                                                dtype=torch.float64)])
    sin = torch.cat([torch.sin(ang), torch.zeros(txt_len, ang.shape[1],
                                                 dtype=torch.float64)])
    return cos.float(), sin.float()


def gen_hyvideo_double():
    torch.manual_seed(12)
    h, n, mlp = 32, 2, 64
    grid = (2, 2, 3)
    li = 12
    lt = 4
    rope_dims = (4, 6, 6)
    g = torch.Generator().manual_seed(12)

    def lin(i, o, bias=True):
        w = torch.randn(o, i, generator=g) * 0.2
        b = torch.randn(o, generator=g) * 0.05 if bias else None
        return (w, b)

    img = torch.randn(1, li, h, generator=g)
    txt = torch.randn(1, lt, h, generator=g)
    vec = torch.randn(1, h, generator=g)
    p = {}
    for s in ("i", "t"):
        p[s + "mod"] = lin(h, 6 * h)
        p[s + "qkv"] = lin(h, 3 * h, bias=False)   # qkv_bias=False default
        p[s + "proj"] = lin(h, h, bias=False)      # proj bias=qkv_bias
        p[s + "m1"] = lin(h, mlp)
        p[s + "m2"] = lin(mlp, h)
        p[s + "nq"] = torch.randn(h // n, generator=g) * 0.1 + 1
        p[s + "nk"] = torch.randn(h // n, generator=g) * 0.1 + 1
    cos, sin = _hy_rope_cs(grid, rope_dims, lt)

    def apply(key, x):
        w, b = p[key]
        y = x.float() @ w.T.float()
        return y if b is None else y + b.float()

    def mod6(s):
        return apply(s + "mod", F.silu(vec.float()))[:, None, :].chunk(6, -1)

    def qkv(s, x):
        o = apply(s + "qkv", x)
        q, k, v = o.chunk(3, -1)
        q = _rms(q.reshape(1, -1, n, h // n), p[s + "nq"].float())
        k = _rms(k.reshape(1, -1, n, h // n), p[s + "nk"].float())
        return q, k, v.reshape(1, -1, n, h // n)

    is1, isc1, ig1, is2, isc2, ig2 = mod6("i")
    ts1, tsc1, tg1, ts2, tsc2, tg2 = mod6("t")
    iq, ik, iv = qkv("i", _ln(img) * (1 + isc1) + is1)
    tq, tk, tv = qkv("t", _ln(txt) * (1 + tsc1) + ts1)
    q = torch.cat([iq, tq], 1)                     # img FIRST
    k = torch.cat([ik, tk], 1)
    v = torch.cat([iv, tv], 1)
    q = _rope_interleaved(q, cos, sin)
    k = _rope_interleaved(k, cos, sin)
    attn = _sdpa(q, k, v).reshape(1, li + lt, h)
    i_attn, t_attn = attn[:, :li], attn[:, li:]

    img2 = img + ig1 * apply("iproj", i_attn)
    y = _ln(img2) * (1 + isc2) + is2
    img2 = img2 + ig2 * apply("im2",
                              F.gelu(apply("im1", y), approximate="tanh"))
    txt2 = txt + tg1 * apply("tproj", t_attn)
    y = _ln(txt2) * (1 + tsc2) + ts2
    txt2 = txt2 + tg2 * apply("tm2",
                              F.gelu(apply("tm1", y), approximate="tanh"))

    arrs = {}
    for kk, vv in p.items():
        if isinstance(vv, tuple):
            arrs[kk + "_w"] = vv[0].numpy()
            if vv[1] is not None:
                arrs[kk + "_b"] = vv[1].numpy()
        else:
            arrs[kk] = vv.numpy()
    save("hyvideo_double_block.npz",
         img=img, txt=txt, vec=vec, out_img=img2.detach(),
         out_txt=txt2.detach(), dims=np.array([h, n, mlp]),
         grid=np.array(grid), rope_dims=np.array(rope_dims), **arrs)


# ---------------------------------------------------------------------------
# 8. FlowDPM++ 2M + LCM/LTX scheduler traces
#    (shared/utils/fm_solvers.py; shared/utils/lcm_scheduler.py)
# ---------------------------------------------------------------------------

def gen_dpm_trace():
    torch.manual_seed(13)
    n, shift = 8, 5.0
    # the Wan production path (any2video.py:505-544) feeds
    # get_sampling_sigmas (fm_solvers.py:22): linspace(1, 0, N+1)[:N]
    sigmas = np.linspace(1.0, 0.0, n + 1)[:n]
    sigmas = shift * sigmas / (1 + (shift - 1) * sigmas)
    timesteps = np.trunc(sigmas * 1000)      # int64 cast in set_timesteps
    sigmas = np.concatenate([sigmas, [0.0]]).astype(np.float32)
    s = torch.from_numpy(sigmas)

    g = torch.Generator().manual_seed(13)
    x = torch.randn(2, 6, generator=g)
    outs = torch.randn(n, 2, 6, generator=g) * 0.3
    x0_trace = x.clone()

    def a_s(sig):                    # _sigma_to_alpha_sigma_t (:333)
        return 1 - sig, sig

    prev_m = None
    for i in range(n):
        m0 = x0_trace - s[i] * outs[i]            # convert_model_output:382
        last = i == n - 1
        if prev_m is None or last:                # first step + lower_order_final
            at, st_ = a_s(s[i + 1])
            as_, ss = a_s(s[i])
            lt = torch.log(at) - torch.log(st_) if s[i + 1] > 0 else None
            if s[i + 1] == 0:
                x0_trace = m0                     # exp(-inf) limit: x = x0
            else:
                h = (torch.log(at) - torch.log(st_)
                     - (torch.log(as_) - torch.log(ss)))
                x0_trace = (st_ / ss) * x0_trace \
                    - at * (torch.exp(-h) - 1.0) * m0
        else:                                     # 2M midpoint (:552)
            at, st_ = a_s(s[i + 1])
            as0, ss0 = a_s(s[i])
            as1, ss1 = a_s(s[i - 1])
            lam_t = torch.log(at) - torch.log(st_)
            lam_s0 = torch.log(as0) - torch.log(ss0)
            lam_s1 = torch.log(as1) - torch.log(ss1)
            h = lam_t - lam_s0
            h0 = lam_s0 - lam_s1
            r0 = h0 / h
            d0, d1 = m0, (1.0 / r0) * (m0 - prev_m)
            x0_trace = ((st_ / ss0) * x0_trace
                        - at * (torch.exp(-h) - 1.0) * d0
                        - 0.5 * at * (torch.exp(-h) - 1.0) * d1)
        prev_m = m0

    save("dpm_trace.npz", n_steps=n, shift=shift, sigmas=sigmas,
         timesteps=timesteps.astype(np.float32), x0=x.numpy(),
         outputs=outs.numpy(), x_final=x0_trace.numpy())


def gen_lcm_trace():
    torch.manual_seed(14)
    n, shift = 4, 5.0
    t = np.linspace(0, 1, n + 1, dtype=np.float32)
    sigma_min = 0.003 / 1.002
    sigmas = sigma_min + (1.0 - sigma_min) * (1 - t)
    sigmas = shift * sigmas / (1 + (shift - 1) * sigmas)
    timesteps = sigmas[:-1] * 1000

    g = torch.Generator().manual_seed(14)
    x = torch.randn(2, 6, generator=g)
    outs = torch.randn(n, 2, 6, generator=g) * 0.3
    xt = x.clone()
    for i in range(n):
        xt = xt + outs[i] * (sigmas[i + 1] - sigmas[i])

    save("lcm_trace.npz", n_steps=n, shift=shift,
         sigmas=sigmas.astype(np.float32),
         timesteps=timesteps.astype(np.float32), x0=x.numpy(),
         outputs=outs.numpy(), x_final=xt.numpy())


# ---------------------------------------------------------------------------
# 9. Wan VAE tile seam blending (vae.py:23-41)
# ---------------------------------------------------------------------------

def gen_vae_tile_blend():
    g = torch.Generator().manual_seed(15)
    # NCTHW like the reference
    top = torch.randn(1, 3, 2, 12, 10, generator=g)
    left = torch.randn(1, 3, 2, 12, 10, generator=g)
    tile = torch.randn(1, 3, 2, 12, 10, generator=g)
    extent = 5

    tv = tile.clone()
    weights = (torch.arange(extent) / extent).view(1, 1, 1, extent, 1)
    edge = top[:, :, :, -extent:, :].clone()
    edge.mul_(1.0 - weights)
    tv[:, :, :, :extent, :].mul_(weights).add_(edge)

    th = tile.clone()
    weights = (torch.arange(extent) / extent).view(1, 1, 1, 1, extent)
    edge = left[:, :, :, :, -extent:].clone()
    edge.mul_(1.0 - weights)
    th[:, :, :, :, :extent].mul_(weights).add_(edge)

    save("vae_tile_blend.npz", top=top, left=left, tile=tile,
         extent=extent, out_v=tv, out_h=th)


# ---------------------------------------------------------------------------
# 10. LTX-2 BasicAVTransformerBlock (models/ltx2/ltx_core/model/transformer/
#     transformer.py:228-470): per-modality self-attn (DBMRMSNorm-QK, split
#     rope), text cross-attn, bidirectional a2v/v2a cross-attn with 5-slot
#     scale-shift tables, GELU-tanh FFN; per-frame timestep-token adaLN.
# ---------------------------------------------------------------------------

def gen_ltx2_av_block():
    g = torch.Generator().manual_seed(16)
    dv, hv = 32, 2          # video dim / heads (head_dim 16)
    da, ha = 16, 2          # audio dim / heads (head_dim 8)
    B, Lv, La, Lc = 1, 8, 4, 3
    tmv, tma = 2, 2         # timestep tokens per modality
    n_ada, eps = 6, 1e-6

    def rn(*shape, s=1.0):
        return torch.randn(*shape, generator=g, dtype=torch.float64) * s

    def lin(i, o):
        return {"w": rn(i, o, s=0.08), "b": rn(o, s=0.02)}

    def attnp(dq, dkv, inner):
        return {"to_q": lin(dq, inner), "to_k": lin(dkv, inner),
                "to_v": lin(dkv, inner), "to_out": lin(inner, dq),
                "q_norm": 0.75 + 0.5 * torch.rand(inner, generator=g,
                                                  dtype=torch.float64),
                "k_norm": 0.75 + 0.5 * torch.rand(inner, generator=g,
                                                  dtype=torch.float64)}

    def rms(x, w=None):
        y = x * torch.rsqrt(x.pow(2).mean(-1, keepdim=True) + eps)
        return y * w if w is not None else y

    def rope_tab(L, H, half):
        theta = rn(L, H, half)
        return torch.cos(theta), torch.sin(theta)

    def rope_split(x, cs):
        cos, sin = cs
        half = cos.shape[-1]
        x0, x1 = x[..., :half], x[..., half:]
        return torch.cat([x0 * cos - x1 * sin, x1 * cos + x0 * sin], -1)

    def attn_fwd(p, x, ctx, heads, q_pe=None, k_pe=None):
        q = rms(x @ p["to_q"]["w"] + p["to_q"]["b"], p["q_norm"])
        k = rms(ctx @ p["to_k"]["w"] + p["to_k"]["b"], p["k_norm"])
        v = ctx @ p["to_v"]["w"] + p["to_v"]["b"]
        hd = q.shape[-1] // heads
        q = q.view(*q.shape[:2], heads, hd)
        k = k.view(*k.shape[:2], heads, hd)
        v = v.view(*v.shape[:2], heads, hd)
        if q_pe is not None:
            q = rope_split(q, q_pe)
            k = rope_split(k, q_pe if k_pe is None else k_pe)
        s = torch.einsum("blnd,bsnd->bnls", q, k) / math.sqrt(hd)
        o = torch.einsum("bnls,bsnd->blnd", torch.softmax(s, -1), v)
        return o.reshape(*x.shape[:2], -1) @ p["to_out"]["w"] \
            + p["to_out"]["b"]

    def ada(table, t, idx, dim):
        tt = t.view(B, t.shape[1], -1, dim)
        return [table[None, None, i] + tt[:, :, i] for i in idx]

    def mod(x, scale, shift):
        tm = scale.shape[1]
        xr = x.view(B, tm, x.shape[1] // tm, x.shape[-1])
        return (xr * (1 + scale.unsqueeze(2))
                + shift.unsqueeze(2)).view_as(x)

    def gate(x, gt):
        tm = gt.shape[1]
        xr = x.view(B, tm, x.shape[1] // tm, x.shape[-1])
        return (xr * gt.unsqueeze(2)).view_as(x)

    p = {
        "attn1": attnp(dv, dv, dv), "attn2": attnp(dv, dv, dv),
        "ff": {"fc1": lin(dv, 4 * dv), "fc2": lin(4 * dv, dv)},
        "sst_v": rn(n_ada, dv, s=0.2),
        "audio_attn1": attnp(da, da, da), "audio_attn2": attnp(da, da, da),
        "audio_ff": {"fc1": lin(da, 4 * da), "fc2": lin(4 * da, da)},
        "sst_a": rn(n_ada, da, s=0.2),
        "a2v": attnp(dv, da, da), "v2a": attnp(da, dv, da),
        "sst_av_a": rn(5, da, s=0.2), "sst_av_v": rn(5, dv, s=0.2),
    }
    vx0 = rn(B, Lv, dv)
    ax0 = rn(B, La, da)
    vx, ax = vx0.clone(), ax0.clone()
    v_ctx = rn(B, Lc, dv)
    a_ctx = rn(B, Lc, da)
    v_t = rn(B, tmv, n_ada * dv, s=0.3)
    a_t = rn(B, tma, n_ada * da, s=0.3)
    v_css = rn(B, tmv, 4 * dv, s=0.3)
    v_cg = rn(B, tmv, dv, s=0.3)
    a_css = rn(B, tma, 4 * da, s=0.3)
    a_cg = rn(B, tma, da, s=0.3)
    v_pe = rope_tab(Lv, hv, dv // hv // 2)
    a_pe = rope_tab(La, ha, da // ha // 2)
    v_xpe = rope_tab(Lv, ha, da // ha // 2)   # av cross: audio-sized heads
    a_xpe = rope_tab(La, ha, da // ha // 2)

    # --- video self + text cross (transformer.py:253-282) ---
    sh, sc, gt = ada(p["sst_v"], v_t, (0, 1, 2), dv)
    y = mod(rms(vx), sc, sh)
    vx = vx + gate(attn_fwd(p["attn1"], y, y, hv, q_pe=v_pe), gt)
    vx = vx + attn_fwd(p["attn2"], rms(vx), v_ctx, hv)

    # --- audio self + text cross (:297-330) ---
    sh, sc, gt = ada(p["sst_a"], a_t, (0, 1, 2), da)
    y = mod(rms(ax), sc, sh)
    ax = ax + gate(attn_fwd(p["audio_attn1"], y, y, ha, q_pe=a_pe), gt)
    ax = ax + attn_fwd(p["audio_attn2"], rms(ax), a_ctx, ha)

    # --- a2v / v2a cross (:333-424) ---
    vn, an = rms(vx), rms(ax)
    a_s_a2v, a_sh_a2v, a_s_v2a, a_sh_v2a = ada(
        p["sst_av_a"][:4], a_css, range(4), da)
    g_v2a = p["sst_av_a"][None, None, 4] + a_cg
    v_s_a2v, v_sh_a2v, v_s_v2a, v_sh_v2a = ada(
        p["sst_av_v"][:4], v_css, range(4), dv)
    g_a2v = p["sst_av_v"][None, None, 4] + v_cg
    o = attn_fwd(p["a2v"], mod(vn, v_s_a2v, v_sh_a2v),
                 mod(an, a_s_a2v, a_sh_a2v), ha, q_pe=v_xpe, k_pe=a_xpe)
    vx = vx + gate(o, g_a2v)
    o = attn_fwd(p["v2a"], mod(an, a_s_v2a, a_sh_v2a),
                 mod(vn, v_s_v2a, v_sh_v2a), ha, q_pe=a_xpe, k_pe=v_xpe)
    ax = ax + gate(o, g_v2a)

    # --- FFN (:436-467) ---
    def ffn(fp, y):
        h = y @ fp["fc1"]["w"] + fp["fc1"]["b"]
        return F.gelu(h, approximate="tanh") @ fp["fc2"]["w"] \
            + fp["fc2"]["b"]

    sh, sc, gt = ada(p["sst_v"], v_t, (3, 4, 5), dv)
    vx = vx + gate(ffn(p["ff"], mod(rms(vx), sc, sh)), gt)
    sh, sc, gt = ada(p["sst_a"], a_t, (3, 4, 5), da)
    ax = ax + gate(ffn(p["audio_ff"], mod(rms(ax), sc, sh)), gt)

    flat = {}
    for name, sub in p.items():
        if isinstance(sub, dict):
            for k2, v2 in sub.items():
                if isinstance(v2, dict):
                    flat[f"{name}.{k2}.w"] = v2["w"]
                    flat[f"{name}.{k2}.b"] = v2["b"]
                else:
                    flat[f"{name}.{k2}"] = v2
        else:
            flat[name] = sub
    tensors = dict(flat, vx=vx0, ax=ax0, v_ctx=v_ctx, a_ctx=a_ctx,
                   v_t=v_t, a_t=a_t, v_css=v_css, v_cg=v_cg,
                   a_css=a_css, a_cg=a_cg,
                   v_pe_cos=v_pe[0], v_pe_sin=v_pe[1],
                   a_pe_cos=a_pe[0], a_pe_sin=a_pe[1],
                   v_xpe_cos=v_xpe[0], v_xpe_sin=v_xpe[1],
                   a_xpe_cos=a_xpe[0], a_xpe_sin=a_xpe[1],
                   out_vx=vx, out_ax=ax)
    save("ltx2_av_block.npz",
         **{k: v.to(torch.float32) for k, v in tensors.items()})


if __name__ == "__main__" and os.environ.get("GOLDEN_ONLY") == "ltx2":
    gen_ltx2_av_block()
