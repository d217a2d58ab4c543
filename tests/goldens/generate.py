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
