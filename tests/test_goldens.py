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
