"""pi-FLUX.2 GM policy machinery (reference models/flux/sampling.py
_gmflow_posterior_mean / _GMFlowPolicy / _policy_rollout and
model.py:189-264 heads): math verified against an independent torch
port of the reference equations, heads checkpoint round-trip, and the
4-step handler end-to-end."""
import math

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from wan2gp_tpu.models.flux.piflow import (
    gm_posterior_mean, gm_u_to_x0, gm_temperature, policy_rollout,
    warp_t, unwarp_t, calculate_sigmas_dst, piflow_spatialize,
    pack_piflux2, unpack_piflux2, init_piflow_heads, load_piflow_heads,
    export_piflow_heads, piflow_sample)


def _torch_posterior_mean(sig_src, sig_t, x_src, x_t, means, gm_vars,
                          lw, eps=1e-6):
    import torch
    sig_src = sig_src.clamp(min=eps)
    sig_t = sig_t.clamp(min=eps)
    a_src, a_t = 1 - sig_src, 1 - sig_t
    aos_src = a_src / sig_src
    aos_t = a_t / sig_t
    zeta = aos_t.square() - aos_src.square()
    nu = aos_t * x_t / sig_t - aos_src * x_src / sig_src
    nu = nu.unsqueeze(-4)
    zeta = zeta.unsqueeze(-4)
    denom = (gm_vars * zeta + 1).clamp(min=eps)
    out_means = (gm_vars * nu + means) / denom
    lwd = (means * (nu - 0.5 * zeta * means)).sum(dim=-3,
                                                  keepdim=True) / denom
    w = (lw + lwd).softmax(dim=-4)
    return (out_means * w).sum(dim=-4)


@pytest.fixture(scope="module")
def gm_case():
    rng = np.random.default_rng(0)
    b, k, c, h, w = 1, 4, 3, 4, 4
    means = rng.normal(size=(b, k, c, h, w)).astype(np.float32)
    lw = np.log(np.asarray(
        rng.dirichlet(np.ones(k), size=(b, 1, h, w))
        .transpose(0, 4, 1, 2, 3), np.float32))
    logstds = rng.normal(size=(b, 1, 1, 1, 1)).astype(np.float32) * 0.3
    x_src = rng.normal(size=(b, c, h, w)).astype(np.float32)
    x_t = rng.normal(size=(b, c, h, w)).astype(np.float32)
    return means, lw, logstds, x_src, x_t


def test_posterior_mean_matches_torch(gm_case):
    import torch
    means, lw, logstds, x_src, x_t = gm_case
    sig_src, sig_t = 0.9, 0.6
    gm_vars = np.exp(logstds * 2) * sig_src ** 2
    ours = np.asarray(gm_posterior_mean(
        jnp.full((1, 1, 1, 1), sig_src), jnp.full((1, 1, 1, 1), sig_t),
        jnp.asarray(x_src), jnp.asarray(x_t), jnp.asarray(means),
        jnp.asarray(gm_vars), jnp.asarray(lw)))
    ref = _torch_posterior_mean(
        torch.full((1, 1, 1, 1), sig_src), torch.full((1, 1, 1, 1),
                                                      sig_t),
        torch.from_numpy(x_src), torch.from_numpy(x_t),
        torch.from_numpy(means), torch.from_numpy(gm_vars),
        torch.from_numpy(lw)).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_rollout_matches_torch_reference(gm_case):
    """Full substep rollout against an independent torch loop of the
    reference update rule (sampling.py:419-455)."""
    import torch
    means, lw, logstds, x_src, _ = gm_case
    sig_start, shift, substeps = 0.9, 3.2, 16
    sigmas = np.asarray([0.9, 0.4])
    sig_dst, m = calculate_sigmas_dst(sigmas, h=0.0)
    gm_vel = {"means": jnp.asarray(means), "logweights": jnp.asarray(lw),
              "logstds": jnp.asarray(logstds)}
    gm_x0 = gm_u_to_x0(gm_vel, jnp.asarray(x_src),
                       jnp.full((1,), sig_start))
    ours = np.asarray(policy_rollout(jnp.asarray(x_src), sig_start,
                                     float(sig_dst[0]), gm_x0,
                                     total_substeps=substeps,
                                     shift=shift))

    # torch port of the same math
    tx = torch.from_numpy(x_src)
    t_means = torch.from_numpy(x_src).unsqueeze(1) \
        - sig_start * torch.from_numpy(means)
    t_vars = torch.from_numpy(np.exp(logstds * 2)) * sig_start ** 2
    t_lw = torch.from_numpy(lw)
    raw_start = sig_start / (shift + (1 - shift) * sig_start)
    raw_end = float(sig_dst[0]) / (shift + (1 - shift) * float(sig_dst[0]))
    delta = raw_start - raw_end
    n_sub = max(1, round(delta * substeps))
    step = delta / n_sub
    raw_t, x_t = raw_start, tx.clone()
    src_sig = torch.full((1, 1, 1, 1), sig_start)
    for _ in range(n_sub):
        sig_t = shift * raw_t / (1 + (shift - 1) * raw_t)
        x0 = _torch_posterior_mean(src_sig,
                                   torch.full((1, 1, 1, 1), sig_t),
                                   tx, x_t, t_means, t_vars, t_lw)
        u = (x_t - x0) / max(sig_t, 1e-4)
        raw_next = max(raw_t - step, 0.0)
        sig_next = shift * raw_next / (1 + (shift - 1) * raw_next)
        x_t = x_t + u * (sig_next - sig_t)
        raw_t = raw_next
    np.testing.assert_allclose(ours, x_t.numpy(), atol=2e-4)
    assert np.allclose(m, 1.0)      # h=0 -> no inter-step noise


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 32, 6, 8)), jnp.float32)
    u = unpack_piflux2(x)
    assert u.shape == (1, 8, 12, 16)
    np.testing.assert_allclose(np.asarray(pack_piflux2(u)),
                               np.asarray(x))


def test_spatialize_softmax_and_shapes():
    rng = np.random.default_rng(2)
    l = 6 * 5
    gm = {"means": jnp.asarray(rng.normal(size=(1, l, 1024)),
                               jnp.float32),
          "logweights": jnp.asarray(rng.normal(size=(1, l, 32)),
                                    jnp.float32),
          "logstds": jnp.asarray(rng.normal(size=(1, 1)), jnp.float32)}
    out = piflow_spatialize(gm, 6, 5, 128)
    assert out["means"].shape == (1, 8, 32, 12, 10)
    assert out["logweights"].shape == (1, 8, 1, 12, 10)
    w = np.exp(np.asarray(out["logweights"]))
    np.testing.assert_allclose(w.sum(axis=1), 1.0, atol=1e-5)


def test_heads_roundtrip():
    from wan2gp_tpu.models.flux.dit import FluxConfig
    cfg = FluxConfig(hidden_size=64, num_heads=4)
    heads = init_piflow_heads(jax.random.key(0), cfg)
    sd = export_piflow_heads(heads)
    assert "proj_out_logstds.1.weight" in sd
    loaded, leftover = load_piflow_heads(sd)
    assert leftover == []
    x = jnp.asarray(np.random.default_rng(3).normal(size=(1, 5, 64)),
                    jnp.float32)
    v = jnp.asarray(np.random.default_rng(4).normal(size=(1, 64)),
                    jnp.float32)
    from wan2gp_tpu.models.flux.piflow import piflow_project
    a = piflow_project(heads, x, v)
    b = piflow_project(loaded, x, v)
    for k in a:
        np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]),
                                   atol=1e-6)


def test_pi_flux2_handler_e2e(monkeypatch):
    from wan2gp_tpu.families.flux import FluxFamilyHandler
    import wan2gp_tpu.models.flux.dit as fdit
    monkeypatch.setattr(fdit, "FLUX2_DEV", dict(
        in_channels=128, out_channels=128, vec_in_dim=1,
        context_in_dim=48, hidden_size=64, mlp_ratio=3.0, num_heads=4,
        depth=1, depth_single_blocks=2, axes_dim=(4, 4, 4, 4),
        theta=2000, qkv_bias=False, guidance_embed=True, flux2=True))
    pipe = FluxFamilyHandler.load_model("pi_flux2", {},
                                        init_random=True,
                                        attn_backend="xla")
    assert pipe.piflow_heads is not None
    from wan2gp_tpu.models.flux.pipeline import FluxSamplingConfig
    z = pipe.generate("a cat", width=64, height=64,
                      sampling=FluxSamplingConfig(steps=4,
                                                  guidance=4.0),
                      seed=0, return_latents=True)
    a = np.asarray(z)
    assert a.shape == (1, 32, 8, 8)
    assert np.isfinite(a).all()
    # the distilled trajectory concentrates mass: the result is not the
    # starting noise
    z2 = pipe.generate("a cat", width=64, height=64,
                       sampling=FluxSamplingConfig(steps=4,
                                                   guidance=4.0),
                       seed=1, return_latents=True)
    assert not np.allclose(a, np.asarray(z2))
