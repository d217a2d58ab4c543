"""PiD pixel-space diffusion upscaler (postprocessing/pid/)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wan2gp_tpu.postprocessing.pid import (
    PiDConfig, init_pid_net, pid_net, pid_sample, pid_upscale,
    _sigma_gate, _tile_axis, _ramp_weight, PID_STUDENT_T)


@pytest.fixture(scope="module")
def net():
    cfg = PiDConfig.tiny()
    return init_pid_net(jax.random.key(0), cfg), cfg


def _inputs(cfg, b=1, h=16, w=16, seed=0):
    rs = np.random.RandomState(seed)
    zh = h // cfg.sr_scale // cfg.latent_down * cfg.sr_scale
    # latent grid for an h x w OUTPUT: lq = h/sr, latent = lq/down
    zh = max(1, (h // cfg.sr_scale) // cfg.latent_down)
    zw = max(1, (w // cfg.sr_scale) // cfg.latent_down)
    x = jnp.asarray(rs.randn(b, h, w, 3), jnp.float32)
    t = jnp.full((b,), 999.0)
    y = jnp.asarray(rs.randn(b, 4, cfg.txt_dim), jnp.float32)
    lq = jnp.asarray(rs.randn(b, zh, zw, cfg.lq_latent_channels),
                     jnp.float32)
    sigma = jnp.zeros((b,))
    return x, t, y, lq, sigma


def test_forward_shapes(net):
    params, cfg = net
    x, t, y, lq, sigma = _inputs(cfg)
    v = pid_net(params, cfg, x, t, y, lq, sigma)
    assert v.shape == x.shape
    assert bool(jnp.isfinite(v).all())


def test_text_and_time_conditioning(net):
    params, cfg = net
    x, t, y, lq, sigma = _inputs(cfg)
    v0 = pid_net(params, cfg, x, t, y, lq, sigma)
    rs = np.random.RandomState(9)
    v1 = pid_net(params, cfg, x, t,
                 y + jnp.asarray(rs.randn(*y.shape), jnp.float32),
                 lq, sigma)
    assert float(jnp.abs(v0 - v1).max()) > 0.0
    v2 = pid_net(params, cfg, x, t * 0.3, y, lq, sigma)
    assert float(jnp.abs(v0 - v2).max()) > 0.0


def test_lq_zero_init_is_inert_then_active(net):
    """Zero-init heads: changing the LQ latent must NOT change the
    output at init (pid starts as the pretrained T2I); after giving a
    head weight, it must."""
    params, cfg = net
    x, t, y, lq, sigma = _inputs(cfg)
    v0 = pid_net(params, cfg, x, t, y, lq, sigma)
    v1 = pid_net(params, cfg, x, t, y, lq * 3.0, sigma)
    assert float(jnp.abs(v0 - v1).max()) == 0.0
    params2 = jax.tree.map(lambda a: a, params)
    params2["lq_heads"] = [
        {"w": jnp.ones_like(h["w"]) * 0.05, "b": h["b"]}
        for h in params["lq_heads"]]
    w0 = pid_net(params2, cfg, x, t, y, lq, sigma)
    w1 = pid_net(params2, cfg, x, t, y, lq * 3.0, sigma)
    assert float(jnp.abs(w0 - w1).max()) > 0.0


def test_sigma_gate_monotone():
    """Gate opens at sigma=0 (~0.88 with bias 2) and closes at high
    sigma (lq_projection_2d.py init comment)."""
    gp = {"proj": {"w": jnp.zeros((8, 4)), "b": jnp.full((4,), 2.0)},
          "log_alpha": jnp.asarray(np.log(5.0), jnp.float32)}
    x = jnp.zeros((1, 2, 4))
    lq = jnp.ones((1, 2, 4))
    lo = _sigma_gate(gp, x, lq, jnp.zeros((1,)))
    hi = _sigma_gate(gp, x, lq, jnp.ones((1,)))
    assert abs(float(lo.mean()) - 0.8808) < 1e-3
    assert float(hi.mean()) < 0.06


def test_student_schedule_sampling(net):
    params, cfg = net
    _, _, y, lq, _ = _inputs(cfg)
    assert PID_STUDENT_T == (0.999, 0.866, 0.634, 0.342, 0.0)
    out = pid_sample(params, cfg, y, lq, 16, 16, num_steps=2, seed=3)
    assert out.shape == (1, 16, 16, 3)
    assert bool(jnp.isfinite(out).all())
    assert float(out.min()) >= -1.0 and float(out.max()) <= 1.0
    # deterministic per seed
    out2 = pid_sample(params, cfg, y, lq, 16, 16, num_steps=2, seed=3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2),
                               atol=1e-6)


def test_tile_axis_and_ramp():
    spans = _tile_axis(100, 40)
    assert spans[0] == (0, 40) and spans[-1] == (60, 100)
    assert all(b - a == 40 for a, b in spans)
    w = _ramp_weight(16, 16, 0, 0, 16, 16, 64, 64)
    # top-left tile: no ramp at top/left, ramps at bottom/right
    assert w[0, 0, 0] == 1.0
    assert w[0, -1, 0] == 0.0 and w[-1, 0, 0] == 0.0
    full = _ramp_weight(16, 16, 0, 0, 16, 16, 16, 16)
    assert (full == 1.0).all()


def test_upscale_end_to_end(net):
    params, cfg = net
    img = np.random.RandomState(5).randint(0, 255, (16, 16, 3),
                                           np.uint8)

    def vae_encode_fn(x):
        # stand-in LQ VAE: nearest-subsample to the latent grid
        b, h, w, _ = x.shape
        d = cfg.latent_down
        zh, zw = max(1, h // d), max(1, w // d)
        yi = np.arange(zh) * h // zh
        xi = np.arange(zw) * w // zw
        z = x[:, yi][:, :, xi]
        return np.repeat(z, cfg.lq_latent_channels // 3 + 1,
                         -1)[..., :cfg.lq_latent_channels]

    out = pid_upscale(params, cfg, img, vae_encode_fn=vae_encode_fn,
                      num_steps=2)
    assert out.shape == (64, 64, 3) and out.dtype == np.uint8


def test_service_dispatch_pid(net):
    from wan2gp_tpu.runtime.service import _apply_spatial_upsampling
    params, cfg = net

    def enc(x):
        b, h, w, _ = x.shape
        d = cfg.latent_down
        zh, zw = max(1, h // d), max(1, w // d)
        yi = np.arange(zh) * h // zh
        xi = np.arange(zw) * w // zw
        z = x[:, yi][:, :, xi]
        return np.repeat(z, cfg.lq_latent_channels // 3 + 1,
                         -1)[..., :cfg.lq_latent_channels]

    merged = {"spatial_upsampling": "flux_vae_pid4",
              "_pid_params": params, "_pid_cfg": cfg,
              "_pid_vae_encode_fn": enc}
    video = np.random.RandomState(6).randint(0, 255, (1, 16, 16, 3),
                                             np.uint8)
    out = _apply_spatial_upsampling(video, merged)
    assert out.shape == (1, 64, 64, 3)
