"""Benchmark: Wan 2.1 **14B** denoise on one TPU chip — the north-star config.

Workload (BASELINE.json / models/wan/configs/wan_t2v_14B.py): Wan 2.1 T2V
14B (dim 5120, 40 layers, 40 heads), 1280x720, 81 frames -> latent grid
(21, 90, 160) -> 75,600 tokens, UniPC solver, CFG guide 5.

What is timed: the REAL generation path — `denoise_scan` with the UniPC
solver step and the CFG combine included (sequential-CFG host-loop driver,
two DiT forwards per step), not a bare DiT forward.

How 14B fits one 16 GB v5e chip: int4 weights (ops/quant.py matmul_w4
Pallas dequant-fused matmul, ~7.0 GB) + sequential CFG (halves activation
memory vs the joint pass).  Weights are random (timing is value-independent);
the kernels/tests verify numerics separately (tests/test_quant.py).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no steps/sec numbers (BASELINE.md), so vs_baseline
reports measured denoise MFU / 0.40 (the north-star >=40% MFU target).

Env knobs: BENCH_CONFIG=14b_720p (default) | 14b_480p | 1.3b
"""
import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

# persistent compile cache: 14B-size programs take ~4 min to compile cold
try:
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               "/root/.cache/jax_comp_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
except Exception:
    pass

PEAK_BF16 = {
    "TPU v5 lite": 197e12,   # v5e
    "TPU v5e": 197e12,
    "TPU v5p": 459e12,
    "TPU v4": 275e12,
    "TPU v6 lite": 918e12,   # v6e
}


def flops_per_step(cfg, batch, seq, text_len):
    """FLOPs of one denoise step (both CFG branches) at `batch` per branch."""
    d, f, l = cfg.dim, cfg.ffn_dim, cfg.num_layers
    b = 2 * batch  # cond + uncond
    per_block = (
        8 * b * seq * d * d                      # self qkv + o
        + 4 * b * seq * seq * d                  # self attention
        + 4 * b * seq * d * d                    # cross q + o
        + 4 * b * text_len * d * d               # cross k + v
        + 4 * b * seq * text_len * d             # cross attention
        + 4 * b * seq * d * f                    # ffn
    )
    return l * per_block


def rand_w4_linear(key, d_in, d_out, bias=True):
    """Random packed-int4 linear generated ON DEVICE (no host transfer)."""
    from wan2gp_tpu.ops.quant import W4_BLOCK_K
    kp = -(-d_in // (2 * W4_BLOCK_K)) * (2 * W4_BLOCK_K)
    p = {
        "w_q4": jax.random.randint(key, (kp // 2, d_out), -127, 128,
                                   dtype=jnp.int8),
        "scale": jnp.full((d_out,), 0.25 / d_in, jnp.float32),
    }
    if bias:
        p["b"] = jnp.zeros((d_out,), jnp.bfloat16)
    return p


def rand_wan_params_w4(cfg, seed=0):
    """Random Wan DiT params with all block linears in packed int4."""
    keys = iter(jax.random.split(jax.random.key(seed), 1024))
    d = cfg.dim
    pt, ph, pw = cfg.patch_size

    def lin(d_in, d_out, dtype=jnp.bfloat16):
        return {"w": (jax.random.normal(next(keys), (d_in, d_out),
                                        jnp.float32) * 0.02).astype(dtype),
                "b": jnp.zeros((d_out,), dtype)}

    def stack(fn, n):
        leaves = [fn() for _ in range(n)]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *leaves)

    def attn():
        p = {k: rand_w4_linear(next(keys), d, d)
             for k in ("q", "k", "v", "o")}
        p["norm_q"] = jnp.ones((d,), jnp.float32)
        p["norm_k"] = jnp.ones((d,), jnp.float32)
        return p

    def block():
        return {
            "self_attn": attn(),
            "cross_attn": attn(),
            "norm3": {"w": jnp.ones((d,), jnp.float32),
                      "b": jnp.zeros((d,), jnp.float32)},
            "ffn": {"fc1": rand_w4_linear(next(keys), d, cfg.ffn_dim),
                    "fc2": rand_w4_linear(next(keys), cfg.ffn_dim, d)},
            "modulation": jax.random.normal(next(keys), (6, d),
                                            jnp.float32) * 0.02,
        }

    return {
        "patch_embedding": lin(cfg.in_dim * pt * ph * pw, d, jnp.float32),
        "text_embedding": {"fc1": lin(cfg.text_dim, d), "fc2": lin(d, d)},
        "time_embedding": {"fc1": lin(cfg.freq_dim, d, jnp.float32),
                           "fc2": lin(d, d, jnp.float32)},
        "time_projection": lin(d, 6 * d, jnp.float32),
        "blocks": stack(block, cfg.num_layers),
        "head": {
            "head": lin(d, cfg.out_dim * pt * ph * pw, jnp.float32),
            "modulation": jax.random.normal(next(keys), (2, d),
                                            jnp.float32) * 0.02,
        },
    }


def bench_denoise(cfg, params, lat_shape, sampling_kwargs, steps_timed=2,
                  backend="pallas"):
    """Time the real jitted denoise path: UniPC solver + CFG included."""
    from wan2gp_tpu.models.wan.pipeline import SamplingConfig, denoise_scan
    from wan2gp_tpu.schedulers import make_schedule
    from wan2gp_tpu.ops.rope import build_rope_3d

    _, _, lat_f, lat_h, lat_w = lat_shape
    pt, ph, pw = cfg.patch_size
    grid = (lat_f // pt, lat_h // ph, lat_w // pw)
    latents = jnp.zeros(lat_shape, jnp.float32)
    ctx = jnp.zeros((lat_shape[0], cfg.text_len, cfg.text_dim), jnp.bfloat16)
    cos, sin = build_rope_3d(grid, head_dim=cfg.head_dim)

    def run(steps):
        from wan2gp_tpu.models.wan.pipeline import SamplingConfig
        sched = make_schedule("unipc", steps, shift=5.0)
        sampling = SamplingConfig(solver="unipc", steps=steps,
                                  guide_scale=5.0, **sampling_kwargs)
        if sampling.host_loop:
            out = denoise_scan(params, cfg, sched, latents, ctx, ctx,
                               sampling, cos, sin, attn_backend=backend)
        else:
            out = jax.jit(
                lambda p, x, c: denoise_scan(p, cfg, sched, x, c, c,
                                             sampling, cos, sin,
                                             attn_backend=backend)
            )(params, latents, ctx)
        # scalar HOST FETCH, not block_until_ready: remote-execution relays
        # (axon) can return from block_until_ready before the computation
        # finishes, silently under-measuring (observed: 0.0s/step)
        return float(jnp.sum(out))

    s = run(1)  # compile + warm
    assert np.isfinite(s)
    t0 = time.perf_counter()
    s = run(steps_timed)
    dt = (time.perf_counter() - t0) / steps_timed
    assert np.isfinite(s)
    seq = grid[0] * grid[1] * grid[2]
    return dt, seq


def bench_vae(lat_f, lat_h, lat_w):
    from wan2gp_tpu.models.wan.vae import WanVAEConfig, init_wan_vae
    from wan2gp_tpu.models.wan.vae_scan import vae_decode_chunked
    vae_cfg = WanVAEConfig()
    vae_params = init_wan_vae(jax.random.key(1), vae_cfg)
    z = jnp.zeros((1, lat_f, lat_h, lat_w, 16), jnp.float32)
    dec = jax.jit(lambda p, z: vae_decode_chunked(p, vae_cfg, z).sum())
    float(dec(vae_params, z))  # compile + sync via host fetch
    start = time.perf_counter()
    float(dec(vae_params, z))
    vae_dt = time.perf_counter() - start
    frames = (lat_f - 1) * 4 + 1
    return vae_dt, frames / vae_dt


def main():
    from wan2gp_tpu.models.wan.dit import WanDiTConfig, init_wan_dit

    which = os.environ.get("BENCH_CONFIG", "14b_720p")
    kind = jax.devices()[0].device_kind
    peak = PEAK_BF16.get(kind, 197e12)

    if which.startswith("14b"):
        cfg = WanDiTConfig(dim=5120, ffn_dim=13824, num_heads=40,
                           num_layers=40)
        params = rand_wan_params_w4(cfg)
        jax.block_until_ready(params)
        if which == "14b_720p":
            lat = (1, 16, 21, 90, 160)     # 1280x720 x 81f -> 75,600 tokens
            res = "1280x720x81f"
        else:
            lat = (1, 16, 21, 60, 104)     # 832x480 x 81f -> 32,760 tokens
            res = "832x480x81f"
        dt, seq = bench_denoise(
            cfg, params, lat,
            dict(joint_pass=False, host_loop=True), steps_timed=1)
        name = "wan2.1-14B int4"
        quant = "w4 Pallas + sequential CFG"
    else:
        cfg = WanDiTConfig(dim=1536, ffn_dim=8960, num_heads=12,
                           num_layers=30)
        params = init_wan_dit(jax.random.key(0), cfg)
        lat = (1, 16, 21, 60, 104)
        res = "832x480x81f"
        dt, seq = bench_denoise(cfg, params, lat, dict(joint_pass=True),
                                steps_timed=3)
        name = "wan2.1-1.3B bf16"
        quant = "joint CFG"

    fl = flops_per_step(cfg, lat[0], seq, cfg.text_len)
    mfu = fl / dt / peak
    del params

    vae_dt, vae_fps = bench_vae(lat[2], lat[3], lat[4])
    steps = 30
    e2e = steps * dt + vae_dt

    print(json.dumps({
        "metric": f"{name} {res} denoise steps/sec/chip "
                  f"(UniPC solver+CFG in the timed scan, {quant}, {kind}, "
                  f"MFU={mfu:.3f}; VAE decode {vae_fps:.1f} fps; "
                  f"e2e 30 steps+decode ~{e2e:.0f}s on ONE chip)",
        "value": round(1.0 / dt, 4),
        "unit": "steps/sec",
        "vs_baseline": round(mfu / 0.40, 4),
    }))


if __name__ == "__main__":
    main()
