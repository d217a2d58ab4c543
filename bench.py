"""Benchmark: Wan 2.1 1.3B denoise step rate on one TPU chip.

Workload: the reference's flagship low-VRAM config (SURVEY.md §6) —
Wan 2.1 T2V 1.3B, 832x480, 81 frames -> latent grid (21, 60, 104) ->
21*30*52 = 32,760 tokens, joint-CFG batch of 2, solver step included.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no steps/sec numbers (BASELINE.md), so
vs_baseline reports measured denoise MFU / 0.40 (the north-star >=40% MFU
target from BASELINE.json).
"""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

PEAK_BF16 = {
    "TPU v5 lite": 197e12,   # v5e
    "TPU v5e": 197e12,
    "TPU v5p": 459e12,
    "TPU v4": 275e12,
    "TPU v6 lite": 918e12,   # v6e
}


def flops_per_forward(cfg, batch, seq, text_len):
    d, f, l = cfg.dim, cfg.ffn_dim, cfg.num_layers
    per_block = (
        8 * batch * seq * d * d                      # self qkv + o
        + 4 * batch * seq * seq * d                  # self attention
        + 4 * batch * seq * d * d                    # cross q + o
        + 4 * batch * text_len * d * d               # cross k + v
        + 4 * batch * seq * text_len * d             # cross attention
        + 4 * batch * seq * d * f                    # ffn
    )
    return l * per_block


def main():
    from wan2gp_tpu.models.wan.dit import (
        WanDiTConfig, init_wan_dit, wan_dit_forward)
    from wan2gp_tpu.ops.rope import build_rope_3d

    cfg = WanDiTConfig(dim=1536, ffn_dim=8960, num_heads=12, num_layers=30)
    lat_f, lat_h, lat_w = 21, 60, 104           # 832x480, 81 frames
    grid = (lat_f, lat_h // 2, lat_w // 2)
    seq = grid[0] * grid[1] * grid[2]
    batch = 2                                    # joint CFG pass

    params = init_wan_dit(jax.random.key(0), cfg)
    latents = jnp.zeros((batch, cfg.in_dim, lat_f, lat_h, lat_w), jnp.float32)
    t = jnp.full((batch,), 500.0)
    context = jnp.zeros((batch, cfg.text_len, cfg.text_dim), jnp.bfloat16)
    rope_cos, rope_sin = build_rope_3d(grid, head_dim=cfg.head_dim)

    # .sum() -> scalar host fetch: block_until_ready alone can return early
    # through remote-execution relays, under-measuring the step time.
    fwd = jax.jit(lambda p, x, tt, c: wan_dit_forward(
        p, cfg, x, tt, c, rope_cos, rope_sin).sum())

    np.asarray(fwd(params, latents, t, context))  # compile + sync

    n_iter = 5
    start = time.perf_counter()
    for _ in range(n_iter):
        out = fwd(params, latents, t, context)
    np.asarray(out)
    dt = (time.perf_counter() - start) / n_iter

    steps_per_sec = 1.0 / dt
    fl = flops_per_forward(cfg, batch, seq, cfg.text_len)
    kind = jax.devices()[0].device_kind
    peak = PEAK_BF16.get(kind, 197e12)
    mfu = fl / dt / peak

    # VAE decode fps (chunked scan decode, 480x832, bounded memory)
    from wan2gp_tpu.models.wan.vae import WanVAEConfig, init_wan_vae
    from wan2gp_tpu.models.wan.vae_scan import vae_decode_chunked
    vae_cfg = WanVAEConfig()
    vae_params = init_wan_vae(jax.random.key(1), vae_cfg)
    z = jnp.zeros((1, lat_f, lat_h, lat_w, 16), jnp.float32)
    dec = jax.jit(lambda p, z: vae_decode_chunked(p, vae_cfg, z).sum())
    np.asarray(dec(vae_params, z))  # compile + sync
    start = time.perf_counter()
    np.asarray(dec(vae_params, z))
    vae_dt = time.perf_counter() - start
    frames = (lat_f - 1) * 4 + 1
    vae_fps = frames / vae_dt

    steps = 30
    e2e = steps * dt + vae_dt
    print(json.dumps({
        "metric": "wan2.1-1.3B 832x480x81f denoise steps/sec/chip "
                  f"(joint-CFG, {kind}, MFU={mfu:.3f}; "
                  f"VAE decode {vae_fps:.1f} fps; "
                  f"e2e 30 steps+decode ~{e2e:.0f}s)",
        "value": round(steps_per_sec, 4),
        "unit": "steps/sec",
        "vs_baseline": round(mfu / 0.40, 4),
    }))


if __name__ == "__main__":
    main()
