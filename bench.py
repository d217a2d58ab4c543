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

Env knobs:
  BENCH_CONFIG=14b_720p (default) | 14b_720p_distilled | 14b_480p | 1.3b
      14b_720p_distilled = the FusioniX-style 10-step CFG-free accelerator
      profile (reference defaults/vace_multitalk_14B.json: guidance 1,
      10 steps) — the configuration whose projected v5p-8 e2e meets the
      <=90 s north star.
  BENCH_ATTN=radial (default for 14b) | dense
      radial = block-sparse radial attention (ops/sparse_attention.py),
      measured 1.45-1.55x over the dense Pallas flash kernel at 75,600
      tokens.  MFU is reported dense-equivalent (speedup vs a dense
      baseline), as is standard for sparse attention.
  BENCH_MESH=dp=2,cp=2,tp=2
      validation mode: runs the 1.3B config sharded over a device mesh
      (use with JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_
      device_count=8 on a CPU host) and reports sharded steps/sec.
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


def flops_per_step(cfg, batch, seq, text_len, self_attn_density=1.0):
    """FLOPs of one denoise step (both CFG branches) at `batch` per branch.

    self_attn_density scales ONLY the self-attention score/value matmuls —
    density 1.0 gives dense-equivalent FLOPs (sparse attention credited
    with dense work, the usual sparse-speedup accounting); the measured
    mask density gives real-compute FLOPs."""
    d, f, l = cfg.dim, cfg.ffn_dim, cfg.num_layers
    b = 2 * batch  # cond + uncond
    per_block = (
        8 * b * seq * d * d                      # self qkv + o
        + 4 * b * seq * seq * d * self_attn_density   # self attention
        + 4 * b * seq * d * d                    # cross q + o
        + 4 * b * text_len * d * d               # cross k + v
        + 4 * b * seq * text_len * d             # cross attention
        + 4 * b * seq * d * f                    # ffn
    )
    return l * per_block


def radial_density(backend: str, seq: int) -> float:
    """Self-attention compute density of a sparse backend spec (1.0 =
    dense).  radial/swa: measured block-mask density.  sol: the kernel
    computes exactly W = ceil(budget * nKb) blocks per q row (the
    data decides WHICH; the centroid fallback adds ~1/block_kv)."""
    if backend.startswith("sol"):
        import math as _m
        from wan2gp_tpu.ops.sol_attention import parse_sol_backend
        budget = parse_sol_backend(backend).get("budget", 0.35)
        nkb = -(-seq // 256)
        w = max(1, min(nkb, int(_m.ceil(budget * nkb))))
        return w / nkb + 1.0 / 256
    if not backend.startswith(("radial", "swa")):
        return 1.0
    from wan2gp_tpu.ops.attention import _structured_block_mask
    mask = _structured_block_mask(backend, seq, seq, 512, 256)
    return 1.0 if mask is None else float(np.asarray(mask).mean())


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


def teacache_bench_schedule(steps: int, speed_factor: float = 1.75):
    """Representative TeaCache calc/skip schedule at a given speed factor
    (the data-driven variant, caches.teacache_schedule, needs real
    modulation traces; the bench uses the same calc COUNT the reference's
    auto-threshold targets — docs/TROUBLESHOOTING.md:105 documents
    1.5-2.0x as the typical multiplier, "Balanced" default 1.75)."""
    calc = max(2, round(steps / speed_factor))
    idx = np.linspace(0, steps - 1, calc).round().astype(int)
    sched = np.zeros(steps, bool)
    sched[idx] = True
    sched[0] = sched[-1] = True
    return sched


def bench_denoise(cfg, params, lat_shape, sampling_kwargs, steps_timed=2,
                  backend="pallas", skip_schedule=None):
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
        kw = dict(guide_scale=5.0)
        kw.update(sampling_kwargs)
        sampling = SamplingConfig(solver="unipc", steps=steps, **kw)
        skips = (None if skip_schedule is None
                 else np.asarray(skip_schedule[:steps], bool))
        if skips is not None:
            skips[0] = True
        if sampling.host_loop:
            out = denoise_scan(params, cfg, sched, latents, ctx, ctx,
                               sampling, cos, sin, attn_backend=backend,
                               skip_schedule=skips)
        else:
            out = jax.jit(
                lambda p, x, c: denoise_scan(p, cfg, sched, x, c, c,
                                             sampling, cos, sin,
                                             attn_backend=backend,
                                             skip_schedule=skips)
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
    # bf16 conv tower = the reference's default vae_precision "16" policy
    # (decode is HBM-bound on v5e: bf16 buys ~6%; the bigger lever is the
    # cp-sharded decode, vae_scan.py vae_decode_sharded)
    dec = jax.jit(lambda p, z: vae_decode_chunked(
        p, vae_cfg, z, dtype=jnp.bfloat16).sum())
    float(dec(vae_params, z))  # compile + sync via host fetch
    start = time.perf_counter()
    float(dec(vae_params, z))
    vae_dt = time.perf_counter() - start
    frames = (lat_f - 1) * 4 + 1
    return vae_dt, frames / vae_dt


def bench_mesh(spec: str):
    """Sharded-denoise validation mode: 1.3B over a dp/cp/tp mesh."""
    from wan2gp_tpu.models.wan.dit import WanDiTConfig, init_wan_dit
    from wan2gp_tpu.models.wan.pipeline import WanPipeline, SamplingConfig
    from wan2gp_tpu.parallel import make_mesh, parse_mesh_spec

    sizes = parse_mesh_spec(spec)
    n = 1
    for v in sizes.values():
        n *= v
    # force n virtual CPU devices BEFORE any device query initializes the
    # backend (the interpreter may pre-import jax on the TPU platform, so
    # env vars alone are not enough — force through the live config like
    # tests/conftest.py)
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        flags = (flags
                 + f" --xla_force_host_platform_device_count={n}").strip()
    if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
        # n virtual device threads time-share few physical cores; don't
        # let the collective rendezvous kill-switch (default 40 s) abort
        # a starved participant thread
        flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds="
                  "300 --xla_cpu_collective_call_terminate_timeout_seconds"
                  "=3000")
    os.environ["XLA_FLAGS"] = flags
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    if jax.device_count() < n:
        raise RuntimeError(f"BENCH_MESH {spec!r} needs {n} devices; have "
                           f"{jax.device_count()}")
    mesh = make_mesh(sizes, devices=jax.devices()[:n])
    cfg = WanDiTConfig(dim=1536, ffn_dim=8960, num_heads=12, num_layers=30)
    pipe = WanPipeline(init_wan_dit(jax.random.key(0), cfg), cfg,
                       attn_backend="xla")
    pipe.apply_mesh(mesh)
    rng = np.random.default_rng(0)
    lat = jnp.asarray(rng.standard_normal((1, 16, 5, 16, 16)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, cfg.text_len, cfg.text_dim)),
                      jnp.float32)
    sampling = SamplingConfig(solver="unipc", steps=2, guide_scale=5.0)
    out = pipe.denoise(lat, ctx, ctx, sampling)
    assert np.isfinite(float(jnp.sum(out)))
    t0 = time.perf_counter()
    out = pipe.denoise(lat, ctx, ctx, sampling)
    s = float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / sampling.steps
    assert np.isfinite(s)
    print(json.dumps({
        "metric": f"wan2.1-1.3B sharded denoise steps/sec over mesh "
                  f"{sizes} ({len(mesh.devices.flat)} devices, "
                  f"{jax.devices()[0].device_kind})",
        "value": round(1.0 / dt, 4),
        "unit": "steps/sec",
        "vs_baseline": 1.0,
    }))


def main():
    from wan2gp_tpu.models.wan.dit import WanDiTConfig, init_wan_dit

    mesh_spec = os.environ.get("BENCH_MESH", "")
    if mesh_spec:
        bench_mesh(mesh_spec)
        return

    which = os.environ.get("BENCH_CONFIG", "14b_720p")
    a8 = os.environ.get("BENCH_A8", "1" if which.startswith("14b")
                        else "0") == "1"
    if a8:
        # W4A8 (default for the 14B configs): dynamic per-token int8
        # activations on the MXU s8 path (2x bf16 rate) — the reference's
        # first-class asym W4A8 qtype (shared/qtypes/asym_w4a8_int8.py).
        # Measured dense-equiv MFU 0.828 -> 0.939 at 14B/720p/radial.
        # BENCH_A8=0 reverts to bf16 activations.
        from wan2gp_tpu.ops.quant import set_act_quant
        set_act_quant("int8")
    kind = jax.devices()[0].device_kind
    peak = PEAK_BF16.get(kind, 197e12)
    distilled = which.endswith("_distilled")
    attn = os.environ.get("BENCH_ATTN",
                          "radial" if which.startswith("14b") else "dense")

    if which.startswith("14b"):
        cfg = WanDiTConfig(dim=5120, ffn_dim=13824, num_heads=40,
                           num_layers=40)
        params = rand_wan_params_w4(cfg)
        jax.block_until_ready(params)
        if which.startswith("14b_720p"):
            lat = (1, 16, 21, 90, 160)     # 1280x720 x 81f -> 75,600 tokens
            res = "1280x720x81f"
        else:
            lat = (1, 16, 21, 60, 104)     # 832x480 x 81f -> 32,760 tokens
            res = "832x480x81f"
        guide = 1.0 if distilled else 5.0
        steps = 10 if distilled else 30
        backend = "pallas"
        if attn == "radial":
            pt, ph, pw = cfg.patch_size
            tpf = (lat[3] // ph) * (lat[4] // pw)
            backend = f"radial:{lat[2] // pt}:{tpf}"
        elif attn.startswith("sol"):
            # data-dependent Sol-Attn (BENCH_ATTN=sol[:tau[:budget]])
            backend = attn
        cache = os.environ.get("BENCH_CACHE", "")
        skips, cache_note = None, ""
        if cache.startswith("tea"):
            # BENCH_CACHE=tea[:factor] — time the FULL schedule so the
            # skip steps' real cost (solver + embeddings + head) shows
            factor = float(cache.split(":")[1]) if ":" in cache else 1.75
            skips = teacache_bench_schedule(steps, factor)
            cache_note = (f" + TeaCache-{factor}x schedule "
                          f"({int(skips.sum())}/{steps} calc)")
        dt, seq = bench_denoise(
            cfg, params, lat,
            dict(joint_pass=False, host_loop=True, guide_scale=guide),
            steps_timed=(steps if skips is not None else 1),
            backend=backend, skip_schedule=skips)
        wq = "w4a8" if a8 else "w4"
        name = (f"wan2.1-14B {wq} distilled-10step-CFGfree" if distilled
                else f"wan2.1-14B {wq}")
        cfg_mode = "CFG-free" if distilled else "sequential CFG"
        quant = f"{wq} Pallas + {cfg_mode} + {attn} attention{cache_note}"
    else:
        cfg = WanDiTConfig(dim=1536, ffn_dim=8960, num_heads=12,
                           num_layers=30)
        params = init_wan_dit(jax.random.key(0), cfg)
        lat = (1, 16, 21, 60, 104)
        res = "832x480x81f"
        guide, steps = 5.0, 30
        backend = "pallas"
        dt, seq = bench_denoise(cfg, params, lat, dict(joint_pass=True),
                                steps_timed=3)
        name = "wan2.1-1.3B bf16"
        quant = "joint CFG"

    # dual MFU accounting: dense-equivalent (sparse attention credited
    # with dense FLOPs — the usual sparse-speedup convention) AND
    # real-compute (only FLOPs actually executed, mask density applied).
    # Both are vs the bf16 MXU peak; on the int8 activation path (BENCH_A8)
    # the s8 peak is 2x bf16, so real utilization OF THE INT8 PEAK for the
    # quantized matmuls is half the printed real-compute figure.
    density = radial_density(backend, seq)
    fl = flops_per_step(cfg, lat[0], seq, cfg.text_len)
    fl_real = flops_per_step(cfg, lat[0], seq, cfg.text_len,
                             self_attn_density=density)
    if guide == 1.0:
        fl //= 2                           # single branch per step
        fl_real /= 2
    mfu = fl / dt / peak
    mfu_real = fl_real / dt / peak
    del params

    vae_dt, vae_fps = bench_vae(lat[2], lat[3], lat[4])
    e2e = steps * dt + vae_dt
    # v5p-8 projection: same MFU on 8 chips at the v5p peak; VAE decode
    # kept single-chip (conservative)
    scale = (PEAK_BF16["TPU v5p"] / peak) * 8
    e2e_v5p8 = steps * dt / scale + vae_dt
    # distilled FusioniX/Lightning profile (10 steps, CFG-free —
    # reference defaults/vace_14B_fusionix.json): conservative bound
    # reuses THIS run's full sequential-CFG step time (measured
    # CFG-free steps are ~32% faster, BENCH_CONFIG=14b_720p_distilled)
    dist_note = ""
    if not distilled:
        e2e_dist = 10 * dt / scale + vae_dt
        dist_note = (f"; 10-step distilled profile projects "
                     f"~{e2e_dist:.0f}s at the same step time")

    print(json.dumps({
        "metric": f"{name} {res} denoise steps/sec/chip "
                  f"(UniPC solver in the timed scan, {quant}, {kind}, "
                  f"dense-equiv MFU={mfu:.3f}, real-compute MFU="
                  f"{mfu_real:.3f} at mask density {density:.3f} vs bf16 "
                  f"peak; VAE decode {vae_fps:.1f} fps;"
                  f" e2e {steps} steps+decode ~{e2e:.0f}s on ONE chip; "
                  f"projected v5p-8 at equal MFU ~{e2e_v5p8:.0f}s "
                  f"vs <=90s target{dist_note})",
        "value": round(1.0 / dt, 4),
        "unit": "steps/sec",
        "vs_baseline": round(mfu / 0.40, 4),
    }))


if __name__ == "__main__":
    main()
