"""bf16 residual stream error bound (VERDICT r4 weak #8).

The 14B/720p TeaCache bench carries the DiT residual stream in bf16
(`BENCH_RESID=bf16`) because the fp32 stream + TeaCache residual stacks
exceed the 16 GB chip.  bf16 residuals are the REFERENCE'S own model
dtype (torch bf16 end-to-end), but the repo default is fp32 — this test
bounds the deviation so the bench footnote rests on a measured number
at small dims rather than an assertion.
"""
import numpy as np
import jax
import jax.numpy as jnp

from wan2gp_tpu.models.wan.dit import WanDiTConfig, init_wan_dit, \
    wan_dit_forward
from wan2gp_tpu.models.wan.pipeline import SamplingConfig, denoise_scan
from wan2gp_tpu.schedulers import make_schedule
from wan2gp_tpu.ops.rope import build_rope_3d


def _run(resid_dtype, steps=4):
    cfg = WanDiTConfig(dim=96, ffn_dim=256, num_heads=4, num_layers=4,
                       text_len=16, residual_dtype=resid_dtype)
    params = init_wan_dit(jax.random.key(0), cfg)
    lat = jax.random.normal(jax.random.key(1), (1, 16, 3, 8, 8),
                            jnp.float32)
    ctx = jax.random.normal(jax.random.key(2), (1, 16, cfg.text_dim),
                            jnp.bfloat16)
    cos, sin = build_rope_3d((3, 4, 4), head_dim=cfg.head_dim)
    sched = make_schedule("unipc", steps, shift=5.0)
    out = denoise_scan(params, cfg, sched, lat, ctx, ctx,
                       SamplingConfig(solver="unipc", steps=steps,
                                      guide_scale=5.0),
                       cos, sin, attn_backend="xla")
    return np.asarray(out)


def test_bf16_residual_error_bound():
    f32 = _run(jnp.float32)
    b16 = _run(jnp.bfloat16)
    assert np.isfinite(b16).all()
    scale = np.abs(f32).mean()
    rel = np.abs(b16 - f32).mean() / max(scale, 1e-6)
    # mean deviation of the final latents stays within ~2% of signal —
    # the bf16-resid footnote in docs/BENCH.md cites this bound
    assert rel < 0.02, f"mean relative deviation {rel:.4f}"
    # and the worst-case element stays bounded (no blowup through the
    # 4-step solver recursion)
    worst = np.abs(b16 - f32).max() / max(np.abs(f32).max(), 1e-6)
    assert worst < 0.2, f"max relative deviation {worst:.4f}"
