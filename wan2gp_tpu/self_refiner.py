"""Self-refiner: uncertainty-gated re-denoising of selected steps.

Reference: shared/utils/self_refiner.py (PnPHandler) — a plan string
"start-end:steps, ..." marks solver steps that are re-run `m` times: the
latents are re-noised to the current sigma, re-denoised, and per-pixel
results are frozen once the change in the x0 prediction drops below an
uncertainty threshold (L1 over channels); hooked into the denoise loop at
any2video.py:1450-1453,1685-1687.

TPU adaptation: the refine plan is host-static, so refined steps run a
fixed-m `lax.scan` of (perturb -> forward -> step -> certainty merge); the
reference's data-dependent early exit becomes a no-op through the certainty
masks (already-certain pixels keep their frozen values).
"""
from __future__ import annotations

from typing import Callable, Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp


def parse_refiner_plan(plan_str: str) -> Dict[int, int]:
    """'0-4:2, 10:3' -> {0:2, 1:2, ..., 4:2, 10:3}
    (self_refiner.py:12 _normalize_single_self_refiner_plan_from_str)."""
    out: Dict[int, int] = {}
    if not plan_str or not plan_str.strip():
        return out
    for chunk in plan_str.split(","):
        chunk = chunk.strip()
        if not chunk:
            continue
        if ":" not in chunk:
            raise ValueError(f"invalid refiner entry {chunk!r}: "
                             "use 'start-end:steps'")
        rng, steps = chunk.split(":", 1)
        steps = int(steps)
        if "-" in rng:
            a, b = rng.split("-", 1)
            start, end = int(a), int(b)
        else:
            start = end = int(rng)
        for i in range(start, end + 1):
            out[i] = steps
    return out


def refine_step(forward_fn: Callable, x, t, sigma, sigma_next,
                m_steps: int, key, ths_uncertainty: float = 0.05,
                p_norm: int = 1):
    """Refine one Euler flow step m times.

    forward_fn(x) -> velocity prediction (same shape as x).
    x: [B, C, ...] latents at sigma;  returns refined x_next at sigma_next.

    Mirrors PnPHandler.run_refinement_loop (self_refiner.py:229): attempt 0
    is the plain step; attempts 1..m-1 re-noise x0_hat back to sigma,
    re-denoise, and keep per-pixel values frozen once |x0 change|/C < ths.
    """
    def plain_step(x_in, v):
        x0_hat = x_in - sigma * v
        x_next = x_in + (sigma_next - sigma) * v
        return x_next, x0_hat

    v0 = forward_fn(x)
    x_next, x0_hat = plain_step(x, v0)
    certain = jnp.zeros(x.shape[:1] + x.shape[2:], bool)  # no channel dim

    def body(carry, key_i):
        x_next, x0_hat, certain = carry
        noise = jax.random.normal(key_i, x.shape, jnp.float32)
        x_pert = (1.0 - sigma) * x0_hat + sigma * noise
        v = forward_fn(x_pert)
        x_next_i, x0_i = plain_step(x_pert, v)
        diff = jnp.sum(jnp.abs(x0_i - x0_hat) ** p_norm, axis=1) \
            / x.shape[1]
        newly_certain = (diff < ths_uncertainty) | certain
        keep = newly_certain[:, None].astype(jnp.float32)
        x_next = keep * x_next + (1 - keep) * x_next_i
        x0_hat = keep * x0_hat + (1 - keep) * x0_i
        return (x_next, x0_hat, newly_certain), None

    if m_steps > 1:
        keys = jax.random.split(key, m_steps - 1)
        (x_next, _, _), _ = jax.lax.scan(body, (x_next, x0_hat, certain),
                                         keys)
    return x_next
