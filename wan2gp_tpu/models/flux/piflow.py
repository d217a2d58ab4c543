"""pi-Flow (pi-FLUX.2): Gaussian-mixture velocity-field distillation
heads + analytic GM-policy rollout sampler (reference
models/flux/model.py:189-264 pi-Flow prediction heads,
models/flux/sampling.py:300-470 _GMFlowPolicy / _policy_rollout /
_flow_map_sde_* / _gmflow_posterior_mean).

The 4-step distilled FLUX.2-dev predicts, per outer step, a K=8
Gaussian mixture over the velocity field at unpacked (2x2) latent
resolution: means [B, K, C, H, W], per-pixel logweights [B, K, 1, H, W]
and a scalar log-std.  Each outer step then rolls the probability-flow
ODE analytically through ~128 substeps using the GM posterior mean of
x0 — no further network calls — under a shifted-sigmoid time warp
(shift 3.2).

TPU-first: the rollout is a `lax.scan` of cheap elementwise math; the
network runs exactly once per outer step.
"""
from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .dit import FluxConfig, _linear, _dense


# ---------------------------------------------------------------------------
# heads (model.py:189-201)
# ---------------------------------------------------------------------------

def init_piflow_heads(key, cfg: FluxConfig, means_dim: int = 1024,
                      logweights_dim: int = 32,
                      dtype=jnp.float32) -> Dict[str, Any]:
    h = cfg.hidden_size
    ks = iter(jax.random.split(key, 8))
    return {
        "proj_out_means": _linear(next(ks), h, means_dim, dtype),
        "proj_out_logweights": _linear(next(ks), h, logweights_dim,
                                       dtype),
        "proj_out_logstds": {
            "fc1": _linear(next(ks), h, means_dim, dtype),
            "fc2": _linear(next(ks), means_dim, 1, dtype),
        },
    }


def piflow_project(heads, modulated, vec):
    """Token-major GM projections from the final-layer modulated tokens
    (model.py:218-231): means [B, L, 1024], logweights [B, L, 32],
    logstds [B, 1] (from the global vec)."""
    means = _dense(modulated, heads["proj_out_means"], jnp.float32)
    logweights = _dense(modulated, heads["proj_out_logweights"],
                        jnp.float32)
    s = _dense(jax.nn.silu(
        _dense(vec.astype(jnp.float32), heads["proj_out_logstds"]["fc1"],
               jnp.float32)), heads["proj_out_logstds"]["fc2"],
        jnp.float32)
    return {"means": means, "logweights": logweights, "logstds": s}


def piflow_spatialize(gm: Dict[str, Any], h_tok: int, w_tok: int,
                      out_channels: int, patch: int = 2):
    """Token-major -> spatial GM (model.py:238-264): means
    [B, K, C, H, W], logweights log-softmaxed over K, logstds
    [B, 1, 1, 1, 1]."""
    means, lw = gm["means"], gm["logweights"]
    b = means.shape[0]
    k = means.shape[-1] // out_channels
    c = out_channels // (patch * patch)
    means = means.reshape(b, h_tok, w_tok, k, c, patch, patch)
    means = means.transpose(0, 3, 4, 1, 5, 2, 6).reshape(
        b, k, c, h_tok * patch, w_tok * patch)
    lw = lw.reshape(b, h_tok, w_tok, k, 1, patch, patch)
    lw = lw.transpose(0, 3, 4, 1, 5, 2, 6).reshape(
        b, k, 1, h_tok * patch, w_tok * patch)
    lw = jax.nn.log_softmax(lw, axis=1)
    std = gm["logstds"].reshape(b, 1, 1, 1, 1)
    return {"means": means, "logweights": lw, "logstds": std}


def unpack_piflux2(x, patch: int = 2):
    """[B, C*p*p, h, w] -> [B, C, h*p, w*p] (sampling.py:457-463)."""
    b, pc, h, w = x.shape
    c = pc // (patch * patch)
    x = x.reshape(b, c, patch, patch, h, w)
    return x.transpose(0, 1, 4, 2, 5, 3).reshape(b, c, h * patch,
                                                 w * patch)


def pack_piflux2(x, patch: int = 2):
    b, c, h, w = x.shape
    hp, wp = h // patch, w // patch
    x = x.reshape(b, c, hp, patch, wp, patch)
    return x.transpose(0, 1, 3, 5, 2, 4).reshape(b, c * patch * patch,
                                                 hp, wp)


# ---------------------------------------------------------------------------
# flow-map SDE schedule helpers (sampling.py:300-326)
# ---------------------------------------------------------------------------

def warp_t(raw_t, shift: float):
    return shift * raw_t / (1 + (shift - 1) * raw_t)


def unwarp_t(sigma_t, shift: float):
    return sigma_t / (shift + (1 - shift) * sigma_t)


def calculate_sigmas_dst(sigmas: np.ndarray, h: float = 0.0,
                         eps: float = 1e-6):
    sigmas = np.asarray(sigmas, np.float64)
    src, to = sigmas[:-1], sigmas[1:]
    a_src, a_to = 1 - src, 1 - to
    if h <= 0.0:
        m = np.ones_like(src)
    else:
        m = (to * a_src / np.maximum(src * a_to, eps)) ** (h * h)
    stm = to * m
    dst = stm / np.maximum(a_to + stm, eps)
    return dst, m


# ---------------------------------------------------------------------------
# GM posterior mean + policy rollout (sampling.py:329-455)
# ---------------------------------------------------------------------------

def gm_posterior_mean(sigma_src, sigma_t, x_src, x_t, gm_means, gm_vars,
                      gm_logweights, eps: float = 1e-6):
    """E[x0 | x_t] under the GM fitted at (x_src, sigma_src)
    (sampling.py:329-361).  gm axes: [B, K, C, H, W]."""
    sigma_src = jnp.maximum(sigma_src, eps)
    sigma_t = jnp.maximum(sigma_t, eps)
    aos_src = (1 - sigma_src) / sigma_src
    aos_t = (1 - sigma_t) / sigma_t
    zeta = aos_t ** 2 - aos_src ** 2
    nu = aos_t * x_t / sigma_t - aos_src * x_src / sigma_src
    nu = nu[:, None]                                   # gm axis
    zeta = zeta[:, None]
    denom = jnp.maximum(gm_vars * zeta + 1, eps)
    out_means = (gm_vars * nu + gm_means) / denom
    lw_delta = (gm_means * (nu - 0.5 * zeta * gm_means)).sum(
        axis=2, keepdims=True) / denom
    w = jax.nn.softmax(gm_logweights + lw_delta, axis=1)
    return (out_means * w).sum(axis=1)


def gm_u_to_x0(gm: Dict[str, Any], x_src, sigma_src):
    """Velocity-space GM -> x0-space GM (sampling.py:380-386).
    x_src: [B, C, H, W]; sigma_src: [B]."""
    sig = sigma_src.reshape(-1, 1, 1, 1, 1)
    means_x0 = x_src[:, None] - sig * gm["means"]
    gm_vars = jnp.exp(gm["logstds"] * 2) * (sig ** 2)
    return {"means": means_x0, "gm_vars": gm_vars,
            "logweights": gm["logweights"]}


def gm_temperature(gm_x0: Dict[str, Any], temperature: float,
                   eps: float = 1e-4):
    if temperature >= 1.0:
        return gm_x0
    t = max(temperature, eps)
    return {"means": gm_x0["means"],
            "gm_vars": gm_x0["gm_vars"] * t,
            "logweights": jax.nn.log_softmax(
                gm_x0["logweights"] / t, axis=1)}


def policy_rollout(x_start, sigma_start: float, sigma_end: float,
                   gm_x0: Dict[str, Any], total_substeps: int = 128,
                   shift: float = 3.2, eps: float = 1e-4):
    """Analytic probability-flow rollout between two outer sigmas
    (sampling.py:419-455); substep count resolved on the host so the
    scan length stays static."""
    raw_start = float(unwarp_t(np.float64(sigma_start), shift))
    raw_end = float(unwarp_t(np.float64(sigma_end), shift))
    delta = raw_start - raw_end
    n_sub = max(1, int(round(delta * total_substeps)))
    step = delta / n_sub
    b = x_start.shape[0]
    sig_src = jnp.full((b,), sigma_start, jnp.float32)

    def body(carry, i):
        x_t, raw_t = carry
        sigma_t = warp_t(raw_t, shift)
        st = jnp.full((b,), sigma_t, jnp.float32)[:, None, None, None]
        x0 = gm_posterior_mean(
            sig_src[:, None, None, None], st, x_start, x_t,
            gm_x0["means"], gm_x0["gm_vars"], gm_x0["logweights"])
        u = (x_t - x0) / jnp.maximum(st, eps)
        raw_next = jnp.maximum(raw_t - step, 0.0)
        sigma_next = warp_t(raw_next, shift)
        x_next = x_t + u * (sigma_next - sigma_t)
        return (x_next, raw_next), None

    (x, _), _ = jax.lax.scan(body, (x_start.astype(jnp.float32),
                                    jnp.float32(raw_start)),
                             jnp.arange(n_sub))
    return x


def piflow_sample(forward_gm, img_packed_tokens, timesteps,
                  h_tok: int, w_tok: int, out_channels: int,
                  cfg_scale: float = 1.0, total_substeps: int = 128,
                  gm_temp: Optional[float] = None, key=None,
                  patch: int = 2):
    """Outer pi-Flow loop (sampling.py:654-792).

    forward_gm(img_tokens, step_i) -> (gm_pos, gm_neg|None) token-major
    dicts; timesteps: host list of sigmas (len = steps+1, descending to
    0).  Returns final packed tokens [B, L, C]."""
    ts = np.asarray(timesteps, np.float64)
    sigmas_dst, m_vals = calculate_sigmas_dst(ts, h=0.0)
    nfe = len(ts) - 1
    if gm_temp is None:
        gm_temp = min(max(0.1 * (nfe - 1), 0.0), 1.0)
    key = key if key is not None else jax.random.key(0)
    img = img_packed_tokens
    b = img.shape[0]
    for i in range(nfe):
        gm, gm_neg = forward_gm(img, i)
        if cfg_scale > 1.0 and gm_neg is not None:
            gm = {k: gm_neg[k] + cfg_scale * (gm[k] - gm_neg[k])
                  for k in gm}
        gm = piflow_spatialize(gm, h_tok, w_tok, out_channels, patch)
        x = img.astype(jnp.float32).reshape(
            b, h_tok, w_tok, -1).transpose(0, 3, 1, 2)
        x = unpack_piflux2(x, patch)
        sig_src = jnp.full((b,), float(ts[i]), jnp.float32)
        gm_x0 = gm_u_to_x0(gm, x, sig_src)
        if i != nfe - 1 and gm_temp < 1.0:
            gm_x0 = gm_temperature(gm_x0, gm_temp)
        x = policy_rollout(x, float(ts[i]), float(sigmas_dst[i]), gm_x0,
                           total_substeps=total_substeps)
        sigma_to = float(ts[i + 1])
        m = float(m_vals[i])
        if not math.isclose(m, 1.0):
            key, sub = jax.random.split(key)
            noise = jax.random.normal(sub, x.shape, x.dtype)
            alpha_to = 1 - sigma_to
            x = (alpha_to + sigma_to * m) * x + sigma_to * math.sqrt(
                max(1 - m * m, 0.0)) * noise
        x = pack_piflux2(x, patch)
        img = x.transpose(0, 2, 3, 1).reshape(b, h_tok * w_tok, -1)
    return img


# ---------------------------------------------------------------------------
# checkpoint mapping (pi_flux2_heads safetensors: torch Sequential
# [Identity, Linear, SiLU, Linear] for logstds -> indices 1 / 3)
# ---------------------------------------------------------------------------

def load_piflow_heads(sd: Dict[str, np.ndarray], dtype=jnp.float32
                      ) -> Tuple[Dict[str, Any], List[str]]:
    used = set()

    def lin(prefix):
        used.update((f"{prefix}.weight", f"{prefix}.bias"))
        return {"w": jnp.asarray(np.asarray(sd[f"{prefix}.weight"]).T,
                                 dtype),
                "b": jnp.asarray(np.asarray(sd[f"{prefix}.bias"]),
                                 dtype)}

    heads = {
        "proj_out_means": lin("proj_out_means"),
        "proj_out_logweights": lin("proj_out_logweights"),
        "proj_out_logstds": {"fc1": lin("proj_out_logstds.1"),
                             "fc2": lin("proj_out_logstds.3")},
    }
    return heads, [k for k in sd if k not in used]


def export_piflow_heads(heads: Dict[str, Any]) -> Dict[str, np.ndarray]:
    out = {}

    def put(prefix, p):
        out[f"{prefix}.weight"] = np.asarray(p["w"]).T
        out[f"{prefix}.bias"] = np.asarray(p["b"])

    put("proj_out_means", heads["proj_out_means"])
    put("proj_out_logweights", heads["proj_out_logweights"])
    put("proj_out_logstds.1", heads["proj_out_logstds"]["fc1"])
    put("proj_out_logstds.3", heads["proj_out_logstds"]["fc2"])
    return out
