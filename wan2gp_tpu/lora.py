"""LoRA subsystem: format conversion, weight merging, multiplier DSL.

Reference behaviors reimplemented:
  - key-format normalization (diffusers lora_A/lora_B, comfy lora_unet_*
    fused names, ".default." infix) — models/wan/modules/model.py:931-1012
    preprocess_loras
  - multiplier DSL: per-phase ';', per-step ramp ',' — expanded to a
    [num_steps] schedule per lora (shared/utils/loras_mutipliers.py:47
    parse_loras_multipliers + expand_slist)
  - merge into weights: W' = W + mult * (alpha/r) * (up @ down)
    (mmgp load_loras_into_model semantics)

TPU design: multiplier schedules are host-static; piecewise-constant
schedules re-merge weights between scan segments instead of paying per-step
LoRA matmuls inside the compiled loop.
"""
from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Key-format normalization
# ---------------------------------------------------------------------------

_COMFY_TOP = [
    ("lora_unet__head_head", "head.head"),
    ("lora_unet_head_head", "head.head"),
    ("lora_unet__img_emb_proj_", "img_emb.proj."),
    ("lora_unet_img_emb_proj_", "img_emb.proj."),
    ("lora_unet__text_embedding_", "text_embedding."),
    ("lora_unet_text_embedding_", "text_embedding."),
    ("lora_unet__time_embedding_", "time_embedding."),
    ("lora_unet_time_embedding_", "time_embedding."),
    ("lora_unet__time_projection_", "time_projection."),
    ("lora_unet_time_projection_", "time_projection."),
]


def _normalize_key(k: str) -> str:
    for prefix in ("diffusion_model.", "transformer."):
        if k.startswith(prefix):
            k = k[len(prefix):]
    k = k.replace(".default.", ".")
    if k.startswith("lora_unet_"):
        k = k.replace("lora_unet_blocks_", "blocks.")
        k = k.replace("lora_unet__blocks_", "blocks.")
        for src, tgt in _COMFY_TOP:
            k = k.replace(src, tgt)
        for mod in ("cross_attn", "self_attn", "ffn"):
            k = k.replace(f"_{mod}_", f".{mod}.")
        k = k.replace("lora_up", "lora_B").replace("lora_down", "lora_A")
        # comfy uses '_' before lora suffix: "...q.lora_A.weight" stays
        k = re.sub(r"\.(lora_[AB])\.", r".\1.", k)
    k = k.replace(".lora_up.", ".lora_B.").replace(".lora_down.", ".lora_A.")
    return k


def convert_lora_sd(sd: Dict[str, np.ndarray]) -> Dict[str, Dict[str, Any]]:
    """Normalize a LoRA state dict to {module_path: {A, B, alpha}}.

    A: [r, in] (down), B: [out, r] (up) — torch layouts kept; merging
    transposes as needed.  Keys ending in 'modulation.diff' are dropped
    (reference preprocess_loras, model.py:941-946)."""
    out: Dict[str, Dict[str, Any]] = {}
    for k, v in sd.items():
        k = _normalize_key(k)
        if k.endswith("modulation.diff") or k.endswith(".diff") \
                or k.endswith(".diff_b"):
            continue
        m = re.match(r"(.+)\.(lora_A|lora_B)\.weight$", k)
        if m:
            out.setdefault(m.group(1), {})[m.group(2)[-1]] = np.asarray(v)
            continue
        m = re.match(r"(.+)\.alpha$", k)
        if m:
            out.setdefault(m.group(1), {})["alpha"] = float(np.asarray(v))
    return {p: d for p, d in out.items() if "A" in d and "B" in d}


# ---------------------------------------------------------------------------
# Merging
# ---------------------------------------------------------------------------

_BLOCK_RE = re.compile(r"^blocks\.(\d+)\.(.+)$")


def _tree_target(params, parts: List[str]):
    """Walk my param tree by reference module path parts; returns
    (container, leaf_key) or None."""
    node = params
    # module-name translation: ffn.0 -> ffn.fc1, ffn.2 -> ffn.fc2
    mapped = []
    i = 0
    while i < len(parts):
        p = parts[i]
        if p == "ffn" and i + 1 < len(parts) and parts[i + 1] in ("0", "2"):
            mapped.extend(["ffn", "fc1" if parts[i + 1] == "0" else "fc2"])
            i += 2
            continue
        mapped.append(p)
        i += 1
    for p in mapped:
        if not isinstance(node, dict) or p not in node:
            return None
        node = node[p]
    if isinstance(node, dict) and "w" in node:
        return node
    return None


def merge_lora(params, lora: Dict[str, Dict[str, Any]], multiplier: float = 1.0):
    """Return params with LoRA deltas merged (functional update).

    Handles per-block paths against the stacked [L, in, out] kernels."""
    updates: Dict[int, Any] = {}
    params = jax.tree.map(lambda x: x, params)  # shallow copy of containers

    def delta(d):
        A = np.asarray(d["A"], np.float32)      # [r, in]
        B = np.asarray(d["B"], np.float32)      # [out, r]
        r = A.shape[0]
        alpha = d.get("alpha", r)
        return (alpha / r) * (A.T @ B.T)        # [in, out]

    unmatched = []
    for path, d in lora.items():
        m = _BLOCK_RE.match(path)
        if m:
            layer = int(m.group(1))
            target = _tree_target(params["blocks"], m.group(2).split("."))
            if target is None:
                unmatched.append(path)
                continue
            w = target["w"]
            upd = multiplier * delta(d)
            target["w"] = w.at[layer].set(
                (w[layer].astype(jnp.float32) + upd).astype(w.dtype))
        else:
            target = _tree_target(params, path.split("."))
            if target is None:
                unmatched.append(path)
                continue
            w = target["w"]
            target["w"] = (w.astype(jnp.float32)
                           + multiplier * delta(d)).astype(w.dtype)
    return params, unmatched


def merge_loras(params, loras: Sequence[Dict[str, Dict[str, Any]]],
                multipliers: Sequence[float]):
    unmatched_all = []
    for lora, mult in zip(loras, multipliers):
        if mult == 0:
            continue
        params, unmatched = merge_lora(params, lora, mult)
        unmatched_all.extend(unmatched)
    return params, unmatched_all


# ---------------------------------------------------------------------------
# Multiplier DSL
# ---------------------------------------------------------------------------

def _expand_ramp(values: List[float], steps: int) -> List[float]:
    """Nearest expansion of a ramp list onto `steps` steps
    (loras_mutipliers.py:15 expand_one)."""
    if steps <= 0:
        return []
    out = []
    inc = len(values) / steps
    pos = 0.0
    for _ in range(steps):
        out.append(values[int(pos)])
        pos += inc
    return out


def parse_lora_multipliers(spec, nb_loras: int, num_steps: int,
                           phase_steps: Optional[Sequence[int]] = None
                           ) -> np.ndarray:
    """Parse the multiplier DSL into a [nb_loras, num_steps] schedule.

    spec: string like "1.2 0.9;0.5 1,0.8,0.5" (space-separated per lora;
    ';' separates guidance phases, ',' builds a per-step ramp) or a list.
    phase_steps: cumulative step indices where phases end (default: one
    phase covering all steps)."""
    if isinstance(spec, str):
        lines = [ln.strip() for ln in spec.replace("\r", "").split("\n")
                 if ln.strip() and not ln.strip().startswith("#")]
        items = " ".join(lines).replace("|", " ").split()
    else:
        items = list(spec)
    items = items[:nb_loras]
    while len(items) < nb_loras:
        items.append("1.0")

    if phase_steps is None:
        phase_steps = [num_steps]
    bounds = [0] + list(phase_steps)
    if bounds[-1] != num_steps:
        bounds.append(num_steps)

    out = np.ones((nb_loras, num_steps), np.float32)
    for i, item in enumerate(items):
        if not isinstance(item, str):
            out[i, :] = float(item)
            continue
        phases = item.split(";")
        if len(phases) == 1:
            ramp = [float(v) for v in phases[0].split(",")]
            out[i, :] = _expand_ramp(ramp, num_steps)
        else:
            n_phase = len(bounds) - 1
            if len(phases) < n_phase:
                phases = phases + [phases[-1]] * (n_phase - len(phases))
            for p in range(n_phase):
                seg = bounds[p + 1] - bounds[p]
                ramp = [float(v) for v in phases[p].split(",")]
                out[i, bounds[p]:bounds[p + 1]] = _expand_ramp(ramp, seg)
    return out


def multiplier_segments(schedule: np.ndarray) -> List[Tuple[int, int, np.ndarray]]:
    """Split a [nb_loras, N] schedule into maximal constant segments:
    [(start, end, mults[nb_loras])].  Piecewise-constant schedules re-merge
    weights between compiled scan segments."""
    n = schedule.shape[1]
    segments = []
    start = 0
    for i in range(1, n + 1):
        if i == n or not np.array_equal(schedule[:, i], schedule[:, start]):
            segments.append((start, i, schedule[:, start].copy()))
            start = i
    return segments


def extract_lora(sd_finetuned: Dict[str, np.ndarray],
                 sd_base: Dict[str, np.ndarray], rank: int = 128,
                 threshold: float = 1e-6) -> Dict[str, np.ndarray]:
    """Extract a LoRA from the weight delta of two checkpoints
    (reference shared/extract_lora.py LoRAExtractor:13-294).

    For every 2D weight present in both state dicts: SVD of
    (finetuned - base); lora_up = U[:, :r] * S[:r] ([out, r]),
    lora_down = Vt[:r] ([r, in]).  Bias deltas become `.diff_b`, non-2D
    weight deltas `.diff` (extract_lora.py:192-214).  Keys carry the
    reference's `diffusion_model.` prefix so the result round-trips
    through convert_lora_sd/merge_lora."""
    out: Dict[str, np.ndarray] = {}
    for name, ft in sd_finetuned.items():
        if name not in sd_base:
            continue
        ft = np.asarray(ft, np.float32)
        base = np.asarray(sd_base[name], np.float32)
        if ft.shape != base.shape:
            continue
        delta = ft - base
        if not np.abs(delta).max() > 0:
            continue
        stem = name
        is_bias = stem.endswith(".bias")
        if stem.endswith((".weight", ".bias")):
            stem = stem.rsplit(".", 1)[0]
        key = f"diffusion_model.{stem}"
        if is_bias:
            out[f"{key}.diff_b"] = delta
        elif delta.ndim == 2:
            u, s, vt = np.linalg.svd(delta, full_matrices=False)
            r = min(rank, int((s > threshold).sum()) or 1, s.shape[0])
            out[f"{key}.lora_up.weight"] = u[:, :r] * s[None, :r]
            out[f"{key}.lora_down.weight"] = vt[:r]
        else:
            out[f"{key}.diff"] = delta
    return out
