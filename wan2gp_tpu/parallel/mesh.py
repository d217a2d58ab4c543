"""Device mesh construction.

The framework's parallelism replaces the reference's CPU<->VRAM paging (mmgp)
and its dormant vendored TP/SP/CP code (SURVEY.md §2.7) with a single
`jax.sharding.Mesh` over axes:

  dp — data parallel: independent samples / CFG branches / sliding windows
  cp — context parallel: sequence (token) dimension of the DiT
  tp — tensor parallel: attention heads + FFN hidden dim

Weights are HBM-resident, sharded over tp; activations shard over dp/cp.
XLA inserts the collectives (all-gather for K/V under cp, psum for row-
parallel matmuls under tp) from the NamedSharding annotations.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh

AXES = ("dp", "cp", "tp")


def default_axis_sizes(n_devices: int, num_heads: int = 12) -> Dict[str, int]:
    """Factor n_devices into (dp, cp, tp) heuristically.

    tp gets the largest power-of-two factor that divides num_heads (<= 8),
    cp the next factor of 2, dp the remainder.
    """
    n = n_devices
    tp = 1
    while tp * 2 <= min(8, n) and n % (tp * 2) == 0 and num_heads % (tp * 2) == 0:
        tp *= 2
    n //= tp
    cp = 1
    while cp * 2 <= n and n % (cp * 2) == 0:
        cp *= 2
    dp = n // cp
    return {"dp": dp, "cp": cp, "tp": tp}


def parse_mesh_spec(spec: str) -> Dict[str, int]:
    """Parse a CLI/server-config mesh spec: "dp=2,cp=2,tp=2" (axes may be
    omitted; omitted axes default to 1).  "auto" -> {} (factor all
    visible devices heuristically)."""
    spec = (spec or "").strip().lower()
    if spec in ("", "auto"):
        return {}
    sizes: Dict[str, int] = {}
    for part in spec.split(","):
        name, _, val = part.partition("=")
        name = name.strip()
        if name not in AXES:
            raise ValueError(f"unknown mesh axis {name!r} (use dp/cp/tp)")
        sizes[name] = int(val)
    return sizes


def make_mesh(axis_sizes: Optional[Dict[str, int]] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if axis_sizes is None:
        axis_sizes = default_axis_sizes(len(devices))
    sizes = [axis_sizes.get(a, 1) for a in AXES]
    assert int(np.prod(sizes)) == len(devices), (sizes, len(devices))
    arr = np.asarray(devices).reshape(sizes)
    return Mesh(arr, AXES)
