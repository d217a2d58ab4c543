"""Parity vs goldens executed by the REFERENCE'S OWN code.

tests/goldens/*_ref_*.npz / wan_block_ref.npz were produced by
tests/goldens/generate_from_reference.py, which imports the actual
modules under /root/reference (shared/utils/fm_solvers_unipc.py,
fm_solvers.py, basic_flowmatch.py, models/wan/modules/model.py) behind
minimal diffusers/mmgp shims — unlike generate.py's re-derived oracles,
a transcription error cannot self-confirm here."""
import numpy as np
import jax.numpy as jnp

from tests.test_goldens import _load


def _velocity(x, t):
    """Same deterministic fake velocity as the reference-side generator."""
    return 0.3 * x * np.float32(np.cos(float(t) / 250.0)) - 0.1


def _run_solver(name, n, shift, x0, timesteps, **kw):
    from wan2gp_tpu.schedulers import make_schedule
    from wan2gp_tpu.schedulers.base import solver_step, init_solver_state
    sched = make_schedule(name, n, shift=shift, **kw)
    np.testing.assert_allclose(np.asarray(sched.timesteps, np.float64),
                               np.asarray(timesteps, np.float64),
                               rtol=0, atol=1e-4)
    x = jnp.asarray(x0, jnp.float32)
    state = init_solver_state(sched, x)
    traj = []
    for i in range(n):
        ci = {k: v[i] for k, v in sched.coeffs.items()}
        v = jnp.asarray(_velocity(np.asarray(x), sched.timesteps[i]))
        x, state = solver_step(sched, i, ci, v, x, state)
        traj.append(np.asarray(x))
    return sched, np.stack(traj)


def test_ref_unipc_orders():
    g = _load("unipc_ref_trace.npz")
    for order in (2, 3):
        sched, traj = _run_solver("unipc", 8, 5.0, g["x0"],
                                  g[f"timesteps_o{order}"],
                                  solver_order=order)
        # the reference keeps a trailing sigma row; compare the N steps
        np.testing.assert_allclose(
            np.asarray(sched.sigmas, np.float64),
            g[f"sigmas_o{order}"][:len(np.asarray(sched.sigmas))],
            rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(traj, g[f"traj_o{order}"],
                                   rtol=5e-4, atol=5e-4)


def test_ref_dpm():
    g = _load("dpm_ref_trace.npz")
    _, traj = _run_solver("dpm++", 8, 5.0, g["x0"], g["timesteps"],
                          solver_order=2)
    np.testing.assert_allclose(traj, g["traj"], rtol=5e-4, atol=5e-4)


def test_ref_causvid_flowmatch():
    g = _load("flowmatch_ref_trace.npz")
    _, traj = _run_solver("causvid", 9, 8.0, g["x0"], g["timesteps"])
    np.testing.assert_allclose(traj, g["traj"], rtol=5e-4, atol=5e-4)


def test_ref_wan_block():
    from wan2gp_tpu.models.wan.dit import _block, WanDiTConfig
    from wan2gp_tpu.ops.rope import build_rope_3d
    g = _load("wan_block_ref.npz")
    dim, n_heads, ffn_dim = (int(v) for v in g["dims"])
    f, h, w = (int(v) for v in g["grid"])
    cfg = WanDiTConfig(dim=dim, ffn_dim=ffn_dim, num_heads=n_heads,
                       num_layers=1, compute_dtype=jnp.float32)

    def lin(prefix):
        return {"w": jnp.asarray(g[prefix + "__weight"].T),
                "b": jnp.asarray(g[prefix + "__bias"])}

    def attn(prefix):
        return {"q": lin(prefix + "__q"), "k": lin(prefix + "__k"),
                "v": lin(prefix + "__v"), "o": lin(prefix + "__o"),
                "norm_q": jnp.asarray(g[prefix + "__norm_q__weight"]),
                "norm_k": jnp.asarray(g[prefix + "__norm_k__weight"])}

    bp = {
        "self_attn": attn("self_attn"),
        "cross_attn": attn("cross_attn"),
        "norm3": {"w": jnp.asarray(g["norm3__weight"]),
                  "b": jnp.asarray(g["norm3__bias"])},
        "ffn": {"fc1": lin("ffn__0"), "fc2": lin("ffn__2")},
        "modulation": jnp.asarray(g["modulation__weight"][0]),
    }
    cos, sin = build_rope_3d((f, h, w), head_dim=dim // n_heads)
    # the reference block receives e [B, 6, C]; ours takes [B, T, 6, C]
    e6 = jnp.asarray(g["e"])[:, None]
    out = _block(bp, jnp.asarray(g["x"]), e6, jnp.asarray(g["ctx"]),
                 None, cos, sin, cfg, attn_backend="xla")
    np.testing.assert_allclose(np.asarray(out), g["out"],
                               rtol=5e-4, atol=5e-4)
