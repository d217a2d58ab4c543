"""Bisect the hv15 bench crash on the real chip: which op kills the
TPU worker at HV1.5 480p dims (seq = 25*15*26 img + 256 txt = 10006)?

Runs each candidate in order with a small program so the failing one is
unambiguous in the log.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

B, S_IMG, TXT, H, HD = 2, 9750, 256, 16, 128
S = S_IMG + TXT
HID = 2048


def stage(name):
    print(f"[diag] {name} ...", flush=True)


def done(name, t0):
    print(f"[diag] {name} ok ({time.time() - t0:.1f}s)", flush=True)


def main():
    k = jax.random.key(0)

    stage("attention pallas [2,10006,16,128]")
    t0 = time.time()
    from wan2gp_tpu.ops.attention import attention
    q = jax.random.normal(k, (B, S, H, HD), jnp.bfloat16)
    out = attention(q, q, q, backend="pallas")
    assert np.isfinite(float(jnp.sum(out.astype(jnp.float32))))
    done("attention", t0)

    stage("matmul_w4a8 [20012, 2048] x [2048, 6144]")
    t0 = time.time()
    from wan2gp_tpu.ops.quant import (matmul_w4a8, quantize_int4,
                                      set_act_quant)
    set_act_quant("int8")
    w = jax.random.normal(k, (HID, 3 * HID), jnp.float32) * 0.02
    wq, scale = quantize_int4(w)
    x = jax.random.normal(k, (B * S, HID), jnp.bfloat16)
    y = matmul_w4a8(x, wq, scale, k_orig=HID)
    assert np.isfinite(float(jnp.sum(y.astype(jnp.float32))))
    done("matmul_w4a8", t0)

    stage("one hv15 double block (w4a8) at full seq")
    t0 = time.time()
    from wan2gp_tpu.models.hyvideo.dit import (make_hunyuan_config,
                                               init_hunyuan,
                                               hunyuan_forward,
                                               build_hunyuan_rope)
    import bench
    cfg = make_hunyuan_config("hunyuan_1_5_t2v",
                              mm_double_blocks_depth=1, refiner_depth=1)
    params = bench.rand_params_w4_like(
        lambda: init_hunyuan(jax.random.key(0), cfg))
    lat = jnp.zeros((1, cfg.in_channels, 25, 30, 52), jnp.float32)
    txt = jnp.zeros((1, TXT, cfg.text_states_dim), jnp.bfloat16)
    msk = jnp.ones((1, TXT), bool)
    v = hunyuan_forward(params, cfg,
                        jnp.concatenate([lat, lat], 0),
                        jnp.asarray([500.0, 500.0]),
                        jnp.concatenate([txt, txt], 0),
                        jnp.concatenate([msk, msk], 0))
    assert np.isfinite(float(jnp.sum(v.astype(jnp.float32))))
    done("one block forward", t0)

    print("[diag] ALL STAGES PASSED", flush=True)


if __name__ == "__main__":
    main()
