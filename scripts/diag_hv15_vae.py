"""Diagnose the hv15 tiled VAE decode OOM on the real chip.

Runs the decoder ALONE (no DiT resident) at the bench dims
(832x480x97f -> latents 25x30x52) and prints HBM stats around each
tile size, so we can tell whether the decode itself exceeds the chip
or the bench's DiT free is not taking effect.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from wan2gp_tpu.models.hyvideo.vae15 import (Hunyuan15VAEConfig,
                                             init_hunyuan15_vae,
                                             hunyuan15_vae_decode_tiled)


def hbm(tag):
    try:
        s = jax.devices()[0].memory_stats()
        print(f"[hbm] {tag}: in_use={s.get('bytes_in_use', 0)/2**30:.2f}G "
              f"peak={s.get('peak_bytes_in_use', 0)/2**30:.2f}G "
              f"limit={s.get('bytes_limit', 0)/2**30:.2f}G", flush=True)
    except Exception as exc:  # noqa: BLE001
        print(f"[hbm] {tag}: stats unavailable ({exc!r})", flush=True)


def main():
    cfg = Hunyuan15VAEConfig()
    print(f"[diag] vae cfg: ch={cfg.block_out_channels} "
          f"latent={cfg.latent_channels}", flush=True)
    hbm("start")
    p = init_hunyuan15_vae(jax.random.key(1), cfg)
    # DIAG_DTYPE=bf16 halves params (4.7 -> 2.35 GiB) and activations
    if os.environ.get("DIAG_DTYPE") == "bf16":
        p = jax.tree.map(lambda x: x.astype(jnp.bfloat16), p)
    n = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(p))
    print(f"[diag] vae params {n/2**30:.2f} GiB", flush=True)
    z = jnp.zeros((1, cfg.latent_channels, 25, 30, 52),
                  jnp.bfloat16 if os.environ.get("DIAG_DTYPE") == "bf16"
                  else jnp.float32)
    hbm("params+latents")
    # DIAG_TILES: one tile per fresh process isolates allocator
    # fragmentation left by a previous failed attempt (observed r05:
    # a 192 OOM poisons later 128/96 attempts in the same process)
    tiles = tuple(int(t) for t in
                  os.environ.get("DIAG_TILES", "192,128,96").split(","))
    for tile in tiles:
        try:
            t0 = time.perf_counter()
            out = hunyuan15_vae_decode_tiled(p, cfg, z, tile_size=tile)
            val = float(jnp.sum(out))
            dt = time.perf_counter() - t0
            del out
            assert np.isfinite(val)
            hbm(f"tile={tile} ok")
            print(f"[diag] tile={tile}: OK {dt:.1f}s "
                  f"({97/dt:.2f} fps cold)", flush=True)
            # warm timing
            t0 = time.perf_counter()
            val = float(jnp.sum(hunyuan15_vae_decode_tiled(
                p, cfg, z, tile_size=tile)))
            dt = time.perf_counter() - t0
            print(f"[diag] tile={tile}: warm {dt:.1f}s ({97/dt:.2f} fps)",
                  flush=True)
            break
        except Exception as exc:  # noqa: BLE001
            hbm(f"tile={tile} FAILED")
            print(f"[diag] tile={tile}: {exc!r}", flush=True)
            jax.clear_caches()


if __name__ == "__main__":
    main()
