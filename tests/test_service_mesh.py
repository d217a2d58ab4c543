"""Production multi-chip path: GenerationService(mesh=...) shards the Wan
DiT over the 8-device virtual mesh and produces the same video as the
single-device service (same seed/settings) — the shipped L0-replacement
story (SURVEY §2.7 P1-P10; VERDICT r2 item 2)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wan2gp_tpu.runtime.service import GenerationService
from wan2gp_tpu.utils import media

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


@pytest.fixture()
def tiny_wan_arch(monkeypatch):
    from wan2gp_tpu.families.wan import _ARCH as WAN_ARCH
    import wan2gp_tpu.families.wan as wan_family
    from wan2gp_tpu.models.wan.vae import WanVAEConfig
    monkeypatch.setitem(WAN_ARCH, "t2v_1.3B", dict(
        dim=64, ffn_dim=128, num_heads=4, num_layers=2, model_type="t2v",
        vae_stride=(4, 8, 8)))
    monkeypatch.setattr(wan_family, "WanVAEConfig",
                        lambda: WanVAEConfig(dim=8, num_res_blocks=1))
    yield


SETTINGS = {
    "model_type": "t2v_1.3B", "resolution": "64x64", "video_length": 5,
    "num_inference_steps": 2, "guidance_scale": 3.0, "seed": 11,
}


def _run(tmp_path, sub, mesh):
    rng = np.random.default_rng(0)
    ctx = jnp.asarray(rng.standard_normal((1, 512, 4096)), jnp.float32)
    ctxn = jnp.asarray(rng.standard_normal((1, 512, 4096)), jnp.float32)
    svc = GenerationService(output_dir=str(tmp_path / sub),
                            attn_backend="xla", init_random_weights=True,
                            mesh=mesh)
    outs = svc.generate(dict(SETTINGS, _context=ctx, _context_null=ctxn))
    return media.read_mjpeg_avi(outs[0])


def test_mesh_parse_spec():
    from wan2gp_tpu.parallel import parse_mesh_spec
    assert parse_mesh_spec("dp=2,cp=2,tp=2") == {"dp": 2, "cp": 2, "tp": 2}
    assert parse_mesh_spec("tp=4") == {"tp": 4}
    assert parse_mesh_spec("auto") == {}
    with pytest.raises(ValueError):
        parse_mesh_spec("pp=2")


def test_service_mesh_matches_single_device(tiny_wan_arch, tmp_path):
    ref = _run(tmp_path, "single", None)
    got = _run(tmp_path, "mesh", "dp=2,cp=2,tp=2")
    assert got.shape == ref.shape
    # MJPEG quantization of near-noise frames amplifies tiny fp
    # resharding roundoff; require close agreement + high correlation
    diff = np.abs(got.astype(np.int32) - ref.astype(np.int32))
    assert diff.mean() < 3.0, diff.mean()
    corr = np.corrcoef(got.ravel(), ref.ravel())[0, 1]
    assert corr > 0.99, corr


def test_pipeline_mesh_latents_match_single_device(tiny_wan_arch, tmp_path):
    """Latent-level equality (pre-VAE/MJPEG): sharded denoise matches the
    single-device scan to fp tolerance."""
    from wan2gp_tpu.parallel import make_mesh
    from wan2gp_tpu.models.wan.pipeline import SamplingConfig

    def build():
        svc = GenerationService(output_dir=str(tmp_path),
                                attn_backend="xla",
                                init_random_weights=True)
        return svc.get_pipeline("t2v_1.3B")

    rng = np.random.default_rng(2)
    lat = jnp.asarray(rng.standard_normal((1, 16, 2, 8, 8)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 512, 4096)), jnp.float32)
    ctxn = jnp.asarray(rng.standard_normal((1, 512, 4096)), jnp.float32)
    sampling = SamplingConfig(solver="unipc", steps=2, guide_scale=3.0)

    pipe = build()
    ref = np.asarray(pipe.denoise(lat, ctx, ctxn, sampling))
    pipe2 = build()
    pipe2.apply_mesh(make_mesh({"dp": 2, "cp": 2, "tp": 2},
                               devices=jax.devices()[:8]))
    got = np.asarray(pipe2.denoise(lat, ctx, ctxn, sampling))
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_service_mesh_params_actually_sharded(tiny_wan_arch, tmp_path):
    svc = GenerationService(output_dir=str(tmp_path),
                            attn_backend="xla", init_random_weights=True,
                            mesh={"dp": 2, "cp": 2, "tp": 2})
    pipe = svc.get_pipeline("t2v_1.3B")
    assert pipe.mesh is not None
    w = pipe.dit_params["blocks"]["self_attn"]["q"]["w"]
    # column-parallel over tp: the addressable shard is half the columns
    assert w.sharding.shard_shape(w.shape)[-1] == w.shape[-1] // 2
