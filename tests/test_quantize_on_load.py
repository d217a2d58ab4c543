"""Quantize-on-load: the service converts transformer-block linears to
int8/int4 at load (reference do_quantize semantics,
models/wan/any2video.py:191-224 + wgp.py transformer_quantization), and
every DiT's dense path consumes the quantized layout."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wan2gp_tpu.runtime.service import GenerationService, quantize_dit_params


@pytest.fixture()
def tiny_wan_arch(monkeypatch):
    from wan2gp_tpu.families.wan import _ARCH as WAN_ARCH
    import wan2gp_tpu.families.wan as wan_family
    from wan2gp_tpu.models.wan.vae import WanVAEConfig
    # dims >= 256 so the min-size guard admits the block linears
    monkeypatch.setitem(WAN_ARCH, "t2v_1.3B", dict(
        dim=256, ffn_dim=256, num_heads=4, num_layers=2, model_type="t2v",
        vae_stride=(4, 8, 8)))
    monkeypatch.setattr(wan_family, "WanVAEConfig",
                        lambda: WanVAEConfig(dim=8, num_res_blocks=1))
    yield


@pytest.mark.parametrize("mode,key", [("int8", "w_q"), ("int4", "w_q4")])
def test_service_quantizes_blocks_on_load(tiny_wan_arch, tmp_path, mode,
                                          key):
    svc = GenerationService(output_dir=str(tmp_path), attn_backend="xla",
                            init_random_weights=True, quantize=mode)
    pipe = svc.get_pipeline("t2v_1.3B")
    blocks = pipe.dit_params["blocks"]
    assert key in blocks["self_attn"]["q"]
    assert "w" not in blocks["self_attn"]["q"]
    assert key in blocks["ffn"]["fc1"]
    # embeddings stay float
    assert "w" in pipe.dit_params["patch_embedding"]
    assert "w" in pipe.dit_params["head"]["head"]


def test_quantized_service_generates(tiny_wan_arch, tmp_path):
    import os
    rng = np.random.default_rng(0)
    ctx = jnp.asarray(rng.standard_normal((1, 512, 4096)), jnp.float32)
    svc = GenerationService(output_dir=str(tmp_path), attn_backend="xla",
                            init_random_weights=True, quantize="int8")
    outs = svc.generate({
        "model_type": "t2v_1.3B", "resolution": "64x64", "video_length": 5,
        "num_inference_steps": 2, "guidance_scale": 1.0, "seed": 5,
        "_context": ctx})
    assert os.path.exists(outs[0])


def test_int8_denoise_close_to_bf16(tiny_wan_arch, tmp_path):
    """Dequant parity: int8 weights reproduce the bf16 denoise latents to
    quantization tolerance."""
    from wan2gp_tpu.models.wan.pipeline import SamplingConfig

    def build(mode):
        svc = GenerationService(output_dir=str(tmp_path),
                                attn_backend="xla",
                                init_random_weights=True,
                                quantize=mode)
        return svc.get_pipeline("t2v_1.3B")

    rng = np.random.default_rng(1)
    lat = jnp.asarray(rng.standard_normal((1, 16, 2, 8, 8)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 512, 4096)), jnp.float32)
    sampling = SamplingConfig(solver="unipc", steps=2, guide_scale=1.0)

    ref = np.asarray(build("").denoise(lat, ctx, ctx, sampling))
    got = np.asarray(build("int8").denoise(lat, ctx, ctx, sampling))
    rel = np.abs(got - ref).mean() / (np.abs(ref).mean() + 1e-8)
    assert rel < 0.05, rel


def test_quantize_rejects_unknown_mode():
    with pytest.raises(ValueError):
        quantize_dit_params({}, "fp42")


@pytest.mark.parametrize("family,cfgname,initname", [
    ("flux", "FluxConfig", "init_flux"),
])
def test_flux_dense_consumes_w_q4(family, cfgname, initname):
    """Round-3 gap closure: flux previously ignored quantized params."""
    import importlib
    mod = importlib.import_module(f"wan2gp_tpu.models.{family}.dit")
    from wan2gp_tpu.ops.quant import quantize_params_tree
    cfg = getattr(mod, cfgname)(depth=1, depth_single_blocks=1,
                                hidden_size=512, num_heads=4,
                                axes_dim=(32, 48, 48))
    params = getattr(mod, initname)(jax.random.key(0), cfg)
    qp = quantize_params_tree(params,
                              predicate=lambda p: "blocks" in p,
                              bits=4, min_dim=256)
    # find any quantized leaf
    found = []

    def walk(n):
        if isinstance(n, dict):
            if "w_q4" in n:
                found.append(n)
            for v in n.values():
                walk(v)
    walk(qp)
    assert found, "no flux block linear was quantized"
    # block params are scan-stacked [L, ...]; take layer 0 like the scan
    leaf = {k: (v[0] if hasattr(v, "ndim") and v.ndim >= 2 else v)
            for k, v in found[0].items()}
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, leaf["w_q4"].shape[0] * 2)), jnp.float32)
    y = mod._dense(x, leaf)
    assert np.isfinite(np.asarray(y)).all()
