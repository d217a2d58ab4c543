"""Depth Anything V3 tests (reference
preprocessing/depth_anything_v3/: DualDPT dual fusion chains, exp
activations, video annotator contract)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from wan2gp_tpu.preprocessing.depth_anything_v3 import (
    DAv3Config, init_dav3, dav3_forward, DepthV3VideoAnnotator)


@pytest.fixture(scope="module")
def setup():
    cfg = DAv3Config.tiny()
    return init_dav3(jax.random.PRNGKey(0), cfg), cfg


def test_dual_head_outputs(setup):
    params, cfg = setup
    ps = cfg.enc.patch_size
    img = jnp.asarray(np.random.default_rng(0).uniform(
        0, 1, (2, 2 * ps, 3 * ps, 3)), jnp.float32)
    out = dav3_forward(params, cfg, img)
    assert out["depth"].shape == (2, 2 * ps, 3 * ps)
    assert out["conf"].shape == (2, 2 * ps, 3 * ps)
    assert out["ray"].shape == (2, 2 * ps, 3 * ps, cfg.aux_channels)
    # exp activation -> strictly positive depth; expp1 conf > 1
    assert float(out["depth"].min()) > 0
    assert float(out["conf"].min()) > 1.0
    assert np.isfinite(np.asarray(out["ray"])).all()


def test_heads_are_independent(setup):
    """Perturbing the aux chain must not change the main depth."""
    params, cfg = setup
    ps = cfg.enc.patch_size
    img = jnp.ones((1, ps, ps, 3)) * 0.5
    d1 = dav3_forward(params, cfg, img)["depth"]
    import copy
    p2 = dict(params)
    p2["aux"] = jax.tree.map(lambda a: a * 1.5, params["aux"])
    out2 = dav3_forward(p2, cfg, img)
    np.testing.assert_allclose(np.asarray(out2["depth"]),
                               np.asarray(d1), atol=1e-6)
    assert float(jnp.abs(out2["ray"]
                         - dav3_forward(params, cfg,
                                        img)["ray"]).max()) > 0


def test_video_annotator_contract(setup):
    params, cfg = setup
    ann = DepthV3VideoAnnotator(params, cfg, chunk_size=2)
    frames = [np.random.default_rng(i).integers(
        0, 255, (20, 30, 3)).astype(np.uint8) for i in range(5)]
    out = ann.forward(frames)
    assert len(out) == 5
    for f in out:
        assert f.shape == (20, 30, 3) and f.dtype == np.uint8
    # disparity is min-max normalized across the whole clip
    allv = np.stack(out)
    assert allv.min() == 0 and allv.max() >= 250


def test_registered_preprocessor():
    from wan2gp_tpu.preprocessing.filters import (
        make_depth_v3_preprocessor, PREPROCESSORS)
    fn = make_depth_v3_preprocessor(tiny=True, chunk_size=2)
    assert PREPROCESSORS["depth_v3"] is fn
    vid = np.random.default_rng(1).integers(
        0, 255, (3, 16, 16, 3)).astype(np.uint8)
    out = fn(vid)
    assert out.shape == (3, 16, 16, 3) and out.dtype == np.uint8
