"""PrismAudio video-to-audio tests (reference
postprocessing/prismaudio/): VideoPrism factorized encoder shapes +
invariants, DiT conditioning paths, rf sampling, processor
registration and end-to-end soundtrack on an AVI.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from wan2gp_tpu.postprocessing.videoprism import (
    VideoPrismConfig, init_videoprism, videoprism_encode,
    videoprism_encode_text)
from wan2gp_tpu.postprocessing.prismaudio import (
    PrismDiTConfig, init_prism_dit, prism_dit, prism_sample,
    init_prismaudio, PrismAudioProcessor, _interp_tokens)


def _np(x):
    return np.asarray(x)


@pytest.fixture(scope="module")
def vp():
    cfg = VideoPrismConfig.tiny()
    return init_videoprism(jax.random.PRNGKey(0), cfg), cfg


# -- VideoPrism -------------------------------------------------------------

def test_videoprism_shapes(vp):
    params, cfg = vp
    b, t = 2, 5
    video = jax.random.uniform(
        jax.random.PRNGKey(1),
        (b, t, cfg.image_size, cfg.image_size, 3))
    out = videoprism_encode(params, cfg, video)
    n = cfg.n_patches
    assert out["spatiotemporal"].shape == (b, t * n, cfg.dim)
    assert out["frame_embeddings"].shape == (b, t, cfg.dim)
    assert out["video_embedding"].shape == (b, cfg.dim)
    # contrastive embeddings are l2-normalized
    norms = np.linalg.norm(_np(out["video_embedding"]), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)
    norms_f = np.linalg.norm(_np(out["frame_embeddings"]), axis=-1)
    np.testing.assert_allclose(norms_f, 1.0, atol=1e-4)


def test_videoprism_temporal_sensitivity(vp):
    """Shuffling frames must change the video embedding (the temporal
    stack sees order via its positional embedding)."""
    params, cfg = vp
    video = jax.random.uniform(
        jax.random.PRNGKey(2),
        (1, 4, cfg.image_size, cfg.image_size, 3))
    e1 = videoprism_encode(params, cfg, video)["video_embedding"]
    e2 = videoprism_encode(params, cfg,
                           video[:, ::-1])["video_embedding"]
    assert float(jnp.abs(e1 - e2).max()) > 1e-6


def test_videoprism_text(vp):
    params, cfg = vp
    ids = jnp.asarray([[3, 5, 7, 9]])
    emb = videoprism_encode_text(params, cfg, ids)
    assert emb.shape == (1, cfg.dim)
    np.testing.assert_allclose(np.linalg.norm(_np(emb)), 1.0,
                               atol=1e-4)
    # causal: changing a later token must not change... (class token is
    # last, so any change does affect it; just check different inputs
    # differ)
    emb2 = videoprism_encode_text(params, cfg,
                                  jnp.asarray([[3, 5, 7, 10]]))
    assert float(jnp.abs(emb - emb2).max()) > 1e-6


# -- DiT --------------------------------------------------------------------

@pytest.fixture(scope="module")
def dit():
    cfg = PrismDiTConfig.tiny()
    return init_prism_dit(jax.random.PRNGKey(3), cfg), cfg


def test_dit_shapes_and_conditioning(dit):
    params, cfg = dit
    b, n = 2, 12
    x = jax.random.normal(jax.random.PRNGKey(4),
                          (b, n, cfg.io_channels))
    t = jnp.asarray([0.7, 0.2])
    cross = jax.random.normal(jax.random.PRNGKey(5),
                              (b, 6, cfg.cond_token_dim))
    add = jax.random.normal(jax.random.PRNGKey(6),
                            (b, 4, cfg.add_token_dim))
    sync = jax.random.normal(jax.random.PRNGKey(7),
                             (b, 9, cfg.sync_in_dim))
    v = prism_dit(params, cfg, x, t, cross, add, sync)
    assert v.shape == x.shape and np.isfinite(_np(v)).all()
    # add tokens are gated in at the input: changing them changes v
    v2 = prism_dit(params, cfg, x, t, cross, add * 2.0, sync)
    assert float(jnp.abs(v - v2).max()) > 1e-6
    # works without add/sync
    v3 = prism_dit(params, cfg, x, t, cross)
    assert v3.shape == x.shape


def test_interp_tokens():
    tok = jnp.arange(8, dtype=jnp.float32).reshape(1, 4, 2)
    out = _interp_tokens(tok, 7)
    assert out.shape == (1, 7, 2)
    np.testing.assert_allclose(_np(out[0, 0]), _np(tok[0, 0]))
    np.testing.assert_allclose(_np(out[0, -1]), _np(tok[0, -1]))


def test_sampling_runs(dit):
    params, cfg = dit
    cross = jax.random.normal(jax.random.PRNGKey(8),
                              (1, 5, cfg.cond_token_dim))
    lat = prism_sample(params, cfg, 10, cross, None, None, steps=3,
                       cfg_scale=3.0)
    assert lat.shape == (1, 10, cfg.io_channels)
    assert np.isfinite(_np(lat)).all()


# -- end to end -------------------------------------------------------------

def test_generator_end_to_end():
    gen = init_prismaudio(tiny=True)
    video = np.random.default_rng(0).integers(
        0, 255, (24, 40, 64, 3)).astype(np.uint8)
    out = gen.generate(video, prompt="waves", fps=16, steps=2,
                       cfg_scale=2.0, seed=1)
    dur = 24 / 16
    assert out["sample_rate"] == gen.vae_cfg.sample_rate
    assert out["audio"].shape[0] == int(dur * gen.sample_rate)
    assert out["audio"].shape[1] == 2
    assert np.isfinite(out["audio"]).all()


def test_processor_registered_and_runs(tmp_path):
    import wan2gp_tpu.postprocessing.audio_processors as ap
    ap.reset_registry()
    assert ap.find_processor("prismaudio") is not None
    # end-to-end over a real AVI through apply_soundtrack
    from wan2gp_tpu.utils import media
    frames = np.random.default_rng(1).integers(
        0, 255, (8, 32, 32, 3)).astype(np.uint8)
    vid = str(tmp_path / "clip.avi")
    media.save_video(frames, vid, fps=8)
    gen = init_prismaudio(tiny=True)
    ap.register_audio_processor(PrismAudioProcessor(generator=gen))
    out = ap.apply_soundtrack(vid, "prismaudio", prompt="wind",
                              steps=2)
    audio = media.read_avi_audio(out)
    assert audio is not None
    assert audio[1] == gen.sample_rate
