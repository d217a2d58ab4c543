"""w2v-BERT 2.0 encoder tests — direct numerical oracle against the
HF Wav2Vec2BertModel (the exact model the reference loads,
infer_v2.py:178-186)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from wan2gp_tpu.models.tts.w2v_bert import (
    W2VBertConfig, init_w2v_bert, w2v_bert_encode, stack_fbanks,
    load_w2v_bert_params)

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def hf_pair():
    from transformers import Wav2Vec2BertConfig, Wav2Vec2BertModel
    cfg = W2VBertConfig.tiny()
    hf_cfg = Wav2Vec2BertConfig(
        hidden_size=cfg.hidden, num_hidden_layers=cfg.layers,
        num_attention_heads=cfg.heads,
        intermediate_size=cfg.intermediate,
        feature_projection_input_dim=cfg.input_dim,
        conv_depthwise_kernel_size=cfg.dw_kernel,
        left_max_position_embeddings=cfg.left_max,
        right_max_position_embeddings=cfg.right_max,
        position_embeddings_type="relative_key",
        hidden_dropout=0.0, attention_dropout=0.0,
        activation_dropout=0.0, conformer_conv_dropout=0.0,
        feat_proj_dropout=0.0, final_dropout=0.0,
        layerdrop=0.0, add_adapter=False)
    torch.manual_seed(0)
    model = Wav2Vec2BertModel(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params, leftover = load_w2v_bert_params(sd, cfg,
                                            dtype=jnp.float32)
    return model, params, cfg, leftover


def test_loader_consumes_everything(hf_pair):
    _model, _params, _cfg, leftover = hf_pair
    # only the SpecAugment embedding (training-only) may remain
    assert all("masked_spec_embed" in k or "intermediate_ffn" in k
               for k in leftover), leftover


def test_matches_hf_forward(hf_pair):
    model, params, cfg, _ = hf_pair
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((2, 12, cfg.input_dim)) \
        .astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(feats)).last_hidden_state.numpy()
    ours = w2v_bert_encode(params, cfg, jnp.asarray(feats))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4,
                               rtol=1e-3)


def test_stack_fbanks():
    mels = jnp.arange(2 * 6 * 4, dtype=jnp.float32).reshape(2, 6, 4)
    st = stack_fbanks(mels)
    assert st.shape == (2, 3, 8)
    np.testing.assert_allclose(np.asarray(st[0, 0, :4]),
                               np.asarray(mels[0, 0]))
    np.testing.assert_allclose(np.asarray(st[0, 0, 4:]),
                               np.asarray(mels[0, 1]))


def test_random_init_shapes():
    cfg = W2VBertConfig.tiny()
    p = init_w2v_bert(jax.random.PRNGKey(0), cfg)
    out = w2v_bert_encode(p, cfg, jnp.zeros((1, 7, cfg.input_dim)))
    assert out.shape == (1, 7, cfg.hidden)
    assert np.isfinite(np.asarray(out)).all()
