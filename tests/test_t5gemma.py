"""T5Gemma encoder vs the HF T5GemmaEncoderModel oracle (the MagiHuman
text encoder, magi_human_model.py:146)."""
import numpy as np
import jax.numpy as jnp
import torch

from wan2gp_tpu.models.magi.t5gemma import (
    T5GemmaEncConfig, init_t5gemma_encoder, t5gemma_encode,
    load_t5gemma_params)


def _tiny():
    from transformers import T5GemmaConfig, T5GemmaModuleConfig
    mod = T5GemmaModuleConfig(
        vocab_size=64, hidden_size=32, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=2, head_dim=8,
        intermediate_size=48, query_pre_attn_scalar=8,
        sliding_window=3, attn_logit_softcapping=50.0,
        layer_types=["sliding_attention", "full_attention"] * 2,
        dropout_rate=0.0, attention_dropout=0.0)
    hf = T5GemmaConfig(encoder=mod, decoder=mod, is_encoder_decoder=False)
    cfg = T5GemmaEncConfig(vocab_size=64, dim=32, n_layers=4, n_heads=4,
                           n_kv_heads=2, head_dim=8, ffn_dim=48,
                           query_pre_attn_scalar=8.0, sliding_window=3,
                           compute_dtype=jnp.float32)
    return hf, cfg


def test_t5gemma_encoder_matches_hf_oracle():
    from transformers import T5GemmaEncoderModel
    hf_cfg, cfg = _tiny()
    torch.manual_seed(0)
    model = T5GemmaEncoderModel._from_config(hf_cfg).eval()
    model.config._attn_implementation = "eager"
    # non-trivial norm weights (init is zeros = identity-ish)
    with torch.no_grad():
        for n, p in model.named_parameters():
            if "norm" in n:
                p.copy_(torch.rand_like(p) * 0.2 - 0.1)

    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params, leftover = load_t5gemma_params(sd, cfg, jnp.float32)
    assert leftover == [], leftover[:6]

    rng = np.random.default_rng(0)
    ids = rng.integers(1, 64, (2, 9))
    mask = np.ones((2, 9), np.int64)
    mask[1, 6:] = 0
    ids[1, 6:] = 0

    got = np.asarray(t5gemma_encode(params, cfg, jnp.asarray(ids),
                                    jnp.asarray(mask)))
    with torch.no_grad():
        ref = model(input_ids=torch.tensor(ids),
                    attention_mask=torch.tensor(mask)
                    ).last_hidden_state.numpy()
    # padded rows are ignored downstream — compare valid tokens
    np.testing.assert_allclose(got[0], ref[0], rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(got[1, :6], ref[1, :6], rtol=2e-4,
                               atol=2e-4)


def test_t5gemma_sliding_differs_from_full():
    """The sliding-window mask must actually bind (window 3 < seq 9)."""
    _, cfg = _tiny()
    import jax
    params = init_t5gemma_encoder(jax.random.key(0), cfg, jnp.float32)
    ids = jnp.asarray(np.arange(9)[None] % 60 + 1)
    mask = jnp.ones((1, 9), jnp.int32)
    a = t5gemma_encode(params, cfg, ids, mask)
    wide = dataclass_replace(cfg, sliding_window=64)
    b = t5gemma_encode(params, wide, ids, mask)
    assert not np.allclose(np.asarray(a), np.asarray(b))


def dataclass_replace(cfg, **kw):
    import dataclasses
    return dataclasses.replace(cfg, **kw)
