"""Prompt enhancer tests (tiny LM + hash tokenizer)."""
import numpy as np
import jax
import jax.numpy as jnp

from wan2gp_tpu.models.qwen.text_encoder import QwenLMConfig, init_qwen_lm
from wan2gp_tpu.prompt_enhancer import (PromptEnhancer, T2V_SYSTEM_PROMPT,
                                        T2I_SYSTEM_PROMPT)
from wan2gp_tpu.utils.tokenizer import HashTokenizer

TINY = QwenLMConfig(vocab_size=100, dim=32, n_layers=2, n_heads=4,
                    n_kv_heads=2, head_dim=8, ffn_dim=64, qkv_bias=False,
                    qk_norm=True, compute_dtype=jnp.float32)


def test_enhance_runs_and_is_deterministic():
    params = init_qwen_lm(jax.random.key(0), TINY)
    enh = PromptEnhancer(params, TINY, HashTokenizer(100),
                         max_prompt_tokens=16, max_new_tokens=5)
    out1 = enh.enhance(["a cat by the sea"])
    out2 = enh.enhance(["a cat by the sea"])
    assert out1 == out2 and len(out1) == 1 and out1[0]
    # image mode uses the other system prompt -> different context
    out3 = enh.enhance(["a cat by the sea"], is_image=True)
    assert isinstance(out3[0], str)


def test_system_prompts_distinct():
    assert "video" in T2V_SYSTEM_PROMPT
    assert "image" in T2I_SYSTEM_PROMPT
    assert T2V_SYSTEM_PROMPT != T2I_SYSTEM_PROMPT
