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


def test_vl_enhance_with_image_prefix():
    """The vision-feature prefix must flow through generation (different
    images -> different continuations with a random tiny LM + tower)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from wan2gp_tpu.prompt_enhancer import PromptEnhancer
    from wan2gp_tpu.models.qwen.text_encoder import (QwenLMConfig,
                                                     init_qwen_lm)
    from wan2gp_tpu.models.qwen.vision import (QwenVisionConfig,
                                               init_qwen_vision)

    cfg = QwenLMConfig(vocab_size=64, dim=24, n_layers=2, n_heads=2,
                       n_kv_heads=1, head_dim=12, ffn_dim=48,
                       qkv_bias=False, qk_norm=True,
                       compute_dtype=jnp.float32)
    params = init_qwen_lm(jax.random.key(0), cfg)
    vcfg = QwenVisionConfig(patch_size=4, temporal_patch_size=2,
                            hidden_size=16, depth=2, num_heads=2,
                            intermediate_size=32, out_hidden_size=24,
                            spatial_merge_size=2, window_size=16,
                            fullatt_block_indexes=(1,))
    vparams = init_qwen_vision(jax.random.key(1), vcfg)

    class HashTok:
        def __call__(self, texts, max_len):
            ids = np.zeros((len(texts), 8), np.int32)
            for i, t in enumerate(texts):
                for j, ch in enumerate(t.encode()[:8]):
                    ids[i, j] = ch % 64
            return ids, np.ones_like(ids)

    enh = PromptEnhancer(params, cfg, HashTok(), max_new_tokens=6)
    enh.set_vision_tower(vparams, vcfg)
    rng = np.random.default_rng(0)
    img1 = rng.standard_normal((16, 16, 3)).astype(np.float32)
    img2 = rng.standard_normal((16, 16, 3)).astype(np.float32)
    out1 = enh.enhance_with_image(img1, "caption")
    out2 = enh.enhance_with_image(img2, "caption")
    assert isinstance(out1, str)
    assert out1 != out2      # image features steer the tokens


def test_service_prompt_enhancer_with_model_instructions():
    """Service-level enhancement (reference wgp.py prompt enhancer flow)
    picks per-model instructions (Ideogram Magic Prompt)."""
    from wan2gp_tpu.runtime.service import GenerationService
    from wan2gp_tpu.families.ideogram4 import Ideogram4FamilyHandler

    md = Ideogram4FamilyHandler.query_model_def("ideogram4", {})
    assert "JSON" in md["text_prompt_enhancer_instructions"]

    class FakeEnhancer:
        def __init__(self):
            self.calls = []

        def enhance(self, prompts, is_image=False, system_prompt=None):
            self.calls.append((prompts, is_image, system_prompt))
            return [f"ENHANCED:{p}" for p in prompts]

    svc = GenerationService(output_dir="/tmp/_enh_out")
    svc.prompt_enhancer = FakeEnhancer()

    captured = {}

    class FakePipe:
        pass

    # monkeypatch through a tiny fake registry path: call generate on a
    # model with audio_only to exit early through a stub handler
    class FakeHandler:
        @staticmethod
        def generate_audio(pipe, merged, seed):
            captured.update(merged)
            return {"audio": np.zeros((16, 1), np.float32),
                    "sample_rate": 16000}

    svc._pipelines = {"ideogram4": FakePipe()}
    svc.registry.models_def["ideogram4"] = dict(
        svc.registry.models_def.get("ideogram4", {}),
        audio_only=True,
        text_prompt_enhancer_instructions=md[
            "text_prompt_enhancer_instructions"])
    svc.registry.handlers["ideogram4"] = FakeHandler
    svc.generate({"model_type": "ideogram4", "prompt": "a cat",
                  "prompt_enhancer": "T", "seed": 1})
    assert captured.get("prompt") == "ENHANCED:a cat"
    assert captured.get("original_prompt") == "a cat"
    assert svc.prompt_enhancer.calls[0][2] is not None
