"""Prompt enhancer: LLM rewrite of user prompts before generation.

TPU-native analog of the reference's prompt enhancer
(/root/reference/shared/prompt_enhancer/: Qwen text rewriter with
cinematic-director / visual-artist system prompts, prompt_enhance_utils.py
T2V_CINEMATIC_PROMPT / T2I_VISUAL_PROMPT; wgp.py:6133
process_prompt_enhancer).  The rewriter runs on the shared Qwen causal LM
(models/qwen/text_encoder.py) with greedy KV-cache decoding — the same
weights that already serve as the Qwen-Image/Z-Image text conditioner, so
an enhancer costs no extra checkpoint when those are loaded.

The Florence2 image captioner (image-conditioned enhancement) is a later
round; enhance() is text-only.
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np
import jax.numpy as jnp

# Equivalent instructions to the reference's cinematic/visual system
# prompts (prompt_enhance_utils.py:10-54), restated: rewrite the user's
# prompt into one rich, literal, chronological shot description.
T2V_SYSTEM_PROMPT = (
    "You are a cinematography prompt writer. Rewrite the user's idea as "
    "one flowing paragraph describing a single video shot: lead with the "
    "main action, then precise movements and gestures, exact character "
    "and object appearance, background and environment, camera angle and "
    "motion, lighting and color, and any sudden changes. Stay literal, "
    "keep the user's intent, stay under 150 words, and output only the "
    "rewritten prompt.")

T2I_SYSTEM_PROMPT = (
    "You are a photography prompt writer. Rewrite the user's idea as one "
    "flowing paragraph describing a single still image: lead with the "
    "main subject and pose, then expression and positioning details, "
    "exact appearance, background and environment, framing and "
    "perspective, lighting, color and mood. Stay literal, keep the "
    "user's intent, stay under 150 words, and output only the rewritten "
    "prompt.")

CHAT_TEMPLATE = ("<|im_start|>system\n{system}<|im_end|>\n"
                 "<|im_start|>user\n{user}<|im_end|>\n"
                 "<|im_start|>assistant\n")

VL_SYSTEM_PROMPT = (
    "You are an expert visual describer. Looking at the provided image, "
    "write a rich, precise caption covering subjects, style, lighting, "
    "composition and atmosphere. Output only the caption.")


class PromptEnhancer:
    """Wraps a Qwen-family LM + tokenizer into enhance(prompt)."""

    def __init__(self, lm_params, lm_cfg, tokenizer,
                 max_prompt_tokens: int = 256,
                 max_new_tokens: int = 224,
                 eos_token_id: Optional[int] = None,
                 lm_head=None):
        self.params = lm_params
        self.cfg = lm_cfg
        self.tokenizer = tokenizer
        self.max_prompt_tokens = max_prompt_tokens
        self.max_new_tokens = max_new_tokens
        self.eos_token_id = eos_token_id
        self.lm_head = lm_head
        self.vision = None

    def enhance(self, prompts: List[str], is_image: bool = False,
                system_prompt: Optional[str] = None) -> List[str]:
        from .models.qwen.text_encoder import qwen_lm_generate
        system = system_prompt or (T2I_SYSTEM_PROMPT if is_image
                                   else T2V_SYSTEM_PROMPT)
        texts = [CHAT_TEMPLATE.format(system=system, user=p)
                 for p in prompts]
        ids, mask = self.tokenizer(texts, self.max_prompt_tokens)
        toks = qwen_lm_generate(self.params, self.cfg,
                                jnp.asarray(ids), jnp.asarray(mask),
                                max_new_tokens=self.max_new_tokens,
                                eos_token_id=self.eos_token_id,
                                lm_head=self.lm_head)
        return [self._decode(row) for row in np.asarray(toks)]

    def enhance_with_image(self, image, prompt: str = "",
                           system_prompt: Optional[str] = None) -> str:
        """VL mode (reference shared/prompt_enhancer/qwen35_vl.py +
        florence2 captioner role): the Qwen2.5-VL vision tower's merged
        features are prepended to the chat tokens so the LM can caption /
        rewrite conditioned on the image.  Requires set_vision_tower()."""
        assert self.vision is not None, "call set_vision_tower() first"
        from .models.qwen.vision import (qwen_vision_forward,
                                         image_to_patches)
        from .models.qwen.text_encoder import qwen_lm_generate
        vparams, vcfg = self.vision
        patches, grid = image_to_patches(np.asarray(image, np.float32),
                                         vcfg)
        feats = qwen_vision_forward(vparams, vcfg, jnp.asarray(patches),
                                    grid)
        system = system_prompt or VL_SYSTEM_PROMPT
        text = CHAT_TEMPLATE.format(system=system, user=prompt or
                                    "Describe this image in detail.")
        ids, mask = self.tokenizer([text], self.max_prompt_tokens)
        toks = qwen_lm_generate(self.params, self.cfg, jnp.asarray(ids),
                                jnp.asarray(mask),
                                max_new_tokens=self.max_new_tokens,
                                eos_token_id=self.eos_token_id,
                                lm_head=self.lm_head,
                                prefix_embeds=feats[None])
        return self._decode(np.asarray(toks)[0])

    def set_vision_tower(self, vision_params, vision_cfg):
        self.vision = (vision_params, vision_cfg)

    def _decode(self, token_row) -> str:
        toks = list(int(t) for t in token_row)
        if self.eos_token_id is not None and self.eos_token_id in toks:
            toks = toks[:toks.index(self.eos_token_id)]
        decode = getattr(self.tokenizer, "decode", None)
        if decode is None:
            inner = getattr(self.tokenizer, "tokenizer", None)
            decode = getattr(inner, "decode", None)
        if decode is None:
            return " ".join(str(t) for t in toks)   # hash tokenizer: ids
        return decode(toks, skip_special_tokens=True).strip()


def load_prompt_enhancer(checkpoint_path: str, tokenizer_path=None,
                         preset: str = "qwen3_4b", dtype=jnp.bfloat16):
    """Build a PromptEnhancer from a Qwen LM checkpoint."""
    from .io.safetensors_reader import load_weights
    from .models.qwen.text_encoder import (QwenLMConfig,
                                           load_qwen_lm_params,
                                           QWEN3_4B, QWEN25_VL_7B_TEXT)
    from .utils.tokenizer import load_tokenizer
    kw = QWEN3_4B if preset == "qwen3_4b" else QWEN25_VL_7B_TEXT
    cfg = QwenLMConfig(**kw, compute_dtype=dtype)
    sd = load_weights(checkpoint_path)
    lm_head = None
    if "lm_head.weight" in sd:
        lm_head = jnp.asarray(
            np.asarray(sd["lm_head.weight"], np.float32).T).astype(dtype)
    params, _ = load_qwen_lm_params(sd, cfg, dtype)
    tok = load_tokenizer(tokenizer_path)
    return PromptEnhancer(params, cfg, tok, eos_token_id=151645,
                          lm_head=lm_head)   # <|im_end|>
