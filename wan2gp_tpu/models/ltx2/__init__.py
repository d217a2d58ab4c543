"""LTX-2 family: joint audio+video DiT (19B/22B), video VAE, audio VAE +
vocoder, Gemma-3 text stack, distilled/dev pipelines.

Reference: /root/reference/models/ltx2/ (ltx2.py:797 `LTX2`,
ltx_core/model/transformer/model.py `LTXModel`)."""
