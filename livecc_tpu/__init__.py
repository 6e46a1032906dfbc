"""livecc_tpu — a TPU-native streaming video-commentary (LiveCC) framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of showlab/livecc:
  * frame pipeline (fps sampling, smart resize, visual-token budgeting)
  * Qwen2-VL model family (ViT + LLM + M-RoPE) as functional JAX
  * bucketed KV-cache streaming engine (prefill 2 frames -> decode words)
  * sharded training (ZeRO-2-style over a jax.sharding.Mesh)
  * distributed eval harnesses + data production tools

Design: everything on the compute path is jit-compiled with static,
bucketed shapes; the host side (video decode, scheduling, IO) is native
code or thin Python drivers. No env-var import magic, no dynamic shapes.
"""

__version__ = "0.1.0"
