"""m3vit_tpu: a TPU-native (JAX/XLA/Pallas) multi-task Mixture-of-Experts ViT framework.

Re-implementation of the capabilities of M3ViT (Mixture-of-Experts Vision
Transformer for Efficient Multi-task Learning), designed TPU-first:

  * functional flax.linen models, one jitted train step
  * sort-based static-capacity MoE dispatch + batched per-expert GEMMs (MXU)
  * expert parallelism via a (data, expert) jax.sharding.Mesh with
    lax.all_to_all token exchange over ICI (shard_map)
  * noisy-VMoE top-k gating with the exact softmax-then-topk semantics of the
    reference (reference: models/moe/ckpt/noisy_gate_vmoe.py)

Nothing in this package imports torch; the compute path is pure JAX.
"""

__version__ = "0.1.0"
