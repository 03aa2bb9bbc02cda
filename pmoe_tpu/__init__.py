"""PMoE-TPU: a TPU-native (JAX/XLA/Pallas) framework for Planning-Mixture-of-Experts
end-to-end autonomous driving.

Re-designed from scratch for TPU hardware with the capability surface of the PMoE
reference (mhnazeri/PMoE): the 4-stage training pipeline (segmentation U-Net,
predictive U-Net, mixture-of-experts action heads, DDPG fine-tuning), the model zoo
(moe / moe_alt / moe_shared / punet / punet_inter / pmoe / pmoe+pretrained), the data
pipeline with curriculum augmentation, and the closed-loop NoCrash / leaderboard
evaluation harness.

Architecture notes (TPU-first, not a port):
  * NHWC layout + bfloat16 compute with fp32 parameters; convs/matmuls hit the MXU.
  * MoE experts are stacked on a leading axis (``flax.linen.vmap``) so the K-expert
    forward is one batched contraction instead of a Python loop.
  * The PU-Net autoregressive rollout is a single ``jax.lax.scan`` inside one XLA
    program, rematerialized per step.
  * Data-parallel / expert-parallel scaling through ``jax.sharding.Mesh`` + ``jit``
    with XLA collectives over ICI (see :mod:`pmoe_tpu.parallel`).
"""

__version__ = "0.1.0"
