"""imitation_tpu: a TPU-native imitation- and reward-learning framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of
HumanCompatibleAI/imitation (reference: /root/reference): behavioral cloning,
DAgger, density-based rewards, MCE IRL, GAIL, AIRL, preference comparisons
(RLHF) and SQIL — built around a jit-vectorized environment engine, on-device
replay, and pure functional train steps sharded over a `jax.sharding.Mesh`.

Unlike the reference (Python + SB3/PyTorch, single device), every hot loop here
— env stepping, rollout collection, reward relabeling, discriminator and policy
updates — is a compiled XLA program operating on pytrees in HBM.
"""

__version__ = "0.1.0"
