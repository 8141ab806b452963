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


def enable_compile_cache() -> None:
    """Persistent XLA compilation cache for accelerator backends.

    First compiles through a remote/tunneled TPU backend cost minutes per
    program; the on-disk cache makes reruns skip them. No-op on the CPU
    backend (fast compiles; the cache can serve AOT artifacts with
    mismatched host-feature flags). Entry points (CLI scripts, benchmark
    runners) call this once at startup. Opt out with
    IMITATION_TPU_NO_COMPILE_CACHE=1 or override the location with
    JAX_COMPILATION_CACHE_DIR.
    """
    import os

    if os.environ.get("IMITATION_TPU_NO_COMPILE_CACHE"):
        return
    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return  # user-set env var already configures jax
    try:
        import jax

        if jax.default_backend() == "cpu":
            return
        jax.config.update(
            "jax_compilation_cache_dir", "/tmp/imitation_tpu_jax_cache"
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - jax config surface changes
        pass
