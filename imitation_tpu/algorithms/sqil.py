"""SQIL: Soft Q Imitation Learning (Reddy et al. 2019).

Counterpart of reference ``algorithms/sqil.py`` (251 LoC): off-policy RL
(default DQN; any off-policy learner — the reference's SQIL-with-SAC
tutorial 8a maps to ``rl_algo="sac"``) where every sampled batch is 50%
expert transitions labeled reward 1 and 50% fresh environment transitions
labeled reward 0 (reference SQILReplayBuffer: expert reward :202, fresh
reward :219, 50/50 sample :224-251).

TPU-native: expert demonstrations sit in HBM as a fixed ``TransitionBatch``;
the 50/50 relabeled sampling is a ``sample_hook`` injected into the jitted
TD update of the inner learner, so the entire SQIL step (collect +
mix-sample + update) remains one XLA program.
"""

from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp

from imitation_tpu.algorithms import base
from imitation_tpu.data.buffer import BufferState, ReplayBuffer
from imitation_tpu.data.types import TransitionBatch
from imitation_tpu.envs.vector import VectorEnv
from imitation_tpu.rl.dqn import DQN, DQNConfig
from imitation_tpu.rl.sac import SAC, SACConfig
from imitation_tpu.util.logger import HierarchicalLogger


class SQIL(base.DemonstrationAlgorithm):
    """SQIL trainer (reference sqil.py:26-102).

    ``rl_algo="dqn"`` (discrete, default) or ``"sac"`` (continuous, the
    reference's SQIL-SAC variant).
    """

    def __init__(
        self,
        *,
        venv: VectorEnv,
        demonstrations: base.AnyDemonstrations,
        rl_algo: str = "auto",
        dqn_config: DQNConfig = DQNConfig(),
        sac_config: SACConfig = SACConfig(),
        custom_logger: Optional[HierarchicalLogger] = None,
        allow_variable_horizon: bool = False,
        seed: int = 0,
    ):
        self.venv = venv
        self._expert_batch: Optional[TransitionBatch] = None
        super().__init__(
            demonstrations=demonstrations,
            custom_logger=custom_logger,
            allow_variable_horizon=allow_variable_horizon,
        )
        if rl_algo == "auto":
            rl_algo = "dqn" if venv.action_space.is_discrete else "sac"
        if rl_algo not in ("dqn", "sac"):
            raise ValueError(f"rl_algo must be 'dqn' or 'sac', got {rl_algo!r}")
        self.rl_algo_name = rl_algo

        def sample_hook(
            replay: ReplayBuffer,
            buffer_state: BufferState,
            key: jax.Array,
            batch_size: int,
        ) -> TransitionBatch:
            """50/50 expert/fresh with rewards 1/0 (reference sqil.py:224-251)."""
            k_new, k_exp = jax.random.split(key)
            half = batch_size // 2
            new = replay.sample(buffer_state, k_new, half)
            exp_idx = jax.random.randint(
                k_exp, (batch_size - half,), 0, self._expert_batch.batch_size
            )
            exp = jax.tree.map(lambda x: x[exp_idx], self._expert_batch)
            new = new.replace(rews=jnp.zeros_like(new.rews))
            exp = exp.replace(rews=jnp.ones_like(exp.rews))
            return jax.tree.map(lambda a, b: jnp.concatenate([a, b]), new, exp)

        if rl_algo == "dqn":
            self.rl = DQN(venv, dqn_config, sample_hook=sample_hook, seed=seed)
        else:
            self.rl = SAC(venv, sac_config, sample_hook=sample_hook, seed=seed)
        self.state = self.rl.init_state()
        # Backwards-compatible alias (DQN was the only learner originally).
        self.dqn = self.rl if rl_algo == "dqn" else None

    def set_demonstrations(self, demonstrations: base.AnyDemonstrations) -> None:
        store = base.DemonstrationStore.from_demonstrations(demonstrations)
        self._expert_batch = store.batch
        # The sample hook closes over the expert batch, which gets baked into
        # the traced TD-update program as a constant — re-jit so replacing
        # demonstrations after construction actually takes effect.
        if getattr(self, "rl", None) is not None:
            self.rl.rebind()  # keeps the host-env dispatch intact

    @property
    def policy(self):
        """Greedy/deterministic policy interface (sample_fn/deterministic_fn)."""
        rl = self.rl
        if self.rl_algo_name == "dqn":

            class _GreedyPolicy:
                def sample_fn(self):
                    return rl.greedy_fn()

                deterministic_fn = sample_fn

            return _GreedyPolicy()
        return rl.policy

    @property
    def policy_variables(self):
        return self.state.variables

    def train(self, *, total_timesteps: int) -> None:
        """Reference sqil.py train: delegate to the inner off-policy learner."""
        with self.logger.accumulate_means("sqil"):
            self.state = self.rl.learn(self.state, total_timesteps, logger=None)
        self.logger.dump(int(self.state.timesteps))
