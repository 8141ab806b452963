"""SQIL: Soft Q Imitation Learning (Reddy et al. 2019).

Counterpart of reference ``algorithms/sqil.py`` (251 LoC): off-policy RL
(default DQN) where every sampled batch is 50% expert transitions labeled
reward 1 and 50% fresh environment transitions labeled reward 0
(reference SQILReplayBuffer: expert reward :202, fresh reward :219,
50/50 sample :224-251).

TPU-native: expert demonstrations sit in HBM as a fixed ``TransitionBatch``;
the 50/50 relabeled sampling is a ``sample_hook`` injected into the jitted
DQN TD update, so the entire SQIL step (collect + mix-sample + TD update)
remains one XLA program.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from imitation_tpu.algorithms import base
from imitation_tpu.data.buffer import BufferState, ReplayBuffer
from imitation_tpu.data.types import TransitionBatch
from imitation_tpu.envs.vector import VectorEnv
from imitation_tpu.rl.dqn import DQN, DQNConfig
from imitation_tpu.util.logger import HierarchicalLogger


class SQIL(base.DemonstrationAlgorithm):
    """SQIL trainer (reference sqil.py:26-102)."""

    def __init__(
        self,
        *,
        venv: VectorEnv,
        demonstrations: base.AnyDemonstrations,
        dqn_config: DQNConfig = DQNConfig(),
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

        self.dqn = DQN(venv, dqn_config, sample_hook=sample_hook, seed=seed)
        self.state = self.dqn.init_state()

    def set_demonstrations(self, demonstrations: base.AnyDemonstrations) -> None:
        store = base.DemonstrationStore.from_demonstrations(demonstrations)
        self._expert_batch = store.batch
        # The sample hook closes over the expert batch, which gets baked into
        # the traced TD-update program as a constant — re-jit so replacing
        # demonstrations after construction actually takes effect.
        if getattr(self, "dqn", None) is not None:
            self.dqn._train_step_jit = jax.jit(self.dqn.train_step)

    @property
    def policy(self):
        """Greedy Q policy interface (sample_fn/deterministic_fn)."""
        dqn = self.dqn

        class _GreedyPolicy:
            def sample_fn(self):
                return dqn.greedy_fn()

            deterministic_fn = sample_fn

        return _GreedyPolicy()

    @property
    def policy_variables(self):
        return self.state.variables

    def train(self, *, total_timesteps: int) -> None:
        """Reference sqil.py train: delegate to the inner off-policy learner."""
        with self.logger.accumulate_means("sqil"):
            self.state = self.dqn.learn(
                self.state, total_timesteps, logger=None
            )
        self.logger.dump(int(self.state.timesteps))
