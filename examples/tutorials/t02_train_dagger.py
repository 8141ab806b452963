"""Tutorial 2: DAgger on CartPole with a synthetic expert.

Counterpart of reference ``docs/tutorials/2_train_dagger.ipynb``: wrap BC in
``SimpleDAggerTrainer``; each round collects on-policy states labeled with
EXPERT actions (beta-mixed stepping), then retrains BC on all demos so far.
Run: ``python -m examples.tutorials.t02_train_dagger``
"""

import tempfile

from imitation_tpu.algorithms.dagger import SimpleDAggerTrainer
from imitation_tpu.envs import make_vec_env
from imitation_tpu.testing import experts

from examples.tutorials.t01_train_bc import eval_return


def main(total_timesteps: int = 2000):
    venv = make_vec_env("CartPole-v1", num_envs=8, max_episode_steps=200)
    with tempfile.TemporaryDirectory(prefix="dagger_") as scratch:
        trainer = SimpleDAggerTrainer(
            venv=venv,
            scratch_dir=scratch,
            expert_policy_apply=experts.cartpole_expert_fn,
            expert_params={},
            rng=0,
        )
        trainer.train(total_timesteps, bc_train_kwargs=dict(n_epochs=4))
        ret = eval_return(trainer.policy, trainer.policy_variables, venv)
    print(f"DAgger return after {total_timesteps} steps: {ret:.1f}")
    return ret


if __name__ == "__main__":
    main(total_timesteps=8000)
