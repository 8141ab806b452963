"""Measured reference-class baseline for bench.py.

The reference stack (SB3 + PyTorch + SubprocVecEnv, reference
algorithms/adversarial/common.py:391-425 train_gen / :317-389 train_disc)
is not installable here, so this reproduces its *execution shape* with the
same libraries it delegates hot work to (torch CPU + gymnasium): a per-step
Python rollout loop over 8 vectorized CartPole envs with a torch
FeedForward32 policy forward per step, learned-reward relabeling per step,
then minibatched PPO epochs and discriminator BCE updates per 2048-step
round. Reported number = env-steps/s sustained through full rounds — the
same metric bench.py reports for the TPU path.

Writes {"steps_per_s": ..., "measured_at": ..., "detail": ...} to
output/bench_baseline.json.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import torch
import torch.nn as nn


class MLP(nn.Module):
    def __init__(self, inp, out):
        super().__init__()
        self.net = nn.Sequential(
            nn.Linear(inp, 32), nn.Tanh(), nn.Linear(32, 32), nn.Tanh(),
            nn.Linear(32, out),
        )

    def forward(self, x):
        return self.net(x)


def measure(seconds: float = 8.0) -> dict:
    torch.manual_seed(0)
    torch.set_num_threads(1)  # reference CI/bench posture: single-threaded torch
    import gymnasium as gym

    n_envs = 8
    envs = [gym.make("CartPole-v1") for _ in range(n_envs)]
    obs = np.stack([e.reset(seed=i)[0] for i, e in enumerate(envs)])
    policy = MLP(4, 2)
    value = MLP(4, 1)
    disc = MLP(5, 1)
    pi_opt = torch.optim.Adam(
        list(policy.parameters()) + list(value.parameters()), lr=3e-4
    )
    d_opt = torch.optim.Adam(disc.parameters(), lr=1e-3)
    n_steps = 256  # 2048-step rounds at 8 envs (SB3 PPO default batch)
    demo_obs = torch.randn(2048, 4)
    demo_act = torch.randint(0, 2, (2048,))

    steps_done = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < seconds:
        buf_obs, buf_act, buf_rew = [], [], []
        for _ in range(n_steps):
            with torch.no_grad():
                logits = policy(torch.as_tensor(obs, dtype=torch.float32))
                act = torch.distributions.Categorical(logits=logits).sample()
                # learned-reward relabel per step (RewardVecEnvWrapper shape)
                d_in = torch.cat(
                    [torch.as_tensor(obs, dtype=torch.float32),
                     act[:, None].float()], 1
                )
                _ = -torch.nn.functional.logsigmoid(-disc(d_in))
            nxt = []
            for i, e in enumerate(envs):
                o, r, term, trunc, _ = e.step(int(act[i]))
                if term or trunc:
                    o, _ = e.reset()
                nxt.append(o)
            buf_obs.append(obs.copy())
            buf_act.append(act.numpy())
            buf_rew.append(np.ones(n_envs, np.float32))
            obs = np.stack(nxt)
            steps_done += n_envs
        # PPO-ish update: 5 epochs x 64-sample minibatches over the round
        bo = torch.as_tensor(np.concatenate(buf_obs), dtype=torch.float32)
        ba = torch.as_tensor(np.concatenate(buf_act))
        br = torch.as_tensor(np.concatenate(buf_rew))
        n = bo.shape[0]
        for _ in range(5):
            perm = torch.randperm(n)
            for s in range(0, n, 64):
                idx = perm[s : s + 64]
                logits = policy(bo[idx])
                logp = torch.distributions.Categorical(logits=logits).log_prob(
                    ba[idx]
                )
                v = value(bo[idx]).squeeze(-1)
                loss = -(logp * br[idx]).mean() + ((v - br[idx]) ** 2).mean()
                pi_opt.zero_grad(); loss.backward(); pi_opt.step()
        # 2 disc updates on expert+gen batches
        for _ in range(2):
            gi = torch.randint(0, n, (1024,))
            ei = torch.randint(0, demo_obs.shape[0], (1024,))
            gen_in = torch.cat([bo[gi], ba[gi][:, None].float()], 1)
            exp_in = torch.cat([demo_obs[ei], demo_act[ei][:, None].float()], 1)
            logits = disc(torch.cat([exp_in, gen_in])).squeeze(-1)
            labels = torch.cat([torch.ones(1024), torch.zeros(1024)])
            d_loss = nn.functional.binary_cross_entropy_with_logits(logits, labels)
            d_opt.zero_grad(); d_loss.backward(); d_opt.step()
    elapsed = time.perf_counter() - t0
    return {
        "steps_per_s": round(steps_done / elapsed, 1),
        "measured_at": time.strftime("%Y-%m-%d %H:%M:%S"),
        "detail": (
            "torch-CPU per-step GAIL-class loop: 8 CartPole envs, torch(1 thread) "
            "FF32 policy fwd + reward relabel per step, 5x64 PPO epochs + 2 disc "
            "updates per 2048-step round (reference execution shape; SB3 itself "
            "not installable in this image)"
        ),
    }


def measure_mujoco(seconds: float = 10.0) -> dict:
    """Same execution shape on the BASELINE.json headline env (seals-class
    HalfCheetah): per-step Python rollout over 8 gym MuJoCo envs with a
    torch policy forward + learned-reward relabel per step, then PPO +
    disc updates per round (reference adversarial loop shape,
    common.py:391-425/:317-389)."""
    torch.manual_seed(0)
    torch.set_num_threads(1)
    import gymnasium as gym

    n_envs = 8
    envs = [
        gym.make("HalfCheetah-v5", exclude_current_positions_from_observation=False)
        for _ in range(n_envs)
    ]
    obs = np.stack([e.reset(seed=i)[0] for i, e in enumerate(envs)])
    obs_dim = obs.shape[1]
    act_dim = envs[0].action_space.shape[0]
    policy = MLP(obs_dim, act_dim)
    value = MLP(obs_dim, 1)
    disc = MLP(obs_dim + act_dim, 1)
    pi_opt = torch.optim.Adam(
        list(policy.parameters()) + list(value.parameters()), lr=3e-4
    )
    d_opt = torch.optim.Adam(disc.parameters(), lr=1e-3)
    n_steps = 256
    demo_obs = torch.randn(2048, obs_dim)
    demo_act = torch.randn(2048, act_dim)

    steps_done = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < seconds:
        buf_obs, buf_act = [], []
        for _ in range(n_steps):
            with torch.no_grad():
                act = policy(torch.as_tensor(obs, dtype=torch.float32))
                act = act + 0.1 * torch.randn_like(act)
                d_in = torch.cat(
                    [torch.as_tensor(obs, dtype=torch.float32), act], 1
                )
                _ = -torch.nn.functional.logsigmoid(-disc(d_in))
            act_np = act.numpy()
            nxt = []
            for i, e in enumerate(envs):
                o, r, term, trunc, _ = e.step(act_np[i])
                if term or trunc:
                    o, _ = e.reset()
                nxt.append(o)
            buf_obs.append(obs.copy())
            buf_act.append(act_np)
            obs = np.stack(nxt)
            steps_done += n_envs
        bo = torch.as_tensor(np.concatenate(buf_obs), dtype=torch.float32)
        ba = torch.as_tensor(np.concatenate(buf_act), dtype=torch.float32)
        n = bo.shape[0]
        for _ in range(5):
            perm = torch.randperm(n)
            for s in range(0, n, 64):
                idx = perm[s : s + 64]
                pa = policy(bo[idx])
                v = value(bo[idx]).squeeze(-1)
                loss = ((pa - ba[idx]) ** 2).mean() + (v ** 2).mean()
                pi_opt.zero_grad(); loss.backward(); pi_opt.step()
        for _ in range(2):
            gi = torch.randint(0, n, (1024,))
            ei = torch.randint(0, demo_obs.shape[0], (1024,))
            gen_in = torch.cat([bo[gi], ba[gi]], 1)
            exp_in = torch.cat([demo_obs[ei], demo_act[ei]], 1)
            logits = disc(torch.cat([exp_in, gen_in])).squeeze(-1)
            labels = torch.cat([torch.ones(1024), torch.zeros(1024)])
            d_loss = nn.functional.binary_cross_entropy_with_logits(logits, labels)
            d_opt.zero_grad(); d_loss.backward(); d_opt.step()
    elapsed = time.perf_counter() - t0
    for e in envs:
        e.close()
    return {
        "steps_per_s": round(steps_done / elapsed, 1),
        "measured_at": time.strftime("%Y-%m-%d %H:%M:%S"),
        "detail": (
            "torch-CPU per-step GAIL-class loop: 8 HalfCheetah-v5 envs "
            "stepped per-env in Python (DummyVecEnv shape), torch(1 thread) "
            "FF32 policy fwd + reward relabel per step, 5x64 PPO epochs + 2 "
            "disc updates per 2048-step round"
        ),
    }


def main():
    out = measure()
    os.makedirs("output", exist_ok=True)
    with open("output/bench_baseline.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


def main_mujoco():
    out = measure_mujoco()
    os.makedirs("output", exist_ok=True)
    with open("output/bench_baseline_mujoco.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    import sys

    if "--mujoco" in sys.argv:
        main_mujoco()
    else:
        main()
