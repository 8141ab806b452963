"""Video recording wrapper for host (gym-bridge) environments.

Counterpart of reference ``util/video_wrapper.py`` (89 LoC): records render
frames per episode (or one continuous video) to disk. Pure-JAX envs have no
renderer, so this applies to gymnasium envs stepped through the bridge.
Frames are written as an ``.mp4`` when imageio+ffmpeg are available,
falling back to a ``.npz`` stack of frames.
"""

from __future__ import annotations

import os
import pathlib
from typing import List, Optional

import numpy as np


class VideoWrapper:
    """Per-env gymnasium wrapper recording render frames."""

    def __init__(
        self,
        env,
        directory: os.PathLike,
        single_video: bool = True,
        fps: int = 30,
    ):
        self.env = env
        self.directory = pathlib.Path(directory)
        self.directory.mkdir(parents=True, exist_ok=True)
        self.single_video = single_video
        self.fps = fps
        self.episode_id = 0
        self._frames: List[np.ndarray] = []

    def __getattr__(self, name):
        return getattr(self.env, name)

    def _capture(self) -> None:
        frame = self.env.render()
        if frame is not None:
            self._frames.append(np.asarray(frame))

    def _flush(self) -> None:
        if not self._frames:
            return
        stem = (
            "video" if self.single_video else f"video.{self.episode_id:06d}"
        )
        frames = np.stack(self._frames)
        try:
            import imageio

            imageio.mimwrite(
                self.directory / f"{stem}.mp4", frames, fps=self.fps
            )
        except Exception:
            np.savez_compressed(self.directory / f"{stem}.npz", frames=frames)
        self._frames = []

    def reset(self, **kwargs):
        if not self.single_video:
            self._flush()
        self.episode_id += 1
        out = self.env.reset(**kwargs)
        self._capture()
        return out

    def step(self, action):
        out = self.env.step(action)
        self._capture()
        return out

    def close(self) -> None:
        self._flush()
        self.env.close()
