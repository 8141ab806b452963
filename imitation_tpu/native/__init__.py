"""Native (C++) runtime components.

The reference is pure Python and outsources native compute to torch/SB3 and
subprocess env workers (SURVEY §0, §2.8). Here the native layer is explicit:
a batched C++ environment engine (``envengine.cpp``) stepped through ctypes
with std::thread parallelism — the host-side counterpart of the pure-JAX
device engine, replacing SubprocVecEnv's process-per-env + pipe IPC design.
"""

from imitation_tpu.native.build import load_library  # noqa: F401
from imitation_tpu.native.cpp_env import CppVectorEnv, make_cpp_vec_env  # noqa: F401
