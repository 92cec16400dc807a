"""scl_slam_tpu — a TPU-native collaborative LiDAR SLAM engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
thisparticle/scl_slam (ROS1/C++/GTSAM): place-recognition descriptors
(Scan Context, LiDAR-Iris, M2DP, GRSD, FPFH), loop-closure retrieval and
geometric verification (ICP / RANSAC+SVD), and single- & multi-robot
pose-graph optimization — all as batched, statically-shaped, jittable
functions sharded over TPU meshes.
"""

__version__ = "0.1.0"

import jax as _jax

# TPU f32 matmuls default to a single bf16 pass. At SLAM coordinate scales
# (tens of meters) that is ±10 m^2 of error in squared distances — enough to
# randomize nearest-neighbor correspondences — and enough normal-equation
# error to break Cholesky in the GN solver. Geometry correctness is the
# product here; the matmuls on our hot paths are tiny-K contractions where
# full precision costs almost nothing.
_jax.config.update("jax_default_matmul_precision", "highest")

# persistent compile cache: first compiles over a remote-tunneled TPU take
# minutes; cached reruns skip them entirely. Opt out with
# SCL_SLAM_NO_COMPILE_CACHE=1.
import os as _os

if not _os.environ.get("SCL_SLAM_NO_COMPILE_CACHE"):
    _cache_dir = _os.environ.get(
        "SCL_SLAM_COMPILE_CACHE",
        _os.path.join(
            _os.environ.get("XDG_CACHE_HOME", _os.path.expanduser("~/.cache")),
            "scl_slam_tpu", "jax_cache",
        ),
    )
    try:
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except (OSError, AttributeError):
        pass

from .config import DescriptorType, SlamConfig, load_config  # noqa: E402
from .geometry import Pose  # noqa: E402

__all__ = ["SlamConfig", "DescriptorType", "load_config", "Pose", "Mapper"]


def __getattr__(name):
    # lazy: runtime pulls in the full stack; keep bare import light
    if name == "Mapper":
        from .runtime import Mapper

        return Mapper
    raise AttributeError(name)
