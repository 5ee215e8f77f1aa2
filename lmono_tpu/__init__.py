"""lmono_tpu — TPU-native LiDAR–monocular SLAM engine.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
system bobocode/lmono (ROS/Ceres/PCL C++): LiDAR odometry, sliding-window
LiDAR–camera fusion with online extrinsic auto-calibration, loop detection
with global pose-graph optimization, and dense colored mapping — expressed
as fixed-shape array programs that scale over a `jax.sharding.Mesh`.
"""

__version__ = "0.1.0"

from lmono_tpu.config import (  # noqa: F401
    SystemConfig,
    LidarConfig,
    CameraConfig,
    TrackerConfig,
    EstimatorConfig,
    LoopConfig,
    MappingConfig,
    ParallelConfig,
    kitti_config,
    synthetic_config,
)
from lmono_tpu.utils.lie import Pose  # noqa: F401


def __getattr__(name):
    # lazy import to keep bare `import lmono_tpu` light
    if name == "SlamSystem":
        from lmono_tpu.pipeline import SlamSystem
        return SlamSystem
    raise AttributeError(name)
