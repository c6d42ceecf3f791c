"""mrg_slam_tpu — a TPU-native multi-robot LiDAR graph-SLAM engine.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
reference ROS2/PCL/g2o stack (aserbremen/mrg_slam): point-cloud
prefiltering, GICP/NDT scan-matching odometry, floor detection, keyframe
graph SLAM with loop closure, multi-robot delta-graph exchange, and a
distributed pose-graph optimizer over a `jax.sharding.Mesh`.

Package layout
--------------
- `ops/`      stateless array kernels (clouds, voxel grids, NN, registration)
- `graph/`    pose-graph optimizer (manifold LM, robust kernels, marginals)
- `models/`   SLAM components (odometry, database, loop detector, backend)
- `parallel/` device-mesh distribution and multi-robot exchange
- `utils/`    SE(3) math, config, metrics, geodesy, IO helpers
- `io/`       dataset loaders and the synthetic LiDAR world
- `pipeline/` replay harnesses (the no-ROS equivalent of python_scripts/)
"""

from .config import EngineConfig

__version__ = "0.1.0"
__all__ = ["EngineConfig", "__version__"]
