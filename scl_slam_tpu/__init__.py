"""scl_slam_tpu — a TPU-native collaborative LiDAR SLAM engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
thisparticle/scl_slam (ROS1/C++/GTSAM): place-recognition descriptors
(Scan Context, LiDAR-Iris, M2DP, GRSD, FPFH), loop-closure retrieval and
geometric verification (ICP / RANSAC+SVD), and single- & multi-robot
pose-graph optimization — all as batched, statically-shaped, jittable
functions sharded over TPU meshes.
"""

__version__ = "0.1.0"
