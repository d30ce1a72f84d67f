"""intensity_slam_tpu — TPU-native intensity-based LiDAR SLAM.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
`himhan34/Intensity_based_LiDAR_SLAM_for_me-` (fork of
SnowCarter/Intensity_based_LiDAR_SLAM, "Real-Time Simultaneous Localization and
Mapping with LiDAR Intensity", Du & Beltrame, ICRA 2023, arXiv:2301.09257).

The reference is a ROS1/C++ multi-process system (see /root/reference and
SURVEY.md).  This framework is NOT a port: every stage is a pure jitted
function over fixed-shape arrays, dynamic data structures (ikd-Tree, BoW
database, deques) are replaced by device-resident fixed-capacity tensors
(voxel hash, ring buffers, descriptor matrices), and the 6-process ROS topic
graph collapses into a two-stream in-program pipeline.

Subpackage map (reference component numbers from SURVEY.md §2):

- ``utils.se3``        SO(3)/SE(3) math (quaternions, exp/log) — substrate
- ``config``           typed config (C23, values from config/spot.yaml)
- ``ops.projection``   organized cloud -> intensity/range/xyz images (C1)
- ``ops.ground``       batched RANSAC ground-plane extraction (C2)
- ``ops.features``     oriented-BRIEF detect/describe/match (C3)
- ``ops.solver``       batched Gauss-Newton/LM on SE(3), residual library
                       (C4, C7, C16 — replaces Ceres and iSAM2)
- ``ops.curvature``    A-LOAM curvature features (C11)
- ``ops.grid_hash``    voxel grid-hash spatial index (replaces C17/C18/C19)
- ``ops.scancontext``  ScanContext descriptor + shift distance (C9)
- ``ops.icp``          batched point-to-point/plane ICP (C10)
- ``pipeline.*``       odometry / fallback / mux / mapping / posegraph / loop
- ``parallel.*``       Mesh sharding, distributed BA + PGO (north star)
- ``io.*``             synthetic sequence generation, log replay
"""

__version__ = "0.1.0"
