"""fast_lio_sam_qn_tpu — a TPU-native LiDAR-inertial SLAM engine.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
engcang/FAST-LIO-SAM-QN (reference at /root/reference):

- ``models.lio``          — FAST-LIO2-style iterated error-state Kalman filter
                            LiDAR-inertial odometry over a voxel-hash local map
                            (replaces the ikd-tree / ROS node pair).
- ``models.loop_closure`` — two-stage loop closure: Quatro-style robust global
                            registration (FPFH + max-clique inliers + GNC
                            rotation + translation voting) followed by
                            Nano-GICP-style covariance-weighted GICP.
- ``models.pipeline``     — the PGO orchestrator: keyframing, realtime pose
                            propagation, pose-graph optimization, deterministic
                            loop/vis scheduling (replaces FastLioSamQn + iSAM2).
- ``ops``                 — fixed-shape masked device kernels: SE(3) math,
                            voxel hashing, kNN, covariances, GICP, FPFH,
                            Quatro, the pose-graph Gauss-Newton/PCG solver.
- ``parallel``            — jax.sharding mesh utilities and SPMD batched
                            registration / sharded PGO.
- ``utils``               — config system (reference-compatible *effective*
                            values), dataset IO, exports, profiling,
                            checkpointing.
- ``runtime``             — native C++ host runtime (dataset decoding,
                            approximate-time sync, ring buffers) via ctypes.

Everything that touches points or poses is a fixed-shape, masked,
device-resident array program; only the host shim does IO.
"""

__version__ = "0.1.0"
