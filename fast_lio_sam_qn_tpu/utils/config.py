"""Configuration system.

Mirrors the parameter surface of the reference node
(``/root/reference/fast_lio_sam_qn/src/fast_lio_sam_qn.cpp:12-50``) with the
reference's *effective* value semantics:

- Three parameter keys are typo'd in the reference source —
  ``/keyframe/nusubmap_keyframes`` (fast_lio_sam_qn.cpp:19),
  ``/quatro/max_nucorrespondences`` (:38) and
  ``/quatro/rotation/numax_iter`` (:45) — so the YAML keys
  ``num_submap_keyframes`` / ``max_correspondences`` / ``num_max_iter``
  (config/config.yaml:8,34,40) are silently ignored upstream and the code
  defaults (5 / 200 / 50) win.  ``load_reference_yaml`` reproduces exactly
  that lookup behavior so trajectories match the reference as-run; the plain
  dataclass constructors use the same code defaults.
- ``gicp.max_corr_dist`` is derived, not configured:
  ``loop_detection_radius * 1.5`` (fast_lio_sam_qn.cpp:24).

Additional blocks configure the TPU-native front end (the reference runs
FAST-LIO2 as a separate node configured by
``third_party/fastlio_config_launch/*.yaml``; those per-dataset knobs map to
``LioConfig``) and the static device capacities that replace the reference's
dynamically-sized containers.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Optional


@dataclass
class GicpConfig:
    """Nano-GICP equivalent (reference defaults: fast_lio_sam_qn.cpp:26-33,
    effective values from config/config.yaml:19-28)."""

    thread_number: int = 0                    # informational on TPU (batched kernels)
    icp_score_thr: float = 1.5                # config.yaml:21 (code default 10.0)
    correspondences_number: int = 15          # k for covariance kNN
    max_iter: int = 32
    transformation_epsilon: float = 0.01
    # stored for config parity, NOT applied — PCL's GICP never consults
    # the Euclidean-fitness epsilon or the Registration-base RANSAC hooks
    # on the reference's align() path (see PARITY.md "Known divergences")
    euclidean_fitness_epsilon: float = 0.01
    ransac_max_iter: int = 5
    ransac_outlier_rejection_threshold: float = 1.0
    max_corr_dist: float = 52.5               # derived: loop_detection_radius * 1.5


@dataclass
class QuatroConfig:
    """Quatro equivalent (reference defaults: fast_lio_sam_qn.cpp:36-45)."""

    # matching mode (loop_closure.cpp:22, README.md:21-22): True =
    # optimizedMatching (spatial gate + max_num_corres cap); False =
    # advanced matching (all mutual matches, no gate) — see
    # advanced_max_corres for the static capacity that mode pads to
    use_optimized_matching: bool = True
    distance_threshold: float = 35.0          # config.yaml:33 (code default 30.0)
    max_num_corres: int = 200                 # typo'd key -> code default 200 wins
    # TPU-native static ceiling for the ADVANCED (uncapped) matching mode:
    # mutual-NN produces at most one match per src point, so
    # min(src_cap, advanced_max_corres) covers every possible match up to
    # this bound (fixed shapes; the clique stage is O(C^2) in it)
    advanced_max_corres: int = 2048
    fpfh_normal_radius: float = 0.9           # config.yaml:35 (code default 0.3)
    fpfh_radius: float = 1.5                  # config.yaml:36 (code default 0.5)
    # FPFH backend: "stream" (default) = gather-free streaming radius
    # pipeline (ops/fpfh_stream.py — exact PCL radius semantics, and the
    # Nano-GICP plane covariances fall out of the same pass); "knn" =
    # k-capped neighbor-list formulation (ops/fpfh.py)
    fpfh_backend: str = "stream"
    # radius of the plane-covariance neighborhood on the stream backend
    # (~ Nano-GICP's k=15 at 0.3 m voxel spacing)
    fpfh_cov_radius: float = 0.6
    # planarity gate of the descriptor distinctiveness filter
    # (fpfh.distinctive); lower = keep only strongly-structured features
    planarity_threshold: float = 90.0
    # TPU-native neighbor caps for the fixed-shape "knn" backend (PCL
    # radius search is unbounded). 48/32 is quality-safe down to ~2k-point
    # clouds; 32/24 is ~20% faster and validated on >=8k-point clouds.
    fpfh_k_feat: int = 48
    fpfh_k_normal: int = 32
    # loop_closure.cpp:24: solve the similarity (sR, t) instead of the
    # rigid (R, t) — TEASER-style TLS scale estimation (ops/quatro.py
    # estimate_scale_tims) runs before the de-scaled clique
    estimating_scale: bool = False
    # acceptance gate on |scale - 1| when estimating_scale is on: the graph
    # factor is the RIGID projection of the similarity (see PARITY.md), so
    # a loop whose estimated scale strays from 1 would commit a measurement
    # biased ~ (s-1)*||p|| on world-frame points. True loop closures
    # between rigid LiDAR scans have s ~ 1; reject the rest.
    scale_gate: float = 0.1
    noise_bound: float = 0.3
    rot_gnc_factor: float = 1.4
    rot_cost_diff_thr: float = 1e-4
    rot_max_iter: int = 50                    # typo'd key -> code default 50 wins


@dataclass
class LoopClosureConfig:
    """Loop-closure module config (reference: include/loop_closure.h:45-60)."""

    voxel_res: float = 0.3                    # quatro_nano_gicp_voxel_resolution
    num_submap_keyframes: int = 5             # typo'd key -> code default 5 wins
    enable_quatro: bool = True                # config.yaml:31 (code default false)
    enable_submap_matching: bool = False
    loop_detection_radius: float = 35.0       # config.yaml:13 (code default 15.0)
    loop_detection_timediff_threshold: float = 30.0  # config.yaml:14 (default 10.0)
    # TPU-native addition (0 = reference semantics): process up to N pending
    # keyframes per loop tick as ONE batched registration program. The
    # reference's timer only ever inspects the latest keyframe, silently
    # skipping keyframes created between ticks (README.md:23); batching
    # removes that lossiness without changing per-candidate behavior.
    loop_batch: int = 0
    # TPU-native addition: a registration-accepted loop is only COMMITTED to
    # the graph once another accepted loop within `consensus_window`
    # keyframes implies a drift correction within `consensus_tol` meters
    # (drift is smooth, so true corrections cluster; isolated confidently-
    # wrong registrations — e.g. plane-sliding minima — do not).
    # 0 disables (raw reference behavior: commit on fitness alone).
    consensus_window: int = 10
    consensus_tol: float = 0.6
    # TPU-native addition: additionally reject registrations whose
    # translation normal equations are unconstrained along a direction
    # (GicpResult.degenerate). False = reference acceptance (fitness-only,
    # loop_closure.cpp:129).
    degeneracy_gate: bool = True
    gicp: GicpConfig = field(default_factory=GicpConfig)
    quatro: QuatroConfig = field(default_factory=QuatroConfig)


@dataclass
class LioConfig:
    """TPU-native LIO front end (replaces the FAST-LIO2 node; per-dataset
    values map from third_party/fastlio_config_launch/*.yaml, e.g.
    kitti.yaml:8-27, and the launch-level params kitti.launch:6-12)."""

    # preprocess
    # lidar_type selects the per-point sweep-time synthesis pattern when the
    # source carries no time field (utils/sweep.py): azimuth-based for the
    # spinning types, acquisition-order ramp for livox
    lidar_type: str = "velodyne"              # velodyne | ouster | livox
    scan_line: int = 64                       # rings; sweep.py quantizes
                                              # synthesized times to firing
                                              # columns of this many points
    # unit of the per-point time/t field in source PointCloud2 messages
    # (FAST-LIO convention, kitti.yaml:12): 0 s, 1 ms, 2 us, 3 ns; -1 = infer
    # from field name/dtype (runtime/rosbag.py decode_pointcloud2)
    timestamp_unit: int = -1
    # added to every lidar stamp before pairing with the IMU stream
    # (kimera-multi.yaml:6 time_offset_lidar_to_imu)
    time_offset_lidar_to_imu: float = 0.0
    # FAST-LIO2's runtime clock-sync detection (kitti.yaml:4): when true
    # and the LiDAR/IMU first stamps disagree by >0.1 s, the bag feeder
    # estimates the constant offset and remaps scan stamps onto the IMU
    # clock (run.py run_bag). false in every reference preset.
    time_sync_en: bool = False
    blind: float = 2.0                        # drop points closer than this [m]
    point_filter_num: int = 4                 # keep every Nth point
    # mapping / filter
    acc_cov: float = 0.1
    gyr_cov: float = 0.1
    b_acc_cov: float = 1e-4
    b_gyr_cov: float = 1e-4
    det_range: float = 100.0
    max_iteration: int = 3                    # IESEKF iterations (kitti.launch:8)
    filter_size_surf: float = 0.5             # scan downsample leaf (kitti.launch:9)
    filter_size_map: float = 0.5              # map voxel resolution (kitti.launch:10)
    extrinsic_T: tuple = (0.0, 0.0, 0.0)      # LiDAR->IMU translation
    extrinsic_R: tuple = (1.0, 0.0, 0.0,
                          0.0, 1.0, 0.0,
                          0.0, 0.0, 1.0)      # LiDAR->IMU rotation, row-major
    # FAST-LIO2's online LiDAR-IMU extrinsic refinement (kitti.yaml:22;
    # false in every reference preset). When true, the IESEKF co-estimates
    # (R_li, t_li) in a 24-dim error state, starting from
    # extrinsic_R/extrinsic_T as the prior (ops/ieskf.py update_*_ext).
    extrinsic_est_en: bool = False
    # extrinsic random-walk process noise (rad^2/s, m^2/s): keeps the
    # extrinsic covariance from freezing permanently after calibration
    # transients in weakly-observable directions
    extrinsic_rw_rot: float = 1e-5
    extrinsic_rw_trans: float = 1e-5
    gravity: float = 9.81
    # map backend (TPU-native): "surfel" = per-voxel accumulated moments
    # with cached planes (ops/surfel_map.py, default — cheaper queries and
    # denser fits); "point" = 1-point-per-voxel grid (ops/hashgrid.py)
    map_backend: str = "surfel"
    surfel_query_window: int = 1              # 1 = halo-backed O(1) lookup;
                                              # 3 = 27-hood search (slower,
                                              # more robust to estimate lag)
    surfel_hood_cap: int = 8192               # max neighborhood-refits per
                                              # scan (insert cost bound;
                                              # 0/None = unbounded)
    surfel_hood_window: int = 7               # 7 = face hood (validated on
                                              # sim: ATE matches the full
                                              # 3^3 within noise at ~4x less
                                              # refit gather traffic); 27 =
                                              # full 3^3
    surfel_halo_cap: int = 4096               # max halo-propagation sources
                                              # per scan (frontier + dirty
                                              # voxels; 0/None = all points)
    # static device capacities (TPU-native additions)
    max_points_per_scan: int = 32768          # padded scan capacity post-filter
    map_table_size: int = 1 << 19             # voxel-hash slots of local map
    plane_k: int = 5                          # neighbors for point-to-plane fit
    plane_threshold: float = 0.1              # max point-plane dist for valid plane


@dataclass
class Capacities:
    """Static shapes replacing the reference's unbounded std::vector growth.

    The keyframe stream is a padded ring (SURVEY §5 long-context note): a
    fixed-capacity stack with a count, masked reductions instead of dynamic
    loops."""

    max_keyframes: int = 4096                 # pose-graph nodes
    max_loop_factors: int = 512
    keyframe_points: int = 8192               # stored (voxelized) pts per keyframe
    src_points: int = 16384                   # loop-closure source cloud pad
    dst_points: int = 32768                   # loop-closure target cloud pad


@dataclass
class PipelineConfig:
    """Top-level config (reference: config/config.yaml + code defaults)."""

    map_frame: str = "map"
    loop_update_hz: float = 2.0               # config.yaml:3 (code default 1.0)
    vis_hz: float = 1.0                       # config.yaml:4 (code default 0.5)
    keyframe_threshold: float = 1.5           # config.yaml:7 (code default 1.0)
    save_voxel_resolution: float = 0.3
    # results (reference config.yaml:45-49)
    save_map_pcd: bool = True
    save_map_bag: bool = True
    save_in_kitti_format: bool = True
    seq_name: str = "sequence"
    loop: LoopClosureConfig = field(default_factory=LoopClosureConfig)
    lio: LioConfig = field(default_factory=LioConfig)
    caps: Capacities = field(default_factory=Capacities)

    # Reference graph noise models (fast_lio_sam_qn.cpp:112,132):
    # variances diag(1e-4 rad^2 x3, 1e-2 m^2 x3) for prior & odom factors;
    # loop factors use isotropic variance = ICP fitness score (:226).
    prior_variances: tuple = (1e-4, 1e-4, 1e-4, 1e-2, 1e-2, 1e-2)
    odom_variances: tuple = (1e-4, 1e-4, 1e-4, 1e-2, 1e-2, 1e-2)
    # TPU-native addition: Huber threshold on loop factors in the pose-graph
    # solve (ops/pgo.py optimize). <= 0 restores the reference's raw
    # isotropic-variance weighting.
    robust_delta: float = 1.0
    # Multi-chip (mesh present): switch the per-keyframe PGO solve to the
    # factor-sharded program (parallel/spmd.pgo_optimize_full) once the
    # active factor count (nodes + loops + prior) reaches this. Below it,
    # the single-device solve wins on latency (the graph is tiny and the
    # psum round-trips dominate). Identical math either way.
    pgo_shard_min_factors: int = 512

    def apply_strict_parity(self) -> "PipelineConfig":
        """Disable every beyond-reference robustness gate IN PLACE so loop
        acceptance and weighting reproduce the reference exactly:
        fitness-only acceptance (loop_closure.cpp:129), raw isotropic loop
        noise (fast_lio_sam_qn.cpp:226-233), latest-keyframe-only lossy
        loop timer (fast_lio_sam_qn.cpp:205-210). Returns self."""
        self.loop.consensus_window = 0
        self.loop.degeneracy_gate = False
        self.loop.loop_batch = 0
        self.robust_delta = 0.0
        return self


# ---------------------------------------------------------------------------
# Reference-YAML loading with effective-value semantics
# ---------------------------------------------------------------------------

def _lookup(tree: dict, dotted: str, default: Any) -> Any:
    """rosparam-style lookup of 'a/b/c' in a nested dict; code default on miss."""
    node: Any = tree
    for part in dotted.strip("/").split("/"):
        if not isinstance(node, dict) or part not in node:
            return default
        node = node[part]
    return node


def load_reference_yaml(path_or_dict, strict_parity: bool = True
                        ) -> PipelineConfig:
    """Load a reference-format config.yaml reproducing the node's exact
    parameter reads — including the three typo'd keys that make it ignore
    YAML values (see module docstring).

    strict_parity (default True): a config loaded from the reference's own
    YAML should reproduce the reference's behavior, so the beyond-reference
    robustness gates (consensus window, Huber loop factors, degeneracy
    gate) are disabled via apply_strict_parity(). Pass False to keep the
    native robust defaults on top of the reference parameter values."""
    if isinstance(path_or_dict, dict):
        tree = path_or_dict
    else:
        import yaml  # lazy: only needed for file loading

        with open(path_or_dict) as f:
            tree = yaml.safe_load(f) or {}

    cfg = PipelineConfig()
    cfg.map_frame = _lookup(tree, "basic/map_frame", "map")
    cfg.loop_update_hz = float(_lookup(tree, "basic/loop_update_hz", 1.0))
    cfg.vis_hz = float(_lookup(tree, "basic/vis_hz", 0.5))
    cfg.save_voxel_resolution = float(_lookup(tree, "save_voxel_resolution", 0.3))

    lc = cfg.loop
    lc.voxel_res = float(_lookup(tree, "quatro_nano_gicp_voxel_resolution", 0.3))
    cfg.keyframe_threshold = float(_lookup(tree, "keyframe/keyframe_threshold", 1.0))
    # deliberate typo'd key, matching fast_lio_sam_qn.cpp:19
    lc.num_submap_keyframes = int(_lookup(tree, "keyframe/nusubmap_keyframes", 5))
    lc.enable_submap_matching = bool(
        _lookup(tree, "keyframe/enable_submap_matching", False))
    lc.loop_detection_radius = float(
        _lookup(tree, "loop/loop_detection_radius", 15.0))
    lc.loop_detection_timediff_threshold = float(
        _lookup(tree, "loop/loop_detection_timediff_threshold", 10.0))

    gc = lc.gicp
    gc.max_corr_dist = lc.loop_detection_radius * 1.5  # fast_lio_sam_qn.cpp:24
    gc.thread_number = int(_lookup(tree, "nano_gicp/thread_number", 0))
    gc.icp_score_thr = float(_lookup(tree, "nano_gicp/icp_score_threshold", 10.0))
    gc.correspondences_number = int(
        _lookup(tree, "nano_gicp/correspondences_number", 15))
    gc.max_iter = int(_lookup(tree, "nano_gicp/max_iter", 32))
    gc.transformation_epsilon = float(
        _lookup(tree, "nano_gicp/transformation_epsilon", 0.01))
    gc.euclidean_fitness_epsilon = float(
        _lookup(tree, "nano_gicp/euclidean_fitness_epsilon", 0.01))
    gc.ransac_max_iter = int(_lookup(tree, "nano_gicp/ransac/max_iter", 5))
    gc.ransac_outlier_rejection_threshold = float(
        _lookup(tree, "nano_gicp/ransac/outlier_rejection_threshold", 1.0))

    qc = lc.quatro
    lc.enable_quatro = bool(_lookup(tree, "quatro/enable", False))
    qc.use_optimized_matching = bool(_lookup(tree, "quatro/optimize_matching", True))
    qc.distance_threshold = float(_lookup(tree, "quatro/distance_threshold", 30.0))
    # deliberate typo'd key, matching fast_lio_sam_qn.cpp:38
    qc.max_num_corres = int(_lookup(tree, "quatro/max_nucorrespondences", 200))
    qc.fpfh_normal_radius = float(_lookup(tree, "quatro/fpfh_normal_radius", 0.3))
    qc.fpfh_radius = float(_lookup(tree, "quatro/fpfh_radius", 0.5))
    qc.estimating_scale = bool(_lookup(tree, "quatro/estimating_scale", False))
    qc.noise_bound = float(_lookup(tree, "quatro/noise_bound", 0.3))
    qc.rot_gnc_factor = float(_lookup(tree, "quatro/rotation/gnc_factor", 1.4))
    qc.rot_cost_diff_thr = float(
        _lookup(tree, "quatro/rotation/rot_cost_diff_threshold", 1e-4))
    # deliberate typo'd key, matching fast_lio_sam_qn.cpp:45
    qc.rot_max_iter = int(_lookup(tree, "quatro/rotation/numax_iter", 50))

    cfg.save_map_bag = bool(_lookup(tree, "result/save_map_bag", False))
    cfg.save_map_pcd = bool(_lookup(tree, "result/save_map_pcd", False))
    cfg.save_in_kitti_format = bool(
        _lookup(tree, "result/save_in_kitti_format", False))
    cfg.seq_name = str(_lookup(tree, "result/seq_name", ""))
    if strict_parity:
        cfg.apply_strict_parity()
    return cfg


def load_lio_yaml(path_or_dict, base: Optional[LioConfig] = None) -> LioConfig:
    """Load a FAST-LIO-format per-dataset YAML (e.g. fastlio_config_launch/
    kitti.yaml) into a LioConfig."""
    if isinstance(path_or_dict, dict):
        tree = path_or_dict
    else:
        import yaml

        with open(path_or_dict) as f:
            tree = yaml.safe_load(f) or {}
    lio = dataclasses.replace(base) if base else LioConfig()
    lidar_types = {1: "livox", 2: "velodyne", 3: "ouster"}
    lt = _lookup(tree, "preprocess/lidar_type", None)
    if lt is not None:
        lio.lidar_type = lidar_types.get(int(lt), "velodyne")
    lio.scan_line = int(_lookup(tree, "preprocess/scan_line", lio.scan_line))
    lio.timestamp_unit = int(
        _lookup(tree, "preprocess/timestamp_unit", lio.timestamp_unit))
    lio.time_offset_lidar_to_imu = float(
        _lookup(tree, "common/time_offset_lidar_to_imu",
                lio.time_offset_lidar_to_imu))
    lio.blind = float(_lookup(tree, "preprocess/blind", lio.blind))
    lio.acc_cov = float(_lookup(tree, "mapping/acc_cov", lio.acc_cov))
    lio.gyr_cov = float(_lookup(tree, "mapping/gyr_cov", lio.gyr_cov))
    lio.b_acc_cov = float(_lookup(tree, "mapping/b_acc_cov", lio.b_acc_cov))
    lio.b_gyr_cov = float(_lookup(tree, "mapping/b_gyr_cov", lio.b_gyr_cov))
    lio.det_range = float(_lookup(tree, "mapping/det_range", lio.det_range))
    ext_t = _lookup(tree, "mapping/extrinsic_T", None)
    if ext_t is not None:
        lio.extrinsic_T = tuple(float(v) for v in ext_t)
    ext_r = _lookup(tree, "mapping/extrinsic_R", None)
    if ext_r is not None:
        lio.extrinsic_R = tuple(float(v) for v in ext_r)
    lio.extrinsic_est_en = bool(
        _lookup(tree, "mapping/extrinsic_est_en", lio.extrinsic_est_en))
    lio.time_sync_en = bool(
        _lookup(tree, "common/time_sync_en", lio.time_sync_en))
    # The remaining ignored FAST-LIO keys are all inert (scan_rate,
    # fov_degree, publish:/pcd_save: blocks) — documented in PARITY.md
    # "Known divergences".
    return lio
