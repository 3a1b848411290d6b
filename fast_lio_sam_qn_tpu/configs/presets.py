"""Dataset presets — the launch-layer equivalent.

Mirrors `roslaunch fast_lio_sam_qn run.launch lidar:=<preset>`
(launch/run.launch:20-46): each preset carries the per-dataset FAST-LIO
front-end tuning from ``third_party/fastlio_config_launch/<preset>.{yaml,
launch}`` (cited per entry) on top of the shared PGO config
(config/config.yaml, with the reference's *effective* values — see
utils/config.py).

The standard presets (ouster/velodyne/livox) of the upstream FAST-LIO repo
are approximated by the closest dataset preset family since their YAMLs live
in the absent submodule [external]: ouster ~ mulran-style OS1-64,
velodyne ~ kitti-style HDL-64, livox = Avia solid-state defaults.
"""
from __future__ import annotations

import dataclasses

from ..utils.config import LioConfig, PipelineConfig

_IDENT_R = (1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0)

LIO_PRESETS = {
    # kitti.yaml:8-27 + kitti.launch:6-12
    "kitti": LioConfig(
        lidar_type="velodyne", scan_line=64, blind=2.0, point_filter_num=4,
        acc_cov=0.1, gyr_cov=0.1, b_acc_cov=1e-4, b_gyr_cov=1e-4,
        det_range=100.0, max_iteration=3, filter_size_surf=0.5,
        filter_size_map=0.5,
        extrinsic_T=(0.81, -0.32, 0.8), extrinsic_R=_IDENT_R),
    # mulran.yaml + mulran.launch (point_filter_num=3)
    "mulran": LioConfig(
        lidar_type="ouster", scan_line=64, blind=4.0, point_filter_num=3,
        acc_cov=0.1, gyr_cov=0.1, b_acc_cov=1e-4, b_gyr_cov=1e-4,
        det_range=150.0, max_iteration=3, filter_size_surf=0.5,
        filter_size_map=0.5,
        extrinsic_T=(1.77, 0.0, -0.05),
        extrinsic_R=(-1.0, 0.0, 0.0, 0.0, -1.0, 0.0, 0.0, 0.0, 1.0)),
    # newer-college2020.yaml + .launch
    "newer-college2020": LioConfig(
        lidar_type="ouster", scan_line=64, blind=1.0, point_filter_num=4,
        acc_cov=0.1, gyr_cov=0.1, b_acc_cov=1e-4, b_gyr_cov=1e-4,
        det_range=150.0, max_iteration=3, filter_size_surf=0.5,
        filter_size_map=0.5,
        extrinsic_T=(0.0, 0.0, 0.036),
        extrinsic_R=(-1.0, 0.0, 0.0, 0.0, -1.0, 0.0, 0.0, 0.0, 1.0)),
    # Robot-specific Kimera-Multi presets (run.launch:38-43 names
    # kimera-multi-acl_jackal2 and kimera-multi-apis). The snapshot only
    # contains the acl_jackal2 YAML (fastlio_config_launch/kimera-multi.yaml
    # — its lid/imu topics are /acl_jackal2/...); the apis launch/yaml pair
    # is referenced but NOT checked out, so the apis preset carries the
    # same VLP-16 platform tuning (identical Clearpath Jackal sensor rig)
    # as the best available reconstruction [external].
    "kimera-multi-acl_jackal2": LioConfig(
        lidar_type="velodyne", scan_line=16, blind=0.3, point_filter_num=4,
        acc_cov=0.1, gyr_cov=0.1, b_acc_cov=0.01, b_gyr_cov=0.005,
        det_range=100.0, max_iteration=3, filter_size_surf=0.2,
        filter_size_map=0.2,
        extrinsic_T=(0.07025405, -0.10158666, -0.04942693),
        extrinsic_R=(-2.9046527369e-02, -9.9957706196e-01, -1.7154151723e-03,
                     -6.9278006858e-02, 3.7251435690e-03, -9.9759064383e-01,
                     9.9717458733e-01, -2.8857692625e-02, -6.9356874944e-02)),
    "kimera-multi-apis": LioConfig(
        lidar_type="velodyne", scan_line=16, blind=0.3, point_filter_num=4,
        acc_cov=0.1, gyr_cov=0.1, b_acc_cov=0.01, b_gyr_cov=0.005,
        det_range=100.0, max_iteration=3, filter_size_surf=0.2,
        filter_size_map=0.2,
        extrinsic_T=(0.07025405, -0.10158666, -0.04942693),
        extrinsic_R=(-2.9046527369e-02, -9.9957706196e-01, -1.7154151723e-03,
                     -6.9278006858e-02, 3.7251435690e-03, -9.9759064383e-01,
                     9.9717458733e-01, -2.8857692625e-02, -6.9356874944e-02)),
    # kimera-multi.yaml + .launch (VLP-16, finer filters)
    "kimera-multi": LioConfig(
        lidar_type="velodyne", scan_line=16, blind=0.3, point_filter_num=4,
        acc_cov=0.1, gyr_cov=0.1, b_acc_cov=0.01, b_gyr_cov=0.005,
        det_range=100.0, max_iteration=3, filter_size_surf=0.2,
        filter_size_map=0.2,
        extrinsic_T=(0.07025405, -0.10158666, -0.04942693),
        extrinsic_R=(-2.9046527369e-02, -9.9957706196e-01, -1.7154151723e-03,
                     -6.9278006858e-02, 3.7251435690e-03, -9.9759064383e-01,
                     9.9717458733e-01, -2.8857692625e-02, -6.9356874944e-02)),
    # vbr-colosseo.yaml + .launch
    "vbr-colosseo": LioConfig(
        lidar_type="ouster", scan_line=64, blind=0.3, point_filter_num=4,
        acc_cov=0.01, gyr_cov=0.001, b_acc_cov=0.001, b_gyr_cov=0.0005,
        det_range=100.0, max_iteration=3, filter_size_surf=0.5,
        filter_size_map=0.5,
        extrinsic_T=(0.04943289, 0.01478779, 0.60798871),
        extrinsic_R=(0.99946541, -0.03200262, 0.00670301,
                     0.03194165, 0.99944911, 0.009017,
                     -0.0069879, -0.00879813, 0.99993691)),
    # upstream FAST-LIO sensor families [external approximations]
    "ouster": LioConfig(
        lidar_type="ouster", scan_line=64, blind=4.0, point_filter_num=4,
        det_range=150.0, extrinsic_T=(0.0, 0.0, 0.0), extrinsic_R=_IDENT_R),
    "velodyne": LioConfig(
        lidar_type="velodyne", scan_line=32, blind=2.0, point_filter_num=4,
        det_range=100.0, extrinsic_T=(0.0, 0.0, 0.0), extrinsic_R=_IDENT_R),
    "livox": LioConfig(
        lidar_type="livox", scan_line=6, blind=0.5, point_filter_num=3,
        det_range=450.0, extrinsic_T=(0.04165, 0.02326, -0.0284),
        extrinsic_R=_IDENT_R),
    # synthetic-simulator preset for tests/demos
    "sim": LioConfig(
        lidar_type="velodyne", scan_line=32, blind=0.5, point_filter_num=1,
        det_range=60.0, max_iteration=3, filter_size_surf=0.3,
        filter_size_map=0.3, max_points_per_scan=4096,
        map_table_size=1 << 17),
}


def get_pipeline_config(preset: str = "kitti") -> PipelineConfig:
    """PipelineConfig with the shared PGO config (reference effective
    values) and the preset's LIO front-end tuning."""
    if preset not in LIO_PRESETS:
        raise KeyError(
            f"unknown preset {preset!r}; available: {sorted(LIO_PRESETS)}")
    cfg = PipelineConfig()
    cfg.lio = dataclasses.replace(LIO_PRESETS[preset])
    return cfg
