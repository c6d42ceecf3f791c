"""Typed configuration for the TPU-native multi-robot SLAM engine.

Parameter names and defaults mirror the reference's canonical YAML
(/root/reference/config/mrg_slam.yaml) so that a reference user can carry
their tuning over verbatim. Values that only make sense under ROS (frame ids,
topic names) are kept for compatibility but unused by the compute path.

Additional `capacity_*` fields are TPU-specific: XLA requires static shapes,
so every dynamic structure in the reference (point clouds, keyframe sets,
candidate lists) becomes a fixed-capacity padded array here.
"""

from __future__ import annotations

import dataclasses
import math
from dataclasses import dataclass, field
from typing import Tuple


def _replace_from_dict(obj, d: dict):
    names = {f.name for f in dataclasses.fields(obj)}
    kwargs = {k: v for k, v in d.items() if k in names}
    return dataclasses.replace(obj, **kwargs)


@dataclass(frozen=True)
class StaticTransformConfig:
    """lidar2base_publisher section (mrg_slam.yaml:10-22): the static
    sensor->base_link transform applied during prefiltering."""

    enable_lidar2base_publisher: bool = True
    x: float = 0.0
    y: float = 0.0
    z: float = 0.0
    roll: float = 0.0
    pitch: float = 0.0
    yaw: float = 0.0

    def pose7(self):
        import numpy as np

        from .utils import se3
        import jax.numpy as jnp

        q = np.asarray(se3.rpy_to_quat(jnp.float32(self.roll),
                                       jnp.float32(self.pitch),
                                       jnp.float32(self.yaw)))
        return np.concatenate(
            [np.asarray([self.x, self.y, self.z], np.float32), q])


@dataclass(frozen=True)
class PrefilterConfig:
    """Mirrors prefiltering_component params (mrg_slam.yaml:41-72)."""

    enable_prefiltering: bool = True
    downsample_method: str = "VOXELGRID"  # VOXELGRID | APPROX_VOXELGRID | NONE
    downsample_resolution: float = 0.1
    downsample_min_points_per_voxel: int = 1
    outlier_removal_method: str = "RADIUS"  # STATISTICAL | RADIUS | NONE
    statistical_mean_k: int = 30
    statistical_stddev: float = 1.2
    radius_radius: float = 0.5
    radius_min_neighbors: int = 2
    enable_distance_filter: bool = True
    distance_near_thresh: float = 0.1
    distance_far_thresh: float = 35.0
    enable_deskewing: bool = False
    scan_period: float = 0.1
    # TPU static-shape capacities
    capacity_raw_points: int = 131072
    capacity_filtered_points: int = 32768


@dataclass(frozen=True)
class RegistrationConfig:
    """Mirrors the reg_* parameter block (mrg_slam.yaml:100-110,181-190)."""

    registration_method: str = "SMALL_GICP"  # SMALL_GICP|GICP|VGICP|NDT|ICP
    reg_num_threads: int = 8  # unused on TPU (XLA owns parallelism)
    reg_transformation_epsilon: float = 0.1
    reg_maximum_iterations: int = 64
    reg_max_correspondence_distance: float = 2.0
    reg_max_optimizer_iterations: int = 20
    reg_use_reciprocal_correspondences: bool = False
    reg_correspondence_randomness: int = 20  # k for GICP covariance kNN
    reg_resolution: float = 1.0  # NDT / VGICP voxel size
    reg_nn_search_method: str = "DIRECT7"  # DIRECT1 | DIRECT7 | DIRECT27
    # NDT mixture outlier ratio for the Magnusson exponential score
    # (pclomp ndt_omp.h outlier_ratio_ default)
    reg_ndt_outlier_ratio: float = 0.55
    # TPU-specific: GICP covariance neighborhoods. "knn" = small_gicp's
    # k-nearest (k = reg_correspondence_randomness); "radius" = one-pass
    # radius moments (Pallas-accelerated, equivalent quality on
    # voxel-downsampled clouds at radius ~2-3x the voxel size).
    reg_covariance_mode: str = "radius"
    reg_covariance_radius: float = 1.0
    # TPU-specific coarse-to-fine Gauss-Newton: run the first
    # reg_coarse_iterations of the budget on stride-subsampled source and
    # target clouds (the per-iteration NN pass shrinks ~stride² for dense
    # targets), then polish at full resolution. stride 1 disables. The
    # batched pair program's wall is its max budget, so this is the main
    # lever on the back-end tick at production cloud sizes.
    reg_coarse_stride: int = 1
    reg_coarse_iterations: int = 0
    # TPU-specific per-row stall exit for the batched pair program: a row
    # whose mean correspondence error improves by less than this relative
    # fraction for 2 consecutive Gauss-Newton iterations (or that has zero
    # correspondences) stops iterating and reports converged=False. Under
    # vmap the while_loop runs until EVERY row finishes, and
    # non-overlapping candidate rows never converge — so without this the
    # whole batch always pays the full iteration budget (measured 531 ms
    # of a ~610 ms back-end tick, BENCH_r04). 0 disables.
    reg_stall_epsilon: float = 0.0


@dataclass(frozen=True)
class ScanMatchingOdometryConfig:
    """Mirrors scan_matching_odometry_component params (mrg_slam.yaml:75-110)."""

    enable_scan_matching_odometry: bool = True
    keyframe_delta_translation: float = 1.0
    keyframe_delta_angle: float = 0.5236
    keyframe_delta_time: float = 10000.0
    enable_transform_thresholding: bool = False
    max_acceptable_translation: float = 1.0
    max_acceptable_angle: float = 1.0
    max_consecutive_rejections: int = 5
    # initial-guess sources (scan_matching_odometry_component.cpp:210-263):
    # an MSF-filtered pose stream ("imu") or a secondary wheel/robot
    # odometry ("odometry"); both are fed via ScanMatchingOdometry's
    # msf_pose_callback / robot_odom_callback
    enable_imu_frontend: bool = False
    enable_robot_odometry_init_guess: bool = False
    downsample_method: str = "NONE"
    downsample_resolution: float = 0.1
    downsample_min_points_per_voxel: int = 1
    registration: RegistrationConfig = field(default_factory=RegistrationConfig)


@dataclass(frozen=True)
class FloorDetectionConfig:
    """Mirrors floor_detection_component params (mrg_slam.yaml:113-123).

    The reference declares `enable_normal_filtering` but reads
    `use_normal_filtering` (floor_detection_component.cpp:61 vs :120) — a
    latent bug we deliberately do NOT replicate: here one flag controls it.
    """

    enable_floor_detection: bool = False
    tilt_deg: float = 0.0
    sensor_height: float = 2.0
    height_clip_range: float = 1.0
    floor_pts_thresh: int = 512
    floor_normal_thresh_deg: float = 10.0
    enable_normal_filtering: bool = True
    normal_filter_thresh_deg: float = 20.0
    ransac_iterations: int = 256
    ransac_distance_thresh: float = 0.1


@dataclass(frozen=True)
class LoopClosureConfig:
    """Loop-closure params of mrg_slam_component (mrg_slam.yaml:167-180)."""

    candidate_max_xy_distance: float = 15.0
    accum_distance_thresh_same_robot: float = 15.0
    accum_distance_thresh_other_robot: float = 5.0
    fitness_score_max_range: float = math.inf  # config/mrg_slam.yaml:172
    fitness_score_thresh: float = 1.25
    use_planar_registration_guess: bool = False
    loop_closure_edge_robust_kernel: str = "Huber"
    loop_closure_edge_robust_kernel_size: float = 1.0
    enable_loop_closure_consistency_check: bool = True
    loop_closure_consistency_max_delta_trans: float = 0.3
    loop_closure_consistency_max_delta_angle: float = 0.0523599
    # TPU: max candidates matched per new keyframe per tick (batched via vmap)
    capacity_candidates: int = 8


@dataclass(frozen=True)
class InformationMatrixConfig:
    """Mirrors information-matrix params (mrg_slam.yaml:215-224)."""

    use_const_inf_matrix: bool = False
    const_stddev_x: float = 0.5
    const_stddev_q: float = 0.1
    var_gain_a: float = 2.0
    min_stddev_x: float = 0.1
    max_stddev_x: float = 0.75
    min_stddev_q: float = 0.05
    max_stddev_q: float = 0.2
    fitness_score_thresh: float = 1.25  # shared with loop config in reference


@dataclass(frozen=True)
class GpsConfig:
    enable_gps: bool = False
    gps_edge_robust_kernel: str = "NONE"
    gps_edge_robust_kernel_size: float = 1.0
    gps_edge_stddev_xy: float = 20.0
    gps_edge_stddev_z: float = 5.0
    gps_use_enu: bool = False
    gps_enu_origin_from_msg: bool = True
    gps_enu_origin: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    gps_time_tolerance: float = 0.2  # matching gate, gps_processor.cpp:136


@dataclass(frozen=True)
class ImuConfig:
    enable_imu_orientation: bool = False
    imu_orientation_edge_robust_kernel: str = "NONE"
    imu_orientation_edge_stddev: float = 1.0
    enable_imu_acceleration: bool = False
    imu_acceleration_edge_robust_kernel: str = "NONE"
    imu_acceleration_edge_stddev: float = 1.0
    imu_time_tolerance: float = 0.2


@dataclass(frozen=True)
class FloorCoeffsConfig:
    enable_floor_coeffs: bool = False
    floor_edge_robust_kernel: str = "NONE"
    floor_edge_stddev: float = 10.0


@dataclass(frozen=True)
class OptimizerConfig:
    """Pose-graph solver settings (g2o_* params, mrg_slam.yaml:152-155)."""

    g2o_solver_type: str = "lm_var_cholmod"  # parsed for lm/gn choice only
    g2o_solver_num_iterations: int = 512  # outer cap; early-stops on chi2 tol
    g2o_verbose: bool = False
    # g2o's TerminateAction stops when the chi2 gain falls below a relative
    # threshold; 1e-6 matches its default gainThreshold order — at 1e-8 the
    # LM loop in practice always ran to the iteration cap.
    chi2_rel_tol: float = 1e-6
    lm_initial_lambda: float = 1e-6  # -1 semantics: auto from diag(H)
    # dense | cg (block-Jacobi PCG) | chain (segmented block-tridiagonal
    # Cholesky + Woodbury loop correction — the exact large-graph path,
    # graph/chain_solver.py) | auto (dense up to ~2k nodes, chain past).
    # Default "auto": an unbounded live run switches dense -> chain at the
    # measured threshold instead of dying at the dense HBM wall, matching
    # g2o cholmod's any-size envelope (graph_slam.cpp:28-30).
    solver_backend: str = "auto"
    # "auto" switchover point: dense while 6N+3P <= this (the (dofs)^2
    # Hessian stays HBM-cheap), chain past it. The default corresponds to
    # ~2k nodes on a v5e chip; tests lower it to cross the wall at CPU
    # scale through the same mechanism.
    auto_dense_max_dofs: int = 12288
    cg_max_iterations: int = 256
    cg_tol: float = 1e-6
    # per-tick marginal covariances attached to map/marker snapshots
    # (mrg_slam_component.cpp:882-891): "none" skips, "approx" = block-
    # Jacobi diag (cheap but understates off-diagonal correlation),
    # "exact" = dense H^-1 diag like g2o's sparse marginals (Cholesky-
    # based), "cg" = exact blocks matrix-free (batched-CG selected
    # inverse; for graphs past dense capacity), "auto" (default) = exact
    # up to 4k dofs then cg — so ellipsoid output is never block-Jacobi-
    # optimistic at any scale
    per_tick_marginals: str = "auto"
    # chordal initialization (graph/chordal.py) before LM: linear rotation
    # relaxation + linear translation solve put a cold-start graph inside
    # LM's quadratic basin. No reference equivalent (g2o runs LM from the
    # stored estimates); incremental SLAM ticks don't need it — enable for
    # cold solves of whole graphs (load_graph, solver benchmarks).
    chordal_init: bool = False


@dataclass(frozen=True)
class GraphExchangeConfig:
    """Multi-robot exchange params (mrg_slam.yaml:226-231)."""

    graph_exchange_mode: str = "PATH_PROXIMITY"  # CURRENT_PROXIMITY|PATH_PROXIMITY
    graph_request_min_accum_dist: float = 2.0
    graph_request_max_robot_dist: float = 50.0
    graph_request_min_time_delay: float = 2.0


@dataclass(frozen=True)
class SlamConfig:
    """Mirrors mrg_slam_component params (mrg_slam.yaml:126-243)."""

    enable_mrg_slam: bool = True
    own_name: str = "atlas"
    multi_robot_names: Tuple[str, ...] = ("atlas", "bestla")
    robot_remove_points_radius: float = 2.0
    init_pose: Tuple[float, float, float, float, float, float] = (
        0.0, 0.0, 0.0, 0.0, 0.0, 0.0)  # x y z yaw pitch roll (launch order)
    enable_fill_first_cloud: bool = False
    fill_first_cloud_radius: float = 5.0
    fill_first_cloud_simple: bool = False
    max_keyframes_per_update: int = 10000
    keyframe_delta_trans: float = 1.0
    keyframe_delta_angle: float = 0.5236
    use_custom_inf_matrix_first_node: bool = True
    custom_inf_matrix_first_node_stddev: Tuple[float, ...] = (
        0.75, 0.75, 0.75, 0.1, 0.1, 0.1)
    odometry_edge_robust_kernel: str = "NONE"
    odometry_edge_robust_kernel_size: float = 1.0
    graph_update_interval: float = 3.0
    map_cloud_update_interval: float = 5.0
    map_cloud_resolution: float = 0.1
    map_cloud_min_points_per_voxel: int = 1
    map_cloud_distance_far_thresh: float = 10000.0
    result_dir: str = ""

    optimizer: OptimizerConfig = field(default_factory=OptimizerConfig)
    loop: LoopClosureConfig = field(default_factory=LoopClosureConfig)
    inf_matrix: InformationMatrixConfig = field(default_factory=InformationMatrixConfig)
    registration: RegistrationConfig = field(default_factory=RegistrationConfig)
    gps: GpsConfig = field(default_factory=GpsConfig)
    imu: ImuConfig = field(default_factory=ImuConfig)
    floor_coeffs: FloorCoeffsConfig = field(default_factory=FloorCoeffsConfig)
    exchange: GraphExchangeConfig = field(default_factory=GraphExchangeConfig)

    # TPU static-shape capacities
    capacity_keyframes: int = 2048
    capacity_edges: int = 8192
    capacity_keyframe_points: int = 8192  # stored per-keyframe cloud budget


@dataclass(frozen=True)
class EngineConfig:
    """Top-level config bundle for one robot's SLAM engine."""

    model_namespace: str = "atlas"
    lidar2base: StaticTransformConfig = field(
        default_factory=StaticTransformConfig)
    prefilter: PrefilterConfig = field(default_factory=PrefilterConfig)
    odometry: ScanMatchingOdometryConfig = field(
        default_factory=ScanMatchingOdometryConfig)
    floor: FloorDetectionConfig = field(default_factory=FloorDetectionConfig)
    slam: SlamConfig = field(default_factory=SlamConfig)

    def with_overrides(self, **kwargs) -> "EngineConfig":
        return dataclasses.replace(self, **kwargs)

    @staticmethod
    def from_yaml_dict(d: dict) -> "EngineConfig":
        """Build from a dict shaped like the reference YAML (section->params).

        Accepts the `<section>: {ros__parameters: {...}}` nesting of
        config/mrg_slam.yaml as well as flat `<section>: {...}` dicts.
        """
        def params(section: str) -> dict:
            sec = d.get(section, {}) or {}
            return sec.get("ros__parameters", sec)

        cfg = EngineConfig()
        l2b = _replace_from_dict(cfg.lidar2base, params("lidar2base_publisher"))
        pre = _replace_from_dict(cfg.prefilter, params("prefiltering_component"))
        odo_p = params("scan_matching_odometry_component")
        odo = _replace_from_dict(cfg.odometry, odo_p)
        odo = dataclasses.replace(
            odo,
            keyframe_delta_translation=odo_p.get(
                "keyframe_delta_translation", odo.keyframe_delta_translation),
            registration=_replace_from_dict(cfg.odometry.registration, odo_p),
        )
        flo = _replace_from_dict(cfg.floor, params("floor_detection_component"))
        slam_p = params("mrg_slam_component")
        slam = _replace_from_dict(cfg.slam, slam_p)
        slam = dataclasses.replace(
            slam,
            multi_robot_names=tuple(slam_p.get("multi_robot_names",
                                               slam.multi_robot_names)),
            optimizer=_replace_from_dict(cfg.slam.optimizer, slam_p),
            loop=_replace_from_dict(cfg.slam.loop, slam_p),
            inf_matrix=_replace_from_dict(cfg.slam.inf_matrix, slam_p),
            registration=_replace_from_dict(cfg.slam.registration, slam_p),
            gps=_replace_from_dict(cfg.slam.gps, slam_p),
            imu=_replace_from_dict(cfg.slam.imu, slam_p),
            floor_coeffs=_replace_from_dict(cfg.slam.floor_coeffs, slam_p),
            exchange=_replace_from_dict(cfg.slam.exchange, slam_p),
        )
        ns = params("/**").get("model_namespace", "atlas")
        return EngineConfig(model_namespace=ns, lidar2base=l2b,
                            prefilter=pre, odometry=odo, floor=flo, slam=slam)
