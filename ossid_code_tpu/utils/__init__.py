from ossid_code_tpu.utils.timing import Timer, StageTimes
from ossid_code_tpu.utils.geometry import (
    depth2xyz,
    depth2cloud,
    proj_cloud,
    project_points_uv,
    meta2K,
    K2meta,
    quat_angular_diff_batch,
    heatmap_gaussian,
    expand_box,
    robust_crop,
    estimate_rigid_body_transform,
    perturb_trans,
    mat2quat,
    quat2mat,
)
