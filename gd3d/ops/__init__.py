from gd3d.ops.basic import temp_sigmoid, l2_normalize
from gd3d.ops.interpolate import grid_sample_bilinear, interpolate_features
from gd3d.ops.losses import (
    kl_divergence_map,
    pairwise_logistic_ranking_loss,
    intra_depth_margin_loss,
    ap_loss_paired,
    ap_loss_me,
)
from gd3d.ops.masks import patch_mask_from_kps, masked_patch_cost
from gd3d.ops.geometry import (
    point_cloud_to_depth,
    extract_kp_depth,
    compute_projection,
    convert_camera_to_world,
    coview_masks,
    img_coord_2_obj_coord,
    query_pose_error,
)
from gd3d.ops.nms import sample_keypoints_nms
from gd3d.ops.depth import post_process_depth
from gd3d.ops.regr3d import (
    conf_regr3d_loss,
    normalize_pointcloud,
    regr3d_loss,
)
from gd3d.ops.matching_loss import (
    blockwise_infonce,
    conf_matching_loss,
    infonce_loss,
)
