from ossid_code_tpu.ops.nms import nms_fixed, nms_topk, batched_iou
from ossid_code_tpu.ops.conv import depthwise_corr, max_pool_ceil, avg_pool
from ossid_code_tpu.ops.resize import upsample_nearest, resize_bilinear, resize_nearest
from ossid_code_tpu.ops.pointcloud import farthest_point_sample, ball_query, gather_points
from ossid_code_tpu.ops.color import rgb_to_hsv
