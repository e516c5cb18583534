from ossid_code_tpu.models.zephyr.features import assemble_score_features, DIM_POINT
from ossid_code_tpu.models.zephyr.pointnet2 import PointNet2SSG
from ossid_code_tpu.models.zephyr.module import ZephyrModel
