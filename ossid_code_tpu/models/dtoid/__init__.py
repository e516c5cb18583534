from ossid_code_tpu.models.dtoid.anchors import generate_anchor_grid
from ossid_code_tpu.models.dtoid.network import DtoidNetwork
from ossid_code_tpu.models.dtoid.losses import detection_loss, dtoid_losses
from ossid_code_tpu.models.dtoid.module import DtoidModel
