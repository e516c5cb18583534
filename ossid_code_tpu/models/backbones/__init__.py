from ossid_code_tpu.models.backbones.densenet import DenseNetStem, DenseNetEarly, DenseNetLate
from ossid_code_tpu.models.backbones.squeezenet import SqueezeStem4, SqueezeEarly, SqueezeLate, Fire
