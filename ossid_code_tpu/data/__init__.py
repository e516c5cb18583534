from ossid_code_tpu.data.bop import BopDataset, BopDatasetArgs
from ossid_code_tpu.data.templates import TemplateDataset
from ossid_code_tpu.data.dtoid_bop import DtoidBopDataset, get_dataloaders
