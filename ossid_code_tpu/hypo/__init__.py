from ossid_code_tpu.hypo.base import HypothesisGenerator
from ossid_code_tpu.hypo.fake import FakeHypoGen
from ossid_code_tpu.hypo.icp import icp_refinement
