from ossid_code_tpu.eval.bop_csv import save_results_bop, read_results_bop
from ossid_code_tpu.eval.pose_metrics import add_err, adi_err, object_diameter
from ossid_code_tpu.eval.detection_map import voc_map, eval_detection_results
