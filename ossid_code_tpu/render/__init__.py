from ossid_code_tpu.render.mesh import load_ply, save_ply, make_box_mesh, make_icosphere
from ossid_code_tpu.render.rasterizer import render_depth, Renderer
from ossid_code_tpu.render.visib import estimate_visib_mask_gt
