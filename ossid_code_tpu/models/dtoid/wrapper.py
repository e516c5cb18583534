"""Standalone DTOID inference wrapper (role of ref models/dtoid/wrapper.py:
the original-author-style API that loads a checkpoint + a template directory
and detects one object per call, with z-filtering; the reference copy is dead
code with broken imports and hard-coded home paths — this one works)."""

from __future__ import annotations

import numpy as np

from ossid_code_tpu.core.config import default_config
from ossid_code_tpu.data.templates import TemplateDataset


class DTOIDWrapper:
    def __init__(self, ckpt_path: str | None, template_root: str, obj_ids,
                 n_local: int = 10, use_provided_template: bool = False, cfg=None,
                 filter_z: bool = False):
        cfg = cfg or default_config()
        cfg.model.filter_z = filter_z
        from ossid_code_tpu.models.dtoid.module import DtoidModel
        from ossid_code_tpu.core.checkpoint import load_checkpoint

        self.model = DtoidModel(cfg)
        if ckpt_path:
            self.model.load_state_dict(load_checkpoint(ckpt_path))
        self.templates = TemplateDataset(
            template_root, obj_ids, use_provided_template=use_provided_template
        )
        self.n_local = n_local

    def getTemplates(self, obj_id):
        limg, lxyz, lmask = self.templates.getTemplatesAll(obj_id)
        if len(limg) > self.n_local:
            sel = np.linspace(0, len(limg) - 1, self.n_local).round().astype(int)
            limg, lxyz, lmask = limg[sel], lxyz[sel], lmask[sel]
        return limg, lxyz, lmask

    def forward(self, img, obj_id, mask=None):
        """img (H, W, 3) uint8 or float [0,1] -> detection dict (reference
        output schema)."""
        limg, _, lmask = self.getTemplates(obj_id)
        batch = {"img": img, "obj_id": obj_id, "limg": limg, "lmask": lmask, "mask": mask}
        if self.templates.use_provided_template:
            batch["template_z_values"] = self.templates.template_z_values
        return self.model.forward_test_time(batch)

    __call__ = forward
