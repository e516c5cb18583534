"""Model registry (role of ref models/__init__.py:3-15)."""


def get_model(cfg, seed: int = 42):
    if cfg.model.name == "dtoid":
        from ossid_code_tpu.models.dtoid.module import DtoidModel

        model = DtoidModel(cfg, seed=seed)
    elif cfg.model.name == "maskrcnn":
        from ossid_code_tpu.models.maskrcnn import MaskRCNN

        model = MaskRCNN(cfg, seed=seed)
    else:
        raise ValueError(f"Unknown cfg.model.name = {cfg.model.name}")

    if cfg.get("weights_path"):
        from ossid_code_tpu.core.checkpoint import load_checkpoint

        model.load_state_dict(load_checkpoint(cfg.weights_path))
    return model
