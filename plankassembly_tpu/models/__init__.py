from plankassembly_tpu.models.model import (
    PlankModel,
    build_model,
    init_params,
)

__all__ = ["PlankModel", "build_model", "init_params"]
