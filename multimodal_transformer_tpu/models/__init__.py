from .config import (FAMILIES, MFT_EMBED_DIM, ModelConfig, default_config,
                     modalities_from_comb)
from .families import FAMILY_FNS, build_model

__all__ = ["FAMILIES", "MFT_EMBED_DIM", "ModelConfig", "default_config",
           "modalities_from_comb", "FAMILY_FNS", "build_model"]
