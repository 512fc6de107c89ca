from . import torch_init  # noqa: F401
