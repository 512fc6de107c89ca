from .checkpoint import (load_checkpoint, load_train_state, save_checkpoint,
                         save_train_state)
from .csv_io import append_perf_save, seq_id_strings, write_pred_save
from .logging_utils import get_logger
from .optim import ReduceLROnPlateau, adam_init, adam_update
from .train_engine import Engine

__all__ = ["Engine", "adam_init", "adam_update", "ReduceLROnPlateau",
           "save_checkpoint", "load_checkpoint", "save_train_state",
           "load_train_state", "write_pred_save", "append_perf_save",
           "seq_id_strings", "get_logger"]
