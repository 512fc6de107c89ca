from .send import SendDataset, load_send, SCHEMA
from .windowing import construct_input, pad_input, pad_rating, window_pipeline
from .batching import Batch, make_batches, bucketed_eval_batches
from .synthetic import generate_synthetic_send

__all__ = [
    "SendDataset", "load_send", "SCHEMA",
    "construct_input", "pad_input", "pad_rating", "window_pipeline",
    "Batch", "make_batches", "bucketed_eval_batches",
    "generate_synthetic_send",
]
