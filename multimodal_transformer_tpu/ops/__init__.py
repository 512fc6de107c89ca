from .basic import linear, mlp_relu, dropout, conv1d_window_embed, highway
from .norm import torch_layer_norm
from .metrics import ccc, masked_mse_sum, pearson
from .attention import multi_head_attention, encoder_stack
from .recurrent import lstm_scan, lstm_cell_step, convolve_local_attn, pad_shift
from .mfn_core import mfn_scan

__all__ = [
    "linear", "mlp_relu", "dropout", "conv1d_window_embed", "highway",
    "torch_layer_norm", "ccc", "masked_mse_sum", "pearson",
    "multi_head_attention", "encoder_stack",
    "lstm_scan", "lstm_cell_step", "convolve_local_attn", "pad_shift",
    "mfn_scan",
]
