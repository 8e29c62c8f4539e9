from .conv import causal_mask, conv2d, masked_conv2d
from .lstm_pallas import lstm_seq_fused

__all__ = ["causal_mask", "conv2d", "masked_conv2d", "lstm_seq_fused"]
