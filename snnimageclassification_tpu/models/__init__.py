"""SNN model family: configs and the scan-based functional core."""
from .config import ForwardMth, ReadoutMth, SNNConfig
from . import snn
from .snn import (
    apply,
    forward_logits,
    forward_logits_pixels,
    format_inputs,
    init,
    init_state,
    param_labels,
    prediction_logits,
)
