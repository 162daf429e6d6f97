"""TPU kernels and decode ops."""

from .attention import flash_attention  # noqa: F401
from .beam import ctc_prefix_beam_search  # noqa: F401
from .ctc import ctc_loss, segments_from_alignment  # noqa: F401
from .mel_pallas import MelFrontend  # noqa: F401
from .quant import quantize_param_tree, quantized_matmul  # noqa: F401
from .ring_attention import ring_attention  # noqa: F401
