from .attention import fused_attention, use_pallas_attention
from .quant import QuantConv, int8_conv, quantize_symmetric
from .canny import (CannyFilter, CannyDetector, HWC3, create_image_grid,
                    get_edge_hint, get_canny_edges)
