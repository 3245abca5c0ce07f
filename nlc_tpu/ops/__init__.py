from .attention import fused_attention, use_pallas_attention
