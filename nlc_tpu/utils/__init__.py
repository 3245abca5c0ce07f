from .norms import normalize, vector_norm, cosine_distance
from .profiling import roofline, format_roofline, profiled_function
