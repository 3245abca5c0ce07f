from .norms import normalize, vector_norm, cosine_distance
