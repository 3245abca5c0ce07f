from .svd import (
    SVDOperator, Denoising, Inpainting, Colorization, SuperResolution,
    WalshHadamardCS, BlockCS, GeneralA, SRConv, Deblurring, Deblurring2D,
    bicubic_kernel_1d,
)
from .constraints import (
    svd_constraint, simple_constraint, ConstraintFunction, get_constraint_function,
    flatten_chw, unflatten_chw,
)
