from .psnr_ssim import calculate_psnr, calculate_ssim, bgr2ycbcr, rgb2ycbcr_y
from .fid import FIDStats, frechet_distance, compute_statistics, FIDComputer
