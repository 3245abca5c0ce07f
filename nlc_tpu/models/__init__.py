from .ddim_unet import DDIMUNet, DDIMUNetConfig
from .sigma_head import SigmaHead, SigmaHeadConfig
