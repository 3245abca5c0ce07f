from .ddim_unet import DDIMUNet, DDIMUNetConfig
from .adm_unet import ADMUNet, ADMUNetConfig, ADMSigmaHead
from .song_unet import (SongUNet, SongUNetConfig, DhariwalUNet, DhariwalUNetConfig,
                        EDMSigmaHead, EDMPrecond, VPPrecond, VEPrecond, iDDPMPrecond)
from .sigma_head import SigmaHead, SigmaHeadConfig, sigma_head_for_unet
from .classifier import EncoderUNetModel, EncoderUNetConfig
from .factory import (create_sigma_eps_model, create_simple_sigma_eps_model,
                      create_edm_sigma_eps_model, create_classifier)
