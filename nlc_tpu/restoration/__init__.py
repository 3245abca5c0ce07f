from .archs import ARCH_REGISTRY, define_network, NAFNet, NAFSSR
from .losses import L1Loss, MSELoss, PSNRLoss, build_loss
from .lr_schedulers import build_scheduler
