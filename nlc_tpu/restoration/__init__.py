from .archs import ARCH_REGISTRY, define_network, NAFNet, NAFSSR, PANet
from .clip_text import CLIPTextEncoder, convert_clip_text
from .convert import convert_nafnet, convert_panet
from .losses import L1Loss, MSELoss, PSNRLoss, build_loss
from .lr_schedulers import build_scheduler
from .lmdb_lite import LmdbReader, LmdbWriter, make_image_lmdb
