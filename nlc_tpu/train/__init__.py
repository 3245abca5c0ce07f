from .losses import get_loss
from .sigma_trainer import SigmaTrainState, create_sigma_train_state, make_sigma_train_step
