from .losses import LossConfig, hinge_d_loss, vanilla_d_loss
from .state import TrainState, TrainConfig, create_train_state
from .step import Trainer
