from gd3d.distill.train_state import TrainState, make_optimizer
from gd3d.distill.me import build_me_train_step
