from gd3d.distill.train_state import TrainState, make_optimizer
from gd3d.distill.me import build_me_train_step
from gd3d.distill.pretrain import build_mast3r_pretrain_step, pretrain_loss
