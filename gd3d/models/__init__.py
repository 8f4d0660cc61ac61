from gd3d.models.vit import ViT, resample_pos_embed
from gd3d.models.student import Student, split_params, merge_params
