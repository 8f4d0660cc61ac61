from gd3d.kernels.rope2d import rope2d_pallas
from gd3d.kernels.cost_kl import masked_softmax_kl_rows
