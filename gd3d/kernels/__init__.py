from gd3d.kernels.rope2d import rope2d_pallas
