from gd3d.core.config import (
    StudentConfig,
    LossWeights,
    KeypointConfig,
    TrainConfig,
    DistillConfig,
    EvalConfig,
    MeshConfig,
)
from gd3d.core.mesh import make_mesh, data_sharding, replicated
