from gd3d.models.vggt.config import VggtConfig
from gd3d.models.vggt.aggregator import Aggregator
