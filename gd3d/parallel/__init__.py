from gd3d.parallel.sharding import vit_tp_rules, apply_tp_sharding
from gd3d.parallel.fsdp import apply_fsdp_sharding, fsdp_spec, sharded_fraction
