from gd3d.parallel.sharding import vit_tp_rules, apply_tp_sharding
