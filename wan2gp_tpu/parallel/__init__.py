from .mesh import make_mesh, default_axis_sizes, parse_mesh_spec
from .sharding import (shard_wan_dit_params, dit_data_shardings,
                       wan_dit_param_specs, rule_param_specs,
                       shard_params_with_rules, LTX2_BLOCK_RULES,
                       FUSED_QKV_BLOCK_RULES, UNFUSED_BLOCK_RULES,
                       unfuse_fused_linears)
