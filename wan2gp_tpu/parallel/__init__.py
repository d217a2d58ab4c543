from .mesh import make_mesh, default_axis_sizes, parse_mesh_spec
from .sharding import (shard_wan_dit_params, dit_data_shardings,
                       wan_dit_param_specs)
