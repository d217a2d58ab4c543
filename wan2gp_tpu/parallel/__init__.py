from .mesh import make_mesh, default_axis_sizes
from .sharding import shard_wan_dit_params, dit_data_shardings
