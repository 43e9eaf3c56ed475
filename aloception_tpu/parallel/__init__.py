from .mesh import make_mesh, default_mesh_shape  # noqa: F401
from .shard import (shard_batch, replicate, partition_params,  # noqa: F401
                    param_partition_spec, constrain_tokens)
from .pipeline import (gpipe, stack_layer_params,  # noqa: F401
                       extract_layer_stack, shard_layer_stack)
from .distributed import (is_main_process, main_process_only,  # noqa: F401
                          process_count, local_device_count, init_multihost)
