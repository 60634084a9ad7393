"""Multi-chip parallelism: mesh construction + shard_map'd sweep kernels."""

from common_tpu.parallel.mesh import (  # noqa: F401
    CHAINS,
    DATA,
    data_pspec,
    init_distributed,
    make_mesh,
    shard_state,
    state_pspec,
)
from common_tpu.parallel.sharded import (  # noqa: F401
    gather_chain,
    initialize_chains,
    make_sharded_sweep,
)
from common_tpu.parallel.scaling import measure_row_scaling  # noqa: F401
from common_tpu.parallel.chains import (  # noqa: F401
    stack_states,
    unstack_state,
    vmap_sweep,
)
