from lmono_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    make_mesh_2d,
    shard_leading,
    replicated,
)
from lmono_tpu.parallel.dist_knn import sharded_knn  # noqa: F401
from lmono_tpu.parallel.dist_ba import (  # noqa: F401
    make_distributed_step,
    demo_inputs,
    graph_shardings,
)
from lmono_tpu.parallel.dist_posegraph import (  # noqa: F401
    make_sharded_posegraph_opt,
)
from lmono_tpu.parallel.dist_window import (  # noqa: F401
    make_sharded_solve,
    window_shardings,
)
