from lmono_tpu.loop.keyframe_db import KeyframeDB, db_add, db_query  # noqa: F401
from lmono_tpu.loop.detector import LoopDetector, LoopResult, detect_and_verify  # noqa: F401
from lmono_tpu.loop.posegraph import (  # noqa: F401
    PoseGraph,
    graph_add_node,
    graph_add_loop,
    graph_poses,
    optimize_posegraph,
)
