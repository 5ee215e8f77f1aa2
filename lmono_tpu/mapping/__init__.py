from lmono_tpu.mapping.depth import (  # noqa: F401
    project_cloud,
    complete_depth,
    backproject_colored,
)
from lmono_tpu.mapping.builder import (  # noqa: F401
    ColorMap,
    MapBuilder,
    build_frame,
    colormap_update,
    save_ply,
)
