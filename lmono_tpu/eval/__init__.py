from lmono_tpu.eval.ate import (  # noqa: F401
    ate_rmse,
    rpe,
    umeyama_alignment,
    save_tum,
    load_tum,
)
