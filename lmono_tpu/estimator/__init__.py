from lmono_tpu.estimator.tracker import (  # noqa: F401
    FeatureTracker,
    TrackerState,
    TrackOutput,
    tracker_step,
)
from lmono_tpu.estimator.window import (  # noqa: F401
    FeatureTable,
    MargPrior,
    WindowState,
)
from lmono_tpu.estimator.estimator import (  # noqa: F401
    EstimatorState,
    FusionEstimator,
    FusionOutput,
    fusion_step,
)
