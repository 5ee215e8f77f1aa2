from lmono_tpu.io.sync import MeasurementSync  # noqa: F401
from lmono_tpu.io.replay import InputLog  # noqa: F401
