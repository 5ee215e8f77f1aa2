"""On-TPU smoke tests — run OUTSIDE the default suite.

`tests/` forces an 8-device virtual CPU mesh; this directory runs on the
real chip:

    PYTHONPATH=/root/repo:/root/.axon_site python -m pytest tests_tpu/ -q

Skips everything when no TPU is attached.  First compile goes through the
remote-compile tunnel (60-300 s) — run with a generous timeout and never
two TPU jobs at once.
"""

import jax
import pytest


def pytest_collection_modifyitems(config, items):
    if jax.default_backend() not in ("tpu", "axon"):
        skip = pytest.mark.skip(reason="no TPU attached (backend "
                                f"{jax.default_backend()})")
        for item in items:
            item.add_marker(skip)
