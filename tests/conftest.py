import os
import sys

# Tests run on a virtual multi-device CPU mesh so sharding logic is exercised
# without TPU hardware (the TPU-world analog of the reference's
# no-cluster-needed testing, SURVEY.md §4).
os.environ["JAX_PLATFORMS"] = "cpu"
# Drop the axon TPU plugin from the import path: its init reaches for the
# TPU tunnel even under JAX_PLATFORMS=cpu and can hang test runs.
sys.path[:] = [p for p in sys.path if "axon_site" not in p]
os.environ["PYTHONPATH"] = ":".join(
    p for p in os.environ.get("PYTHONPATH", "").split(":") if "axon_site" not in p
)
# Pytest plugins (jaxtyping) import jax before this conftest runs, so the
# env var alone is too late; force the platform through the config as well
# (the backend itself initializes lazily, so this still takes effect).
if "jax" in sys.modules:
    import jax

    jax.config.update("jax_platforms", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_DIR = "/root/reference"


def pytest_collection_modifyitems(config, items):
    """Skip @pytest.mark.slow tests by default (suite budget, VERDICT r4
    weak #4); TSALIGN_SLOW=1 or an explicit -m selection runs them."""
    import pytest

    if os.environ.get("TSALIGN_SLOW") or config.getoption("-m"):
        return
    skip = pytest.mark.skip(reason="slow pin (set TSALIGN_SLOW=1)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


def reference_path(*parts):
    return os.path.join(REFERENCE_DIR, *parts)


def has_reference():
    return os.path.isdir(REFERENCE_DIR)
