import sys

import pytest

sys.path.insert(0, "/root/repo")

from malstrom_spark.session import build_session  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

# Modules auto-marked `slow` (round 12, measured with --durations=0:
# these are the end-to-end streaming drains, kill-restart recovery,
# full example mains and property sweeps that dominate the suite
# wall). The fast tier (`-m "not slow"`) is the green-before-commit
# loop; the full suite still runs before a round snapshot. Individual
# tests can opt in with @pytest.mark.slow.
SLOW_MODULES: set[str] = set()


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = getattr(item, "module", None)
        name = getattr(mod, "__name__", "")
        if name.rsplit(".", 1)[-1] in SLOW_MODULES:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def spark():
    s = build_session(app_name="malstrom-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
