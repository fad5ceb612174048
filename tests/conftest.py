import sys

import pytest

sys.path.insert(0, "/root/repo")

from malstrom_spark.session import build_session  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

# Modules auto-marked `slow` (round 12, measured with --durations=0
# over the 774-test suite: 1495 s total; these 15 modules carry
# 1103 s — end-to-end streaming drains, full example mains, the
# registry sweep, hypothesis property sweeps and the heavyweight
# dedup/similarity/graph fixtures). The fast tier (`-m "not slow"`,
# ~6.5 min) is the green-before-commit loop; the FULL suite still
# gates a round snapshot, and every slow family keeps fast-tier
# smoke coverage via test_plans/test_bitext/test_linkage/
# test_search/test_stream_api. Individual tests can opt in with
# @pytest.mark.slow.
SLOW_MODULES: set[str] = {
    "test_disorder",
    "test_queries_registry",
    "test_examples",
    "test_properties",
    "test_late_stream",
    "test_streaming_heavy",
    "test_rescale",
    "test_stateful_op_timers",
    "test_bus",
    "test_streaming_dedup",
    "test_ttl_event_time",
    "test_operator_tester",
    "test_graph",
    "test_similarity",
    "test_dedup",
}


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
