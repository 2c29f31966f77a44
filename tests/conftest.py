import gc

import pytest

from netascore_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    # 16g: one shared JVM serves all ~150 tests; localCheckpoint blocks from
    # earlier modules are only reaped by the ContextCleaner after python GC,
    # so late modules otherwise run against a nearly-full 8g heap
    s = build_session(
        app_name="netascore-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.driver.memory": "16g"},
    )
    yield s
    s.stop()


@pytest.fixture(autouse=True, scope="module")
def _module_cleanup():
    """Between test modules: release tracked pipeline caches, drop cached
    plans, and nudge GC so the ContextCleaner can reap dead checkpoint
    blocks before the next module allocates."""
    yield
    try:
        from pyspark.sql import SparkSession

        from netascore_spark.pipeline import cache as C

        C.release_all()
        s = SparkSession.getActiveSession()
        if s is not None:
            s.catalog.clearCache()
        gc.collect()
    except Exception:
        pass
