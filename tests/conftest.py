import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from myduckserver_spark.session import build_session  # noqa: E402

TEST_SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

# First-class 4-way shard split (round-10 verdict item 1): every test
# gets exactly one of shard0..shard3 by MODULE, so
#   pytest tests/ -m shard0   ... -m shard3
# partitions the suite for parallel or time-windowed runs while the
# plain `pytest tests/` behavior is unchanged. The heavy modules are
# pinned by measured wall time (full serial run, --durations log);
# everything else distributes by a stable name hash.
_SHARD_PINS = {
    # shard: measured-heavy modules (~balanced wall clock)
    "test_dml_fuzz.py": 0,            # ~830s: the single heaviest
    "test_mysql_surface.py": 0,
    "test_incdedup.py": 0,
    "test_engine_sql.py": 1,          # ~690s
    "test_differential_fuzz.py": 1,
    "test_enum_order.py": 1,
    "test_oracle_queries.py": 2,      # ~500s incl. suite members
    "test_pg_compat.py": 2,
    "test_fulltext_bm25.py": 2,
    "test_properties.py": 3,
    "test_vector_index.py": 3,
    "test_output_fidelity.py": 3,
    "test_triggers.py": 3,
    "test_mysqldump_restore.py": 3,
}


def pytest_collection_modifyitems(config, items):
    import zlib

    for item in items:
        mod = os.path.basename(str(item.fspath))
        shard = _SHARD_PINS.get(mod)
        if shard is None:
            shard = zlib.crc32(mod.encode()) % 4
        item.add_marker(getattr(pytest.mark, f"shard{shard}"))


@pytest.fixture(scope="session")
def spark():
    s = build_session(
        app_name="myduckserver_spark_tests",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "8g"},
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return TEST_SF_DIR
