"""get_spark / apply_runtime_confs must configure PRE-EXISTING sessions
too (VERDICT r7 #2): a harness that creates its own SparkSession and
then calls into the engine still gets the load-bearing Arrow batching
regime."""

from littletable_spark.session import _APPLIED, apply_runtime_confs, get_spark

BYTES_KEY = "spark.sql.execution.arrow.maxBytesPerBatch"


def test_get_spark_reapplies_confs_to_active_session(spark):
    prev = spark.conf.get(BYTES_KEY)
    try:
        spark.conf.set(BYTES_KEY, "64m")  # simulate a foreign session
        got = get_spark()
        assert got is spark
        assert spark.conf.get(BYTES_KEY) == "2147483647b"
    finally:
        spark.conf.set(BYTES_KEY, prev)


def test_apply_runtime_confs_is_memoized(spark):
    apply_runtime_confs(spark)
    assert id(spark) in _APPLIED
    prev = spark.conf.get(BYTES_KEY)
    try:
        spark.conf.set(BYTES_KEY, "64m")
        # memoized: does NOT re-set on every call (hot-path cheapness)
        apply_runtime_confs(spark)
        assert spark.conf.get(BYTES_KEY) == "64m"
        # but get_spark (session-acquisition) always refreshes
        get_spark()
        assert spark.conf.get(BYTES_KEY) == "2147483647b"
    finally:
        spark.conf.set(BYTES_KEY, prev)


def test_entry_loaders_apply_confs(spark):
    import __spark_entry__ as m

    prev = spark.conf.get(BYTES_KEY)
    try:
        spark.conf.set(BYTES_KEY, "64m")
        _APPLIED.discard(id(spark))
        m._t(spark, "/root/testdata/sf0.001", "region").df.count()
        assert spark.conf.get(BYTES_KEY) == "2147483647b"
    finally:
        spark.conf.set(BYTES_KEY, prev)
