"""Session robustness: the correctness driver passes a vanilla
SparkSession (no builder confs) into ``__spark_entry__`` — round 1's
0/50 came from events.parquet's TIMESTAMP(NANOS) column failing to
register on such a session. These tests pin both defense layers:
``configure_runtime`` (runtime conf application) and the pyarrow
ns→us fallback in ``load_parquet``.
"""

import os

from shaper_spark.session import (
    _ns_to_us_cached,
    configure_runtime,
    load_parquet,
)

EVENTS = "/root/testdata/sf0.001/events.parquet"


def test_configure_runtime_sets_required_confs(spark):
    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    try:
        configure_runtime(spark)
        assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true"
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    finally:
        configure_runtime(spark)


def test_load_parquet_falls_back_without_nanos_conf(spark):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    try:
        df = load_parquet(spark, EVENTS)
        assert dict(df.dtypes)["ts"] == "timestamp"
        assert df.count() > 0
    finally:
        configure_runtime(spark)


def test_fallback_and_conf_paths_agree(spark):
    via_conf = load_parquet(spark, EVENTS)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    try:
        via_fallback = load_parquet(spark, EVENTS)
        a = sorted(via_conf.select("event_id", "ts").collect())
        b = sorted(via_fallback.select("event_id", "ts").collect())
        assert a == b
    finally:
        configure_runtime(spark)


def test_ns_to_us_cache_idempotent():
    first = _ns_to_us_cached(EVENTS)
    second = _ns_to_us_cached(EVENTS)
    assert first == second
    assert os.path.exists(first)


def test_prep_on_vanilla_like_session(spark, sf_dir):
    """Simulate the driver: strip the nanos conf from a session, then run
    a queries() entry touching events through __spark_entry__."""
    import __spark_entry__ as entry

    clone = spark.newSession()
    clone.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    # force a fresh _prep for this clone
    entry._REGISTERED.discard((id(clone), sf_dir))
    df = entry.queries()["events_hourly"](clone, sf_dir)
    assert df.count() > 0
    assert clone.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true"


class TestInteractiveProfile:
    def test_child_shares_context_own_conf(self, spark):
        from shaper_spark.session import interactive_session

        child = interactive_session(spark)
        assert child is not spark
        assert child.sparkContext is spark.sparkContext
        assert child.conf.get("spark.sql.adaptive.enabled") == "false"
        # the batch parent keeps AQE (the 100 TB skew story)
        assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
        # engine-required runtime confs propagated to the child
        assert child.conf.get("spark.sql.session.timeZone") == "UTC"

    def test_child_plans_without_aqe(self, spark):
        from shaper_spark.session import interactive_session

        child = interactive_session(spark)
        plan = (
            child.sql("SELECT id % 3 AS k, count(*) c FROM range(100) GROUP BY 1")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "AdaptiveSparkPlan" not in plan

    def test_operator_entry_serves_from_interactive_profile(
        self, spark, sf_dir
    ):
        """A wrapped operator queries() entry (not _sql/_dialect) must
        execute on the AQE-off serving child: its session is a child,
        its executed plan has no AdaptiveSparkPlan node, and _prep on
        the child must not have re-enabled AQE."""
        import __spark_entry__ as entry

        df = entry.queries()["text_token_stats"](spark, sf_dir)
        sess = df.sparkSession
        assert id(sess) in entry._CHILD_IDS
        assert sess.conf.get("spark.sql.adaptive.enabled") == "false"
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "AdaptiveSparkPlan" not in plan
