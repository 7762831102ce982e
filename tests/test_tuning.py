"""The JIT-aware codegen limit (otel_semconvprocessor_spark/tuning.py)."""

from otel_semconvprocessor_spark.tuning import JIT_HUGE_METHOD_LIMIT, ensure_jit_codegen


def test_operators_apply_jit_codegen_limit(spark):
    """Any operator entry point must leave the session with the JIT-aware
    hugeMethodLimit (HotSpot never compiles methods over 8000 bytecodes, so
    over-limit whole-stage methods must fall back to per-operator codegen)."""
    ensure_jit_codegen(spark)
    assert spark.conf.get("spark.sql.codegen.hugeMethodLimit") == str(JIT_HUGE_METHOD_LIMIT)


def test_user_override_respected(spark):
    spark.conf.set("spark.sql.codegen.hugeMethodLimit", "12345")
    try:
        # a fresh ensure call must not clobber a non-default user setting
        from otel_semconvprocessor_spark import tuning

        tuning._applied.discard(id(spark))
        ensure_jit_codegen(spark)
        assert spark.conf.get("spark.sql.codegen.hugeMethodLimit") == "12345"
    finally:
        spark.conf.set("spark.sql.codegen.hugeMethodLimit", str(JIT_HUGE_METHOD_LIMIT))
        tuning._applied.discard(id(spark))
