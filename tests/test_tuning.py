"""The JIT-aware codegen limit (otel_semconvprocessor_spark/tuning.py)."""

from otel_semconvprocessor_spark.tuning import JIT_HUGE_METHOD_LIMIT, ensure_jit_codegen


def test_operators_apply_jit_codegen_limit(spark):
    """Any operator entry point must leave the session with the JIT-aware
    hugeMethodLimit (HotSpot never compiles methods over 8000 bytecodes, so
    over-limit whole-stage methods must fall back to per-operator codegen)."""
    ensure_jit_codegen(spark)
    assert spark.conf.get("spark.sql.codegen.hugeMethodLimit") == str(JIT_HUGE_METHOD_LIMIT)


def test_user_override_respected(spark):
    """An explicit user setting — even Spark's own default value — must
    survive ensure calls (unset is detected via conf.get(key, None))."""
    try:
        spark.conf.set("spark.sql.codegen.hugeMethodLimit", "65535")
        ensure_jit_codegen(spark)
        assert spark.conf.get("spark.sql.codegen.hugeMethodLimit") == "65535"
        spark.conf.set("spark.sql.codegen.hugeMethodLimit", "12345")
        ensure_jit_codegen(spark)
        assert spark.conf.get("spark.sql.codegen.hugeMethodLimit") == "12345"
    finally:
        spark.conf.set("spark.sql.codegen.hugeMethodLimit", str(JIT_HUGE_METHOD_LIMIT))
