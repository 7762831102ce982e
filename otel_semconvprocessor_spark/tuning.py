"""JIT-aware codegen limits, applied once per session by the operators.

Why this exists (round-6 measurement): whole-stage codegen fuses every
adjacent projection into ONE generated ``processNext`` method.  For wide
expression plans — the 18-rule cascade stacked on extraction, mapping and
the sink projection — that method compiles fine (Janino splits at the JVM's
64KB hard limit) but exceeds HotSpot's ``DontCompileHugeMethods`` threshold
(8000 bytecodes, on by default), so the hottest loop in the job runs as
INTERPRETED BYTECODE forever: no C2, no OSR.  Spark ships exactly the right
escape hatch — ``spark.sql.codegen.hugeMethodLimit`` makes a stage whose
generated method exceeds the limit fall back to per-operator execution,
where each projection compiles its own small, JIT-able class — but its
default (65535) tracks the JVM's hard limit, not the JIT's.

Measured (scripts/prof_r06.py shapes, 1M rows, local[32], min-of-warms,
interleaved same-session A/B):

    full cascade output, persisted input:   7.63s -> 1.05s   (7.3x)
    pipeline write (extract+map+cascade):  15.54s -> 6.03s   (2.6x)

Stages whose methods stay under 8000 bytecodes keep whole-stage codegen
unchanged; methods over the limit could never be JIT-compiled anyway, so
the fallback is strictly better on every shape we measured.  A user-set
non-default value is respected.

Scale note: this is a JVM-property fix, not a local[32] tune — the same
interpreted-bytecode cliff exists on any executor JVM running this plan
shape at any data size.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

__all__ = ["ensure_jit_codegen", "JIT_HUGE_METHOD_LIMIT"]

# HotSpot -XX:DontCompileHugeMethods kicks in above -XX:HugeMethodLimit=8000
# bytecodes (non-tunable in product builds); generated methods above it are
# never JIT-compiled.
JIT_HUGE_METHOD_LIMIT = 8000

_SPARK_DEFAULT = "65535"
_applied: set[int] = set()


def ensure_jit_codegen(spark: SparkSession) -> None:
    """Lower ``spark.sql.codegen.hugeMethodLimit`` to the JIT's compile
    ceiling so over-limit whole-stage methods fall back to per-operator
    codegen.  Idempotent per session; never overrides an explicit user
    setting (any value other than Spark's default is left alone)."""
    key = id(spark)
    if key in _applied:
        return
    _applied.add(key)
    conf = spark.conf
    try:
        current = conf.get("spark.sql.codegen.hugeMethodLimit", _SPARK_DEFAULT)
        if current == _SPARK_DEFAULT:
            conf.set("spark.sql.codegen.hugeMethodLimit", str(JIT_HUGE_METHOD_LIMIT))
    except Exception:  # pragma: no cover - conf API unavailable (mocked session)
        pass
