"""Broadcast rule-table cascade: the schema-version-keyed variant.

The CASE-chain cascade (operators/rules.py) compiles the rule set into one
expression — the right plan when every span sees the same rules.  The
north_star additionally requires the rule table as DATA keyed by semconv
``schema_url`` and applied via a broadcast join ("schema-version keyed rule
tables broadcast-joined, not per-row Python"): a span only sees the rule rows
for its own schema version (plus version-wildcard rules), so different
conventions can coexist in one corpus and rule-set changes are a table
update, not a plan rebuild.

Plan shape (and why the CASE chain stays the default):
  * ``rules_table`` rows are tiny and ALWAYS broadcast — the span side never
    shuffles for the join itself.  Versioned rules equi-join on schema_url
    (BroadcastHashJoin); wildcard rules attach via broadcast nested-loop
    (right side = a handful of rows).
  * per-candidate evaluation dispatches by rule_id through a lazy CASE over
    the SAME compiled Columns the chain cascade uses (rules are code; a join
    can only select which rules apply).
  * first-match-wins = min over struct(seq, ...) grouped by the span id —
    ONE shuffle of the matched candidates (slim: id + hit struct), then a
    join back to the span frame on the id.  The CASE chain needs ZERO
    shuffles, which is why it remains the default path; this variant buys
    data-driven rule dispatch for ~2 slim shuffles and is cross-checked equal
    to the chain on every output column (tests/test_rules_broadcast.py).

Reference parity: semantics identical to processor.go:192-324 — the shared
``finish_match`` stage guarantees the enforce/enrich/attr-update behavior is
the same code in both variants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import Config
from ..functions.scalars import attr
from ..tuning import ensure_jit_codegen
from .rules import compile_rule_columns, finish_match

__all__ = ["rules_table", "apply_rules_broadcast"]

_HIT_TYPE = "struct<seq:int,rule_id:string,op_name:string,op_type:string>"


def rules_table(spark: SparkSession, cfg: Config) -> DataFrame:
    """The rule set as a broadcastable table: one row per (schema_url, rule).

    ``seq`` is the rule's position in the validated priority order — the
    deterministic total order the first-match resolution minimizes over
    (priority ties resolve like the CASE chain's declaration order)."""
    rows = [
        (r.schema_url, i, r.id, r.priority)
        for i, r in enumerate(cfg.span_processing.rules)
    ]
    return spark.createDataFrame(
        rows, "schema_url string, seq int, rule_id string, priority int"
    )


def apply_rules_broadcast(
    df: DataFrame,
    cfg: Config,
    *,
    id_col: str,
    attrs_col: str = "attrs",
    name_col: str = "name",
    kind_col: str = "kind",
    schema_url_col: str | None = "schema_url",
) -> DataFrame:
    """Apply the processor via a broadcast-joined rule table keyed by
    schema_url; output contract identical to ``apply_rules``.

    ``id_col`` must uniquely identify a span (the first-match resolution
    groups on it).  A rule row with ``schema_url == ""`` is version-wildcard
    and applies to every span; a versioned rule row applies only to spans
    whose ``schema_url_col`` equals it.  Spans with NULL in that column see
    only wildcard rules.

    If the rule set contains versioned rules and ``schema_url_col`` names a
    column the frame does not have, that is a caller error (typo'd name, or
    the column was dropped upstream) and raises — silently degrading to
    wildcard-only matching would be invisible since the output schema is
    unchanged.  Pass ``schema_url_col=None`` to opt into wildcard-only
    matching explicitly.
    """
    ensure_jit_codegen(df.sparkSession)
    if not cfg.enabled or not cfg.span_processing.enabled:
        return df.withColumns(
            {
                "rule_id": F.lit(None).cast("string"),
                "operation_name": F.lit(None).cast("string"),
                "operation_type": F.lit(None).cast("string"),
                "name_original": F.lit(None).cast("string"),
            }
        )

    spark = df.sparkSession
    sp = cfg.span_processing
    attrs = F.col(attrs_col)
    name = F.col(name_col)
    kind = F.col(kind_col)

    table = rules_table(spark, cfg)
    wildcard = table.filter(F.col("schema_url") == "").drop("schema_url")
    versioned = table.filter(F.col("schema_url") != "")

    has_schema = schema_url_col is not None and schema_url_col in df.columns
    any_versioned = any(r.schema_url for r in sp.rules)
    if any_versioned and schema_url_col is not None and not has_schema:
        raise ValueError(
            f"rule set has schema_url-versioned rules but column "
            f"{schema_url_col!r} is not in the input ({df.columns}); pass "
            "schema_url_col=None to opt into wildcard-only matching"
        )

    # candidate generation: span x applicable rule rows, both joins broadcast
    cand_wild = df.join(F.broadcast(wildcard), how="cross")
    if has_schema and any_versioned:
        cand_ver = df.join(
            F.broadcast(versioned),
            on=df[schema_url_col] == versioned["schema_url"],
            how="inner",
        ).drop(versioned["schema_url"])
        candidates = cand_wild.unionByName(cand_ver)
    else:
        candidates = cand_wild

    # per-candidate evaluation: lazy CASE dispatch by rule_id over the same
    # compiled Columns the chain cascade uses (skip-guard folded in)
    compiled = compile_rule_columns(cfg, attrs, name, kind)
    rid = F.col("rule_id")
    pred_case = F.lit(False)
    hit_case = F.lit(None).cast(_HIT_TYPE)
    for c in compiled:
        hit = F.struct(
            F.col("seq").alias("seq"),
            rid.alias("rule_id"),
            c.operation_name.alias("op_name"),
            (
                c.operation_type
                if c.operation_type is not None
                else F.lit(None).cast("string")
            ).alias("op_type"),
        )
        this = rid == c.rule_id
        pred_case = F.when(this, c.predicate).otherwise(pred_case)
        hit_case = F.when(this, hit).otherwise(hit_case)

    guard = attr(attrs, sp.operation_name_attribute).isNull()
    matched = (
        candidates.filter(guard & pred_case)
        .select(F.col(id_col), hit_case.alias("__hit"))
        .filter(F.col("__hit")["op_name"].isNotNull())
    )

    # first-match-wins: min over (seq, ...) — seq is the validated priority
    # order, so this is exactly the chain cascade's resolution
    winners = matched.groupBy(id_col).agg(F.min("__hit").alias("__hit"))
    joined = df.join(winners, on=id_col, how="left")
    joined = joined.withColumn(
        "__match",
        F.when(
            F.col("__hit").isNotNull(),
            F.struct(
                F.col("__hit")["rule_id"].alias("rule_id"),
                F.col("__hit")["op_name"].alias("op_name"),
                F.col("__hit")["op_type"].alias("op_type"),
            ),
        ),
    ).drop("__hit")
    return finish_match(joined, cfg, attrs_col, name_col)
