"""The rule engine: skip-guarded, first-match-wins priority cascade.

Reference semantics (processor.go:192-324), re-expressed as ONE Catalyst
``CASE WHEN`` chain producing a struct — evaluated lazily in priority order,
exactly like the reference's ``break`` at processor.go:322, but JVM-side and
whole-stage code-generated instead of per-row interpreted:

  * skip-guard: a span with a pre-existing ``operation.name`` attribute is not
    processed at all (processor.go:202-206).
  * per-rule span-kind filter (processor.go:215-228).
  * condition eval error => rule skipped (processor.go:231-241): NULL-valued
    conditions are falsy in CASE WHEN, same observable behavior.
  * name-expression eval error => rule skipped, fall through to the NEXT rule
    (processor.go:244-250): encoded by folding ``name_expr IS NOT NULL`` into
    the rule predicate (except for Concat/literal exprs which can never error).
  * operation_type eval error => empty type but the rule still applies
    (processor.go:256-262): the type column is simply NULL.
  * enrich mode (processor.go:266-282): attributes only, span name untouched.
  * enforce mode (processor.go:284-309): span name overwritten; original name
    stashed in ``name.original`` only when preserve_original_name is set AND
    the name actually changed (processor.go:290).
  * ``operation.type`` is set-if-absent in both modes (processor.go:270-274,
    296-301).

Input contract: df has ``name:string``, ``kind:string`` (lowercase span-kind
words), ``attrs:map<string,string>``.  Output adds:

  rule_id:string          matched rule id (NULL: skip-guarded or no match)
  operation_name:string   computed name for matched rows (NULL otherwise)
  operation_type:string   computed type for matched rows (NULL when rule has
                          no type expr or it errored — Go's "" case)
  name:string             (replaced) enforced name in enforce mode
  name_original:string    see above
  attrs:map               (replaced) updated attribute map

Scale note: the cascade is pure expression work — no shuffle, no UDF, no
joins; it fuses into the scan's WholeStageCodegen stage, so it costs ~0 extra
passes at any data size.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config import MODE_ENFORCE, Config
from ..functions.ottl import (
    AttrSource,
    compile_ottl,
    referenced_attr_keys,
    value_expr_never_null,
)
from ..functions.scalars import attr
from ..tuning import ensure_jit_codegen

__all__ = ["compile_rule_columns", "apply_rules", "finish_match", "CompiledRuleCols"]


@dataclass
class CompiledRuleCols:
    rule_id: str
    predicate: Column
    operation_name: Column
    operation_type: Column | None
    # True when the name expr can evaluate to NULL (= OTTL eval error,
    # processor.go:244-250) and the cascade must test it before matching.
    name_nullable: bool = False


def compile_rule_columns(
    cfg: Config,
    attrs_col: Column,
    name_col: Column,
    kind_col: Column,
) -> list[CompiledRuleCols]:
    """Compile every validated rule into (predicate, name, type) Columns.

    Driver-side, once per job — the Spark analogue of compileRules
    (processor.go:81-118).  Rules arrive priority-sorted from
    Config.validate() (config.go:156-158)."""
    out: list[CompiledRuleCols] = []
    for rule in cfg.span_processing.rules:
        pred = compile_ottl(rule.condition, attrs_col, name_col)
        if rule.span_kind:
            # processor.go:215-228 — empty list means all kinds.
            pred = kind_col.isin(list(rule.span_kind)) & pred
        name_expr = compile_ottl(rule.operation_name, attrs_col, name_col).cast("string")
        type_expr = None
        if rule.operation_type:
            type_expr = compile_ottl(rule.operation_type, attrs_col, name_col).cast("string")
        out.append(
            CompiledRuleCols(
                rule.id,
                pred,
                name_expr,
                type_expr,
                name_nullable=not value_expr_never_null(rule.operation_name),
            )
        )
    return out


def apply_rules(
    df: DataFrame,
    cfg: Config,
    attrs_col: str = "attrs",
    name_col: str = "name",
    kind_col: str = "kind",
    pre_project_keys: bool = False,
) -> DataFrame:
    """Apply the processor to a span-shaped DataFrame (see module docstring).

    ``pre_project_keys=True`` pre-evaluates every referenced attr key into a
    hidden struct ONCE per row.  Output-identical; measured SLOWER on the
    reference rule set (interleaved same-session A/B at local[8]/2M rows:
    35.2s vs 20.3s min) — materializing a 26-string-field struct per row
    costs more than the probes the lazy CASE actually skips, because
    first-match-wins means the average row only evaluates a few rules'
    predicates.  Kept as a hook: a rule set whose FIRST rules reuse many
    keys would flip the trade."""
    ensure_jit_codegen(df.sparkSession)
    if not cfg.enabled or not cfg.span_processing.enabled:
        # processor.go:122-124 / 146-148: disabled => identity, but keep the
        # output schema stable for downstream stages.
        return df.withColumns(
            {
                "rule_id": F.lit(None).cast("string"),
                "operation_name": F.lit(None).cast("string"),
                "operation_type": F.lit(None).cast("string"),
                "name_original": F.lit(None).cast("string"),
            }
        )

    sp = cfg.span_processing
    attrs = F.col(attrs_col)
    name = F.col(name_col)
    kind = F.col(kind_col)

    # Collect every attr key the rule set references (plus the skip-guard
    # key); resolution strategy is chosen below.
    keys: set[str] = {sp.operation_name_attribute}
    for rule in sp.rules:
        keys |= referenced_attr_keys(rule.condition)
        keys |= referenced_attr_keys(rule.operation_name)
        if rule.operation_type:
            keys |= referenced_attr_keys(rule.operation_type)
    key_list = sorted(keys)
    if pre_project_keys:
        ak = F.struct(
            *[attr(attrs, k).alias(f"k{i}") for i, k in enumerate(key_list)]
        )
        df = df.withColumn("__ak", ak)
        field = {k: F.col(f"__ak.k{i}") for i, k in enumerate(key_list)}
    else:
        field = {k: attr(attrs, k) for k in key_list}
    src = AttrSource(attrs, lambda key: field.get(key, attr(attrs, key)))

    compiled = compile_rule_columns(cfg, src, name, kind)

    # One struct-valued CASE chain => each rule predicate is evaluated at most
    # once per row and evaluation stops at the first match (lazy CASE WHEN),
    # mirroring the `break` at processor.go:322.
    no_match = F.lit(None).cast(
        "struct<rule_id:string,op_name:string,op_type:string>"
    )
    cascade = no_match
    for c in reversed(compiled):
        hit = F.struct(
            F.lit(c.rule_id).alias("rule_id"),
            c.operation_name.alias("op_name"),
            (c.operation_type if c.operation_type is not None else F.lit(None).cast("string")).alias("op_type"),
        )
        if c.name_nullable:
            # name-expr error => skip THIS rule and continue the cascade
            # (processor.go:244-250): fold name_expr IS NOT NULL into the
            # predicate.  The expr appears in both the branch condition and
            # the value (2 evals on matched rows only); the alternative —
            # evaluating the hit struct once behind the predicate and testing
            # its op_name field — was measured 10% SLOWER on the 18-rule 1M-row
            # cascade (12.30s vs 11.16s min-warm, scripts/cascade_attrib.py):
            # the nested struct-valued CASE costs codegen more than the rare
            # re-evaluation saves.
            cascade = F.when(
                c.predicate & c.operation_name.isNotNull(), hit
            ).otherwise(cascade)
        else:
            cascade = F.when(c.predicate, hit).otherwise(cascade)

    # Skip-guard (processor.go:202-206): pre-existing operation.name attribute
    # short-circuits the whole cascade.
    guarded = F.when(field[sp.operation_name_attribute].isNull(), cascade)

    out = finish_match(df.withColumn("__match", guarded), cfg, attrs_col, name_col)
    return out.drop("__ak")


def finish_match(
    df: DataFrame,
    cfg: Config,
    attrs_col: str = "attrs",
    name_col: str = "name",
) -> DataFrame:
    """Shared post-match stage: given a ``__match`` struct column
    (``struct<rule_id,op_name,op_type>``, NULL = skip-guarded or no match),
    produce the output contract — enforce/enrich naming, name.original
    preservation, and the attribute-map update.  Used by both the CASE-chain
    cascade above and the broadcast rule-table variant
    (operators/rules_broadcast.py), which is how the two are cross-checked
    to be identical."""
    sp = cfg.span_processing
    attrs = F.col(attrs_col)
    name = F.col(name_col)
    m = F.col("__match")
    matched = m.isNotNull()
    op_name = m["op_name"]
    # Go: a type-expr eval error leaves operationType == "" and the attribute
    # unset (processor.go:256-262, 269-274); NULL and "" are both "unset".
    op_type = m["op_type"]
    type_settable = matched & op_type.isNotNull() & (op_type != "")

    enforce = sp.mode == MODE_ENFORCE

    new_name = F.when(matched, op_name).otherwise(name) if enforce else name
    name_original = (
        F.when(F.lit(sp.preserve_original_name) & matched & (name != op_name), name)
        if enforce
        else F.lit(None).cast("string")
    )

    # Attribute-map update: add operation.name (guard guarantees the key is
    # absent on matched rows), operation.type set-if-absent, and name.original
    # in enforce+preserve when the name changed.  operation.name/.type cannot
    # collide by construction, but name.original CAN pre-exist (the reference
    # overwrites it via PutStr, processor.go:290) — so before map_concat we
    # drop any base-map key the additions map is about to (re-)add, giving
    # last-wins semantics instead of DUPLICATED_MAP_KEY under Spark's default
    # spark.sql.mapKeyDedupPolicy=EXCEPTION.
    additions = F.map_from_entries(
        F.filter(
            F.array(
                F.struct(
                    F.lit(sp.operation_name_attribute).alias("key"),
                    F.when(matched, op_name).alias("value"),
                ),
                F.struct(
                    F.lit(sp.operation_type_attribute).alias("key"),
                    F.when(
                        type_settable & attr(attrs, sp.operation_type_attribute).isNull(),
                        op_type,
                    ).alias("value"),
                ),
                F.struct(
                    F.lit(sp.original_name_attribute).alias("key"),
                    (
                        F.when(
                            F.lit(sp.preserve_original_name) & matched & (name != op_name),
                            name,
                        )
                        if enforce
                        else F.lit(None).cast("string")
                    ).alias("value"),
                ),
            ),
            lambda e: e["value"].isNotNull(),
        )
    )
    # NB: the drop-predicate lambda must reference only literals — an
    # unresolved column ref (e.g. `name`) inside a higher-order-function
    # lambda in this withColumns can resolve against the REPLACED column
    # (observed on Spark 4.1: the lambda saw the new enforced name, the
    # sibling expression the original), silently changing semantics.
    orig_fires = (
        (F.lit(sp.preserve_original_name) & matched & (name != op_name))
        if enforce
        else F.lit(False)
    )
    empty_map = F.create_map().cast("map<string,string>")
    coalesced = F.coalesce(attrs, empty_map)
    base = F.when(
        orig_fires,
        F.map_filter(coalesced, lambda k, _: k != F.lit(sp.original_name_attribute)),
    ).otherwise(coalesced)
    new_attrs = F.map_concat(base, additions)

    return (
        df.withColumns(
            {
                "rule_id": m["rule_id"],
                "operation_name": F.when(matched, op_name),
                "operation_type": F.when(matched, op_type),
                name_col: new_name,
                "name_original": name_original,
                attrs_col: new_attrs,
            }
        ).drop("__match")
    )
