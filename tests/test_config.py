"""Config validation tests, ported from config_test.go:13-324."""

import pytest

from otel_semconvprocessor_spark.config import (
    MODE_ENFORCE,
    MODE_ENRICH,
    Config,
    OTTLRule,
    SpanProcessingConfig,
    reference_config,
)


def _cfg(rules, mode="", **kw):
    return Config(
        enabled=True,
        span_processing=SpanProcessingConfig(enabled=True, mode=mode, rules=rules, **kw),
    )


def _rule(**kw):
    base = dict(id="r1", priority=100, condition="true", operation_name='"x"')
    base.update(kw)
    return OTTLRule(**base)


def test_defaults_applied():
    cfg = _cfg([_rule()])
    cfg.validate()
    sp = cfg.span_processing
    assert sp.mode == MODE_ENRICH  # config.go:100-102
    assert sp.operation_name_attribute == "operation.name"
    assert sp.operation_type_attribute == "operation.type"
    assert sp.original_name_attribute == "name.original"


def test_invalid_mode_rejected():
    cfg = _cfg([_rule()], mode="replace")
    with pytest.raises(ValueError, match="invalid mode"):
        cfg.validate()


def test_valid_modes_accepted():
    for mode in (MODE_ENRICH, MODE_ENFORCE):
        cfg = _cfg([_rule()], mode=mode)
        cfg.validate()
        assert cfg.span_processing.mode == mode


def test_no_rules_rejected():
    cfg = _cfg([])
    with pytest.raises(ValueError, match="at least one rule"):
        cfg.validate()


def test_empty_rule_id_rejected():
    cfg = _cfg([_rule(id="")])
    with pytest.raises(ValueError, match="empty ID"):
        cfg.validate()


def test_duplicate_rule_id_rejected():
    cfg = _cfg([_rule(id="dup"), _rule(id="dup", priority=200)])
    with pytest.raises(ValueError, match="duplicate rule ID: dup"):
        cfg.validate()


def test_empty_condition_rejected():
    cfg = _cfg([_rule(condition="")])
    with pytest.raises(ValueError, match="empty condition"):
        cfg.validate()


def test_empty_operation_name_rejected():
    cfg = _cfg([_rule(operation_name="")])
    with pytest.raises(ValueError, match="empty operation_name"):
        cfg.validate()


def test_invalid_span_kind_rejected():
    cfg = _cfg([_rule(span_kind=["serverz"])])
    with pytest.raises(ValueError, match="invalid span_kind value: serverz"):
        cfg.validate()


def test_valid_span_kinds_accepted():
    cfg = _cfg([_rule(span_kind=["server", "client", "producer", "consumer", "internal"])])
    cfg.validate()


def test_rules_sorted_by_priority():
    # config.go:156-158 — lower number first.
    cfg = _cfg([_rule(id="b", priority=300), _rule(id="a", priority=100), _rule(id="c", priority=200)])
    cfg.validate()
    assert [r.id for r in cfg.span_processing.rules] == ["a", "c", "b"]


def test_disabled_span_processing_skips_validation():
    # config.go:86-90 — validation only runs when span_processing.enabled.
    cfg = Config(enabled=True, span_processing=SpanProcessingConfig(enabled=False, rules=[]))
    cfg.validate()


def test_reference_config_loads_and_sorts():
    cfg = reference_config()
    ids = [r.id for r in cfg.span_processing.rules]
    assert ids[0] == "http_server_routes"
    assert ids[-1] == "internal_operations"
    assert len(ids) == 18  # config.yaml:56-195
    prios = [r.priority for r in cfg.span_processing.rules]
    assert prios == sorted(prios)


def test_factory_parity_default_and_enabled_configs(spark):
    """factory_test.go:23-105 twins: the default config is disabled+
    non-benchmark and still constructs a working (identity) processor; an
    enabled config with no span_processing also constructs; metrics/logs
    'processors' are the passthrough."""
    from otel_semconvprocessor_spark.operators.exporters import passthrough
    from otel_semconvprocessor_spark.operators.rules import apply_rules

    # CreateDefaultConfig: Enabled=false, Benchmark=false
    default_cfg = Config()
    assert default_cfg.enabled is False and default_cfg.benchmark is False
    default_cfg.validate()  # constructs without error (wantErr: false)

    df = spark.createDataFrame(
        [("s1", "server", {"http.method": "GET"}, {})],
        "name string, kind string, attrs map<string,string>, resource map<string,string>",
    )
    # disabled processor == identity consumer (processor.go disabled gate)
    out = apply_rules(df, default_cfg)
    assert out.select("name").first()["name"] == "s1"

    # "enabled config" with empty span_processing constructs too
    enabled_cfg = Config(enabled=True)
    enabled_cfg.validate()
    assert apply_rules(df, enabled_cfg).count() == 1

    # CreateMetricsProcessor / CreateLogsProcessor: the timed no-op
    assert passthrough(df) is df
