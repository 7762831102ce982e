"""otel_semconvprocessor_spark — a brand-new PySpark-native engine with the
query/data-processing capabilities of cedricziel/otel-semconvprocessor,
re-expressed as a batch parse -> enrich -> route -> aggregate pipeline over
Common-Crawl-style web pages (see SURVEY.md / BASELINE.json).

Layout
  config.py       rule/processor config model + validation (config.go parity)
  functions/      scalar Column builders + the OTTL-subset -> Column compiler
  operators/      rules cascade, extraction, enrich, route, metrics,
                  dedup / similarity / text-analysis training-data ops
  sources/        synthetic pages generator + testdata loaders
  plans/          end-to-end pipeline + checkpoint/resume
  streaming/      Structured Streaming variant
"""

from .config import Config, OTTLRule, SpanProcessingConfig, reference_config, reference_rules

__all__ = [
    "Config",
    "OTTLRule",
    "SpanProcessingConfig",
    "reference_config",
    "reference_rules",
]
