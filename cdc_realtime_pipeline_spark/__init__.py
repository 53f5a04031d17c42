"""cdc_realtime_pipeline_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference CDC
pipeline (Aguantar/cdc-realtime-pipeline: MySQL → Debezium → Kafka →
Flink → ClickHouse → Grafana) as an idiomatic Apache Spark engine:

- batch analytics:   DataFrame / Spark SQL over Parquet (the ClickHouse
  + Grafana read path — SURVEY.md §2.2-2.5)
- CDC model:         Debezium-envelope JSON parsing via ``from_json``
  (reference CdcEventParser.java semantics — SURVEY.md §2.2 P1-P3)
- streaming:         Structured Streaming fan-out + stateful anomaly
  detection (reference CdcPipelineJob.java / AnomalyDetector.java)
- LLM-data ops:      dedup (exact / MinHash-LSH / SimHash / n-gram
  Jaccard), similarity search, text analysis, multimodal plumbing

Everything is public PySpark API; no custom Catalyst rules are needed
(SURVEY.md §4). Designed for 100 TB scale: declarative plans (predicate
pushdown / column pruning for free), broadcast joins for dims, partial
aggregation, no driver-side collects in any operator.
"""

__version__ = "0.1.0"
