from cdc_realtime_pipeline_spark.cdc.envelope import (  # noqa: F401
    parse_cdc_events,
    synthesize_cdc_json_from_events,
)
