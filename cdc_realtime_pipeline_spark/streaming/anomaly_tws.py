"""Anomaly detector on the Spark 4 ``transformWithStateInPandas`` API.

Functionally identical to ``anomaly_stateful.apply_anomaly_detector``
(both delegate to the same pure rule function), expressed through the
newer StatefulProcessor surface — explicit named state handles with
schemas (and optional TTL), the engine's forward path for custom
stateful operators (SURVEY.md §2.4 W2). Kept alongside the
``applyInPandasWithState`` version so both APIs stay covered;
tests/test_streaming.py asserts the two produce identical alerts.

Environment gate: Spark's TWS Python runner imports ``google.protobuf``,
which this container lacks — ``tws_available()`` reports whether the
path can run; ``applyInPandasWithState`` is the active implementation
where it can't. The processor logic is shared either way.
"""


from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from cdc_realtime_pipeline_spark.streaming.anomaly_stateful import (
    ALERT_OUT_SCHEMA,
    detect_anomalies_batch_of_key,
)

_STATE_SCHEMA = (
    "last_price double, ema double, n_samples long, window_start_ms long, window_count long"
)


def tws_available() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


class AnomalyProcessor(StatefulProcessor):
    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("detector", _STATE_SCHEMA)

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        market = key[0]
        if self._state.exists():
            lp, ema, n, ws, wc = self._state.get()
            st = {
                "last_price": lp,
                "ema": ema,
                "n_samples": n or 0,
                "window_start_ms": ws,
                "window_count": wc or 0,
            }
        else:
            st = {}
        pdf = pd.concat(list(rows), ignore_index=True)
        alerts, st = detect_anomalies_batch_of_key(market, pdf, st)
        self._state.update(
            (
                st.get("last_price"),
                st.get("ema"),
                st.get("n_samples", 0),
                st.get("window_start_ms"),
                st.get("window_count", 0),
            )
        )
        if alerts:
            yield pd.DataFrame(alerts)

    def close(self) -> None:
        pass


def apply_anomaly_detector_tws(parsed: DataFrame) -> DataFrame:
    """parsed CDC events → alert stream via transformWithStateInPandas."""
    inserts = parsed.filter(F.col("op") == "c")
    return inserts.groupBy("market").transformWithStateInPandas(
        statefulProcessor=AnomalyProcessor(),
        outputStructType=ALERT_OUT_SCHEMA,
        outputMode="append",
        timeMode="none",
    )
