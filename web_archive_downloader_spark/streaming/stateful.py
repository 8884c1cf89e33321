"""Custom stateful streaming operator: per-host token-bucket
politeness gate via ``applyInPandasWithState``.

The batch engine enforces politeness relationally (per-epoch per-host
top-k, operators/schedule.py). In a continuously-fed deployment the
same budget can be enforced on a fetch-request STREAM: state per host
= (window_start_epoch_sec, tokens_left); requests beyond the budget
within a window are emitted as ``granted=false`` (to be re-queued by
the feeder). Token refill: ``budget`` tokens per ``window_sec``.

Deterministic given a deterministic request stream order (tests feed
availableNow over static files with a fixed per-file ordering).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("req_sec", T.LongType()),
        T.StructField("granted", T.BooleanType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("window_start", T.LongType()),
        T.StructField("tokens_left", T.LongType()),
    ]
)


def make_rate_limiter(budget: int, window_sec: int):
    """Returns the applyInPandasWithState function closure."""

    def limiter(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            window_start, tokens = state.get
        else:
            window_start, tokens = -1, 0
        out_rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["req_sec", "url"])
            for r in pdf.itertuples(index=False):
                sec = int(r.req_sec)
                win = sec - sec % window_sec
                if win != window_start:
                    window_start, tokens = win, budget
                granted = tokens > 0
                if granted:
                    tokens -= 1
                out_rows.append((key[0], r.url, sec, granted))
        state.update((window_start, tokens))
        yield pd.DataFrame(out_rows, columns=["host", "url", "req_sec", "granted"])

    return limiter


def rate_limit_stream(requests: DataFrame, budget: int, window_sec: int) -> DataFrame:
    """requests(host, url, req_sec) -> same rows + granted flag.
    Works on a streaming DataFrame (stateful) and, for tests, on a
    static one via the same grouping semantics."""
    return requests.groupBy("host").applyInPandasWithState(
        make_rate_limiter(budget, window_sec),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
