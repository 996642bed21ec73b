"""Single-pass data-quality observation (`df.observe`).

A 100 TB curation pipeline cannot afford a second scan just to learn
"how many rows / how many nulls / what value range did this run see".
`Dataset.observe` attaches accumulator-backed aggregates to an existing
plan: the metrics are collected by the SAME action that produces the
output, at zero extra I/O (cf. the reference's malformed-row handling,
StreamingJob.java:75-77, which silently drops rows with no count at
all — our CSV source counts drops, this generalizes the idea to any
DataFrame).

Batch: read the `Observation` after any action. Streaming: the same
`observe` call surfaces per-micro-batch via
`StreamingQueryProgress.observedMetrics` (no listener required here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observe_quality(
    df: DataFrame,
    null_cols: list[str] | None = None,
    range_cols: list[str] | None = None,
    name: str = "quality",
) -> tuple[DataFrame, Observation | None]:
    """Attach row-count / per-column null-count / min-max metrics.

    Batch: returns ``(df_with_observation, observation)``; run any
    action on the returned DataFrame (or a plan built on it), then read
    ``observation.get`` — a dict like ``{"n_rows": ..., "nulls_x": ...,
    "min_x": ..., "max_x": ...}``.

    Streaming: the ``Observation`` class is batch-only, so the metrics
    are attached under the string ``name`` and the returned observation
    is ``None`` — read per-micro-batch values from
    ``StreamingQueryProgress.observedMetrics[name]`` instead.
    """
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    for c in null_cols or []:
        metrics.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"nulls_{c}")
        )
    for c in range_cols or []:
        metrics.append(F.min(c).alias(f"min_{c}"))
        metrics.append(F.max(c).alias(f"max_{c}"))
    if df.isStreaming:
        return df.observe(name, *metrics), None
    obs = Observation(name)
    return df.observe(obs, *metrics), obs
