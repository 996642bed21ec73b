"""Alert-log text sink + re-parsing source (reference S4/S6 as a
custom Python DataSource with a commit protocol).

The reference "persists" alerts by printing Flink tuples to stdout
(``dataStream.print()``, StreamingJob.java:439) and later re-parses
the captured text by string slicing (postProcessing/load.py:15-26).
This module recreates that wire format as a *real* sink:

- ``df.write.format("psd_alert_log").option("path", dir)`` writes one
  text file per partition with lines
  ``(seq,measure,user_id,measure_value,ref_value)`` — the reference's
  tuple text, extended with the reference stat, floats in
  ``repr`` form so the round-trip is bit-exact.
- Task outputs land as ``_tmp-*`` files; the driver-side ``commit``
  renames them to ``part-NNNNN.txt`` and writes a ``_SUCCESS``
  manifest, ``abort`` removes the temporaries — the same
  task-attempt/commit discipline Spark's own FileCommitProtocol
  applies (on a cluster the rename step becomes an object-store
  manifest commit; the message flow is identical).
- ``spark.read.format("psd_alert_log")`` lists the manifest and
  re-parses one file per input partition (S6's parser, distributed).

``alert_log_roundtrip`` stages the batch alert stream through this
format and re-aggregates the PARSED text; its DuckDB oracle recomputes
the same aggregate from the raw parquet tables — green means the
sink/parser loop is lossless down to the last bit of every double.
"""

from __future__ import annotations

import os
import uuid
from dataclasses import dataclass
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

_SCHEMA_DDL = (
    "seq long, measure string, user_id long, measure_value double, "
    "ref_value double"
)


@dataclass
class _FileCommit(WriterCommitMessage):
    tmp_path: str
    rows: int


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class AlertLogWriter(DataSourceWriter):
    """Batch writer with real append/overwrite semantics.

    Final part names carry a per-job uuid, so a second ``append`` job
    into the same directory can never clobber an earlier job's parts;
    the ``_SUCCESS`` manifest is merged (append) or replaced with the
    prior job's parts deleted (overwrite) — both via atomic rename.
    """

    def __init__(self, options, overwrite: bool = False):
        self.path = options["path"]
        self.overwrite = overwrite
        self.job_id = uuid.uuid4().hex[:12]

    def write(self, rows: Iterator) -> _FileCommit:
        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, f"_tmp-{uuid.uuid4().hex}.txt")
        n = 0
        with open(tmp, "w") as fh:
            for r in rows:
                fh.write(
                    f"({r.seq},{r.measure},{r.user_id},"
                    f"{r.measure_value!r},{r.ref_value!r})\n"
                )
                n += 1
        return _FileCommit(tmp, n)

    def commit(self, messages: list[_FileCommit]) -> None:
        manifest = os.path.join(self.path, "_SUCCESS")
        prior: list[str] = []
        if os.path.exists(manifest):
            with open(manifest) as fh:
                prior = [line.rstrip("\n") for line in fh if line.strip()]
        finals = []
        for i, m in enumerate(messages):
            final = os.path.join(
                self.path, f"part-{self.job_id}-{i:05d}.txt"
            )
            os.replace(m.tmp_path, final)
            finals.append((os.path.basename(final), m.rows))
        if self.overwrite:
            for line in prior:
                stale = os.path.join(self.path, line.split("\t")[0])
                if os.path.exists(stale):
                    os.remove(stale)
            prior = []
        tmp_manifest = manifest + f".tmp-{self.job_id}"
        with open(tmp_manifest, "w") as fh:
            for line in prior:
                fh.write(line + "\n")
            for name, rows in finals:
                fh.write(f"{name}\t{rows}\n")
        os.replace(tmp_manifest, manifest)

    def abort(self, messages: list[_FileCommit]) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.tmp_path):
                os.remove(m.tmp_path)


class AlertLogStreamWriter(DataSourceStreamWriter):
    """Epoch-keyed variant for ``writeStream``: each micro-batch
    commits a ``_SUCCESS-epoch-N`` manifest naming that epoch's files.
    A REPLAYED epoch (failure between sink write and checkpoint
    commit) deletes the previous attempt's files and replaces the
    manifest — the sink is idempotent per epoch, which is exactly the
    foreachBatch discipline, expressed at the DataSource API level."""

    def __init__(self, options):
        self.path = options["path"]

    def write(self, rows: Iterator) -> _FileCommit:
        return AlertLogWriter({"path": self.path}).write(rows)

    def commit(self, messages: list[_FileCommit], batchId: int) -> None:
        manifest = os.path.join(self.path, f"_SUCCESS-epoch-{batchId}")
        if os.path.exists(manifest):
            with open(manifest) as fh:
                for line in fh:
                    if line.strip():
                        stale = os.path.join(self.path, line.split("\t")[0])
                        if os.path.exists(stale):
                            os.remove(stale)
        finals = []
        for i, m in enumerate(messages):
            final = os.path.join(
                self.path, f"epoch-{batchId}-part-{i:05d}.txt"
            )
            os.replace(m.tmp_path, final)
            finals.append((os.path.basename(final), m.rows))
        tmp_manifest = manifest + ".tmp"
        with open(tmp_manifest, "w") as fh:
            for name, rows in finals:
                fh.write(f"{name}\t{rows}\n")
        os.replace(tmp_manifest, manifest)

    def abort(self, messages: list[_FileCommit], batchId: int) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.tmp_path):
                os.remove(m.tmp_path)


class AlertLogReader(DataSourceReader):
    def __init__(self, options):
        self.path = options["path"]

    def partitions(self) -> list[InputPartition]:
        names: list[str] = []
        for entry in sorted(os.listdir(self.path)):
            if entry == "_SUCCESS" or entry.startswith("_SUCCESS-epoch-"):
                with open(os.path.join(self.path, entry)) as fh:
                    names += [
                        line.split("\t")[0] for line in fh if line.strip()
                    ]
        return [_FilePartition(os.path.join(self.path, n)) for n in names]

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        with open(partition.path) as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                seq, measure, user_id, mv, rv = line[1:-1].split(",")
                yield (int(seq), measure, int(user_id), float(mv), float(rv))


class AlertLogDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "psd_alert_log"

    def schema(self) -> str:
        return _SCHEMA_DDL

    def reader(self, schema: StructType) -> AlertLogReader:
        return AlertLogReader(self.options)

    def writer(self, schema: StructType, overwrite: bool) -> AlertLogWriter:
        return AlertLogWriter(self.options, overwrite=overwrite)

    def streamWriter(self, schema: StructType, overwrite: bool) -> AlertLogStreamWriter:
        return AlertLogStreamWriter(self.options)


def register(spark) -> None:
    spark.dataSource.register(AlertLogDataSource)


# --- round-trip registry query ----------------------------------------------

def _stage_dir(sf_dir: str) -> str:
    """Content-fingerprinted staging (same invalidation discipline as
    the ORC staging: driver regenerates testdata in place)."""
    st = os.stat(os.path.join(sf_dir, "events.parquet"))
    key = (
        f"{sf_dir.strip('/').replace('/', '_')}"
        f"_{st.st_mtime_ns}_{st.st_size}"
    )
    return f"/tmp/psd_alert_log/{key}"


def alert_log_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """alerts → reference-format text sink → distributed re-parse →
    per-(series, measure) aggregate. The oracle recomputes the same
    aggregate straight from parquet, so every float must survive the
    print/parse cycle bit-exactly."""
    from psd_project_spark.operators.risk import alerts_batch

    register(spark)
    out = _stage_dir(sf_dir)
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        (
            alerts_batch(spark, sf_dir)
            .select("seq", "measure", "user_id", "measure_value", "ref_value")
            .write.format("psd_alert_log")
            .option("path", out)
            .mode("append")
            .save()
        )
    parsed = spark.read.format("psd_alert_log").option("path", out).load()
    return (
        parsed.groupBy("user_id", "measure")
        .agg(
            F.count(F.lit(1)).alias("n_alerts"),
            F.round(
                F.sum(F.col("measure_value").cast("decimal(27,15)")).cast(
                    "double"
                ),
                6,
            ).alias("sum_value"),
        )
        .orderBy("user_id", "measure")
    )


def _roundtrip_oracle() -> str:
    from psd_project_spark.operators.risk import _alerts_oracle

    return f"""
WITH alerts AS ({_alerts_oracle()})
SELECT user_id, measure,
       count(*) AS n_alerts,
       CAST(CAST(round(CAST(CAST(CAST(CAST(sum(CAST(CAST(measure_value AS STRING) AS DECIMAL(27,15))) AS STRING) AS DOUBLE) AS STRING) AS DECIMAL(38,21)), 6) AS STRING) AS DOUBLE)
         AS sum_value
FROM alerts
GROUP BY 1, 2
ORDER BY 1, 2
"""


QUERIES = {
    "alert_log_roundtrip": (alert_log_roundtrip, _roundtrip_oracle()),
}
