"""Custom Python DataSource: the reference's sample generator as a
first-class Spark source (Spark 4 ``pyspark.sql.datasource`` API).

The reference generates its input corpus offline in R
(``dataGeneration/psd.R``) and tails it as CSV
(``StreamingJob.java:433``). Here the same truncated-multivariate-t
model (already reimplemented in :mod:`psd_project_spark.fixtures.
generator`) is exposed as ``spark.read.format("psd_samples")`` — no
staging files, partition-parallel generation on the executors — and as
``spark.readStream.format("psd_samples")`` for a replayable streaming
feed (offset = row count, every micro-batch deterministic from its
offset, so checkpoint restart re-produces identical rows: the
exactly-once contract a real source must honor).

Determinism contract: rows are a pure function of
``(n, seed, partitions)`` — partition ``p`` generates its chunk from
seed ``seed*100003 + p`` with a global ``seq`` offset. That makes the
registry query (``psd_samples_source``) oracle-able with GOLDEN
literals computed once from the same pure function (integer-quantized
sums, so order never matters) — unlike parquet-table oracles, nothing
here depends on driver-regenerated testdata.

Scale notes: generation is embarrassingly parallel (one task per
chunk); the Gibbs sweep cost is per-row O(sweeps·dim²) numpy. A real
deployment points the same reader options at bigger n/partitions; no
driver involvement beyond planning.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

#: Column layout: seq + the 6 asset return series + weighted portfolio.
_SCHEMA_DDL = (
    "seq long, a1 double, a2 double, a3 double, a4 double, a5 double, "
    "a6 double, portfolio double"
)

_DEFAULTS = {"n": "10000", "seed": "7", "partitions": "8", "rows_per_batch": "2000"}


def _chunk_rows(n: int, parts: int) -> list[tuple[int, int]]:
    """(start, rows) per partition — contiguous seq ranges."""
    base, extra = divmod(n, parts)
    out, start = [], 0
    for p in range(parts):
        rows = base + (1 if p < extra else 0)
        out.append((start, rows))
        start += rows
    return out


def _gen_chunk(start: int, rows: int, seed: int, chunk_id: int):
    """Generate one chunk's rows (executor-side import: numpy + the
    fixture model run where the task runs, not on the driver)."""
    from psd_project_spark.fixtures.generator import (
        sample_returns,
        with_portfolio,
    )

    if rows <= 0:
        return
    x = with_portfolio(sample_returns(rows, seed=seed * 100003 + chunk_id))
    for i in range(rows):
        yield (start + i, *(float(v) for v in x[i]))


class _Chunk(InputPartition):
    def __init__(self, chunk_id: int, start: int, rows: int, seed: int):
        self.chunk_id = chunk_id
        self.start = start
        self.rows = rows
        self.seed = seed


class PsdSamplesReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", _DEFAULTS["n"]))
        self.seed = int(options.get("seed", _DEFAULTS["seed"]))
        self.parts = int(options.get("partitions", _DEFAULTS["partitions"]))

    def partitions(self) -> list[InputPartition]:
        return [
            _Chunk(p, start, rows, self.seed)
            for p, (start, rows) in enumerate(_chunk_rows(self.n, self.parts))
        ]

    def read(self, partition: _Chunk) -> Iterator[tuple]:
        yield from _gen_chunk(
            partition.start, partition.rows, partition.seed, partition.chunk_id
        )


class PsdSamplesStreamReader(SimpleDataSourceStreamReader):
    """Offset = total rows emitted. Each micro-batch is one chunk keyed
    by its batch index, so ``readBetweenOffsets`` (checkpoint replay)
    regenerates byte-identical rows."""

    def __init__(self, options):
        self.seed = int(options.get("seed", _DEFAULTS["seed"]))
        self.batch = int(options.get("rows_per_batch", _DEFAULTS["rows_per_batch"]))

    def initialOffset(self) -> dict:
        return {"rows": 0}

    def _full_batch(self, batch_id: int) -> list[tuple]:
        """One WHOLE batch — generation is vectorized over the batch's
        row count, so a partial range must be sliced from the full
        batch, never generated with a smaller n."""
        return list(
            _gen_chunk(batch_id * self.batch, self.batch, self.seed, batch_id)
        )

    def read(self, start: dict):
        off = int(start["rows"])
        assert off % self.batch == 0, "offsets advance whole batches"
        rows = self._full_batch(off // self.batch)
        return iter(rows), {"rows": off + self.batch}

    def readBetweenOffsets(self, start: dict, end: dict):
        off, stop = int(start["rows"]), int(end["rows"])
        out: list[tuple] = []
        for batch_id in range(off // self.batch, (stop - 1) // self.batch + 1):
            b0 = batch_id * self.batch
            rows = self._full_batch(batch_id)
            out.extend(rows[max(off, b0) - b0 : min(stop, b0 + self.batch) - b0])
        return iter(out)


class PsdSamplesDataSource(DataSource):
    """``format("psd_samples")`` — options: n, seed, partitions
    (batch); seed, rows_per_batch (streaming)."""

    @classmethod
    def name(cls) -> str:
        return "psd_samples"

    def schema(self) -> str:
        return _SCHEMA_DDL

    def reader(self, schema: StructType) -> PsdSamplesReader:
        return PsdSamplesReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> PsdSamplesStreamReader:
        return PsdSamplesStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration of the source with a session."""
    spark.dataSource.register(PsdSamplesDataSource)
