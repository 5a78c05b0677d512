"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API): a
deterministic Kafka-envelope-shaped record generator.

Why it exists: the reference library runs inside a Kafka Connect worker
whose *source connectors* feed it records (SURVEY.md §0 — the worker owns
all I/O). Spark's Python DataSource API is the engine-side analog of that
pluggable-source contract: schema declaration, partition planning, and a
per-partition reader — demonstrated here end to end, broker-free.

The generator is fully deterministic (row content is a pure function of
the offset), so a DuckDB ``generate_series`` oracle reproduces the exact
table — the source can sit under any oracle-checked query.

Scale: ``partitions`` is the parallelism contract — each partition's
reader runs in its own task, exactly like one Kafka partition per task;
nothing is materialized on the driver.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

__all__ = ["EnvelopeGenSource", "register_envelope_source"]


def _gen_row(offset: int, pid: int):
    # THE row function: batch reader, stream reader, and replay all call
    # this, so batch/stream/recovery outputs are identical by construction
    return (offset, pid, f"user{offset % 50}", '{"k": %d}' % (offset % 100))


class _EnvelopePartition(InputPartition):
    def __init__(self, pid: int, start: int, rows: int):
        self.pid = pid
        self.start = start
        self.rows = rows


class _EnvelopeReader(DataSourceReader):
    def __init__(self, options):
        self.n_parts = int(options.get("partitions", 4))
        self.rows_per_part = int(options.get("rows_per_partition", 250))

    def partitions(self):
        return [
            _EnvelopePartition(p, p * self.rows_per_part, self.rows_per_part)
            for p in range(self.n_parts)
        ]

    def read(self, partition: _EnvelopePartition):
        # pure function of the offset -> deterministic, oracle-reproducible
        for i in range(partition.rows):
            offset = partition.start + i
            yield _gen_row(offset, partition.pid)


class _EnvelopeStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch offsets over the same deterministic generator — the
    Kafka-consumer shape: an offset checkpoint, a read from the last
    committed offset, and deterministic replay between offsets (exactly
    what the engine needs for end-to-end exactly-once on recovery).
    ``max_offset`` bounds the stream so availableNow runs terminate."""

    def __init__(self, options):
        self.rows_per_batch = int(options.get("rows_per_batch", 100))
        self.max_offset = int(options.get("max_offset", 1000))

    def initialOffset(self):
        return {"offset": 0}

    def read(self, start):
        s = int(start["offset"])
        e = min(s + self.rows_per_batch, self.max_offset)
        return iter([_gen_row(o, 0) for o in range(s, e)]), {"offset": e}

    def readBetweenOffsets(self, start, end):
        return iter([_gen_row(o, 0) for o in range(int(start["offset"]), int(end["offset"]))])


class EnvelopeGenSource(DataSource):
    """``spark.read.format("kcts_envelope")`` after registration."""

    @classmethod
    def name(cls) -> str:
        return "kcts_envelope"

    def schema(self) -> str:
        return "offset bigint, partition int, key string, value string"

    def reader(self, schema) -> DataSourceReader:
        return _EnvelopeReader(self.options)

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return _EnvelopeStreamReader(self.options)


def register_envelope_source(spark) -> None:
    spark.dataSource.register(EnvelopeGenSource)
