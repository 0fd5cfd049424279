"""Custom connector via the Python DataSource API (Spark 4): a seeded
synthetic events source.

The reference's only "source" is a caller-built in-memory array
(Simple.pm:536-546); this is the engine's extensible-connector answer —
the same API surface a REST/queue/proprietary-format connector would
implement. Demonstrated properties:

* **partition planning**: the row range splits into N partitions, each
  generated independently on executors (nothing flows through the
  driver);
* **deterministic content**: every partition seeds its RNG with
  (seed, partition_id), so the same options always yield the same table
  — which is what makes a synthetic source testable;
* **filter pushdown hook**: `pushFilters` accepts equality filters on
  `event_type` so the generator skips non-matching rows at the source
  (the Python-API analogue of parquet PushedFilters).

Usage::

    spark.dataSource.register(SyntheticEventsDataSource)
    df = (spark.read.format("synthetic_events")
          .option("rows", 10000).option("partitions", 8)
          .option("seed", 42).load())
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
)
from pyspark.sql.types import StructType

EVENT_TYPES = ("view", "click", "purchase", "signup", "error")

SCHEMA_DDL = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _gen_rows(seed: int, start: int, end: int, n_users: int):
    """THE row generator — shared by the batch and stream readers so the
    streaming twin cannot drift from the batch source the
    stream-vs-batch equivalence tests compare against. Row content is a
    pure function of (seed, GLOBAL row index) — each row re-seeds its
    own tiny RNG — so the (global-row-range → rows) mapping really is
    identical however the range is partitioned into batches/splits. A
    per-SPLIT sequential stream (the earlier form) silently violated
    that: row i's values depended on the split boundary it landed
    behind, so the same options with a different ``partitions`` value,
    or the stream reader's different batch boundaries, generated a
    different table for the same seed."""
    import random
    from datetime import datetime, timedelta

    base = datetime(2024, 1, 1)
    for i in range(start, end):
        rng = random.Random(seed * 1_000_003 + i)
        etype = EVENT_TYPES[rng.randrange(len(EVENT_TYPES))]
        ts = base + timedelta(seconds=rng.randrange(30 * 24 * 3600))
        user = rng.randrange(n_users)
        value = round(rng.random() * 500, 2)
        props = '{"k": %d}' % rng.randrange(100)
        yield (i, ts, user, etype, value, props)


def _positive(options: dict, key: str, default: int) -> int:
    v = int(options.get(key, default))
    if v <= 0:
        raise ValueError(f"synthetic_events: option {key!r} must be positive, got {v}")
    return v


def _split_range(start: int, n_rows: int, n_parts: int) -> list[tuple[int, int]]:
    """THE row-range splitter — shared by the batch reader and the stream
    reader's per-batch planning (the _gen_rows discipline applied to
    split planning: one copy, so a change to remainder distribution
    cannot silently diverge the two readers). First ``n_rows % n_parts``
    splits get one extra row."""
    per, rem = divmod(n_rows, n_parts)
    out = []
    s = start
    for i in range(n_parts):
        e = s + per + (1 if i < rem else 0)
        out.append((s, e))
        s = e
    return out



class SyntheticEventsReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.n_rows = _positive(options, "rows", 1000)
        self.n_parts = _positive(options, "partitions", 4)
        self.seed = int(options.get("seed", 42))
        # validated like partitions: users=0 would surface as an opaque
        # randrange(0) ValueError inside executor tasks at read time
        self.n_users = _positive(options, "users", 100)
        # ALL pushed equality values (the pushFilters contract is the AND
        # of the accepted filters — keeping only the last one would
        # silently drop earlier pushed-and-trusted predicates; two
        # different values make the conjunction unsatisfiable → 0 rows)
        self.type_filters: set[str] | None = None

    def pushFilters(self, filters):  # noqa: N802 (API name)
        from pyspark.sql.datasource import EqualTo

        remaining = []
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("event_type",):
                if self.type_filters is None:
                    self.type_filters = set()
                self.type_filters.add(f.value)
            else:
                remaining.append(f)
        return remaining

    def partitions(self):
        from pyspark.sql.datasource import InputPartition

        return [
            InputPartition(se) for se in _split_range(0, self.n_rows, self.n_parts)
        ]

    def read(self, partition):
        start, end = partition.value
        if self.type_filters is not None and len(self.type_filters) > 1:
            return  # contradictory equality conjunction: no row matches
        for row in _gen_rows(self.seed, start, end, self.n_users):
            if self.type_filters is not None and row[3] not in self.type_filters:
                continue  # pushdown: skip at the source
            yield row


class SyntheticEventsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema: StructType) -> DataSourceReader:
        return SyntheticEventsReader(schema, self.options)

    def streamReader(self, schema: StructType):  # noqa: N802
        return SyntheticEventsStreamReader(schema, self.options)


def register(spark) -> None:
    """Register the connector (and enable the Python-source filter
    pushdown flag its pushFilters hook requires)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SyntheticEventsDataSource)


class SyntheticEventsStreamReader(DataSourceStreamReader):
    """Micro-batch stream reader for the same synthetic source: offsets
    are batch indices; each batch generates ``rows`` deterministic rows
    across ``partitions`` splits (same seeding discipline as the batch
    reader). ``batches`` bounds the stream so availableNow drains and
    terminates — the shape of any replayable offset-based source (Kafka:
    replace batch index with topic offsets)."""

    def __init__(self, schema, options: dict):
        # explicit rows_per_batch option preferred; 'rows' accepted with
        # the SAME per-batch meaning for back-compat — NOTE it differs
        # from the batch reader, where 'rows' is the TOTAL (stream total
        # = rows_per_batch × batches). Validated like every other knob:
        # a negative value would silently yield an empty stream.
        self.rows_per_batch = _positive(
            options, "rows_per_batch" if "rows_per_batch" in options else "rows", 100
        )
        self.n_parts = _positive(options, "partitions", 2)
        self.seed = int(options.get("seed", 42))
        self.n_users = _positive(options, "users", 100)
        self.max_batches = _positive(options, "batches", 3)

    def initialOffset(self):  # noqa: N802
        return {"batch": 0}

    def latestOffset(self):  # noqa: N802
        return {"batch": self.max_batches}

    def partitions(self, start: dict, end: dict):
        from pyspark.sql.datasource import InputPartition

        return [
            InputPartition(se)
            for b in range(start["batch"], end["batch"])
            for se in _split_range(
                b * self.rows_per_batch, self.rows_per_batch, self.n_parts
            )
        ]

    def read(self, partition):
        start, end = partition.value
        yield from _gen_rows(self.seed, start, end, self.n_users)

    def commit(self, end: dict) -> None:
        pass
