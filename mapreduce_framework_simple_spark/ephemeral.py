"""Query-scoped cache registry — storage hygiene for long-lived sessions.

``DataFrame.cache()`` registers the plan in Spark's CacheManager, which —
unlike RDD/localCheckpoint blocks — is NOT released when the Python handle
is garbage-collected. A query function that caches an intermediate and
returns a LAZY result cannot unpersist before returning without losing the
cache, so any consumer that runs many queries in one session (the round
driver's 125-query sweep, bench.py, the full oracle suite, a production
query service) would accumulate dead cached frames in executor storage.

Protocol:

* query internals wrap intra-query caches in :func:`scoped_cache` instead
  of calling ``.cache()`` directly;
* harness loops call :func:`release_caches` once the previous query's
  result is materialized — ``__spark_entry__.queries()`` wraps every
  callable to do this at CALL TIME, so even the external round driver
  (which we cannot hook) holds at most one query's caches at any moment.

Composition stays safe: queries that build on other queries (q107/q112/
q126 re-run q38) call the raw functions, not the wrapped ``queries()``
entries, so an outer query's caches are never dropped mid-flight by an
inner call. ``unpersist`` on an already-released frame is a Spark no-op,
so operators that additionally unpersist eagerly (connected_components'
per-round discipline) can keep doing so.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame

_SCOPED: list[DataFrame] = []


@contextmanager
def cache_scope():
    """Release every scoped cache registered inside the block on exit —
    for self-contained multi-query passes (pipeline.curate) that must
    not leave their internal caches behind, without touching caches an
    enclosing consumer registered earlier."""
    mark = len(_SCOPED)
    try:
        yield
    finally:
        while len(_SCOPED) > mark:
            df = _SCOPED.pop()
            try:
                df.unpersist(blocking=False)
            except Exception:
                pass


def scoped_cache(df: DataFrame) -> DataFrame:
    """``df.cache()`` + register the handle for the next :func:`release_caches`."""
    df = df.cache()
    _SCOPED.append(df)
    return df


def release_caches() -> int:
    """Unpersist every scoped cache registered since the last call.

    Non-blocking (block deletion proceeds async on the executors); returns
    the number of frames released. Safe to call at any query boundary —
    by then the previous query's result has been materialized by its
    consumer, so its caches are dead weight."""
    n = 0
    while _SCOPED:
        df = _SCOPED.pop()
        try:
            df.unpersist(blocking=False)
            n += 1
        except Exception:  # session already stopped — nothing to release
            pass
    return n
