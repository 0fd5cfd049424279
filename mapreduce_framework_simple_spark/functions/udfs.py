"""UDF parity surface + the reference's own showcase workloads.

The reference IS a UDF mechanism — deparse the closure, ship it, eval it
(Simple.pm:164,408) — so this module carries the workloads its docs/tests
actually run through that mechanism:

* q60: the t/01_basic.t sum/count/avg golden test through the
  ``map_reduce`` parity API (reference t/01_basic.t:8-51).
* q61: the prime-summation example (Simple.pm:836-929), vectorized as an
  Arrow-batched pandas_udf instead of a per-element loop.
* q62: the PDL matrix-inversion example (Simple.pm:756-828), re-expressed
  as numpy over ArrayType columns via a scalar pandas_udf.
* q63: word count through mapInPandas — proving the UDF surface and the
  declarative surface (q30) produce identical results.

Everything here crosses the JVM↔Python boundary in Arrow batches; none
of it is a row-at-a-time Python UDF.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mapreduce_framework_simple_spark.operators.mapreduce import MapReduceEngine
from mapreduce_framework_simple_spark.operators.text import DUCK_TOKS
from mapreduce_framework_simple_spark.registry import query
from mapreduce_framework_simple_spark.sources.io import load_table

# ---------------------------------------------------------------------------
# q60 — t/01_basic.t port through the map_reduce parity API
# ---------------------------------------------------------------------------

@query(
    "q60_mapreduce_basic",
    oracle="""
    SELECT 22000.0 AS sum_value, CAST(4000 AS BIGINT) AS num_value, 5.5 AS avg_value
    """,
)
def q60_mapreduce_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact port of reference t/01_basic.t:8-51: 4 chunks × 1000 elements
    of 5.5; mapper emits per-chunk {sum,num,avg}, reducer merges — the
    hand-written partial+final aggregation pattern. The oracle is the
    test's own golden triple (sum=22000, num=4000, avg=5.5)."""
    chunks = [[5.5] * 1000 for _ in range(4)]

    def mapper(chunk: list[float]) -> dict[str, float]:
        total = sum(chunk)
        num = len(chunk)
        return {"sum": total, "num": num, "avg": total / num}

    def reducer(mapped: list[dict[str, float]]) -> dict[str, float]:
        total = sum(m["sum"] for m in mapped)
        num = sum(m["num"] for m in mapped)
        return {"sum": total, "num": num, "avg": total / num if num else 0.0}

    res = MapReduceEngine(spark).map_reduce(chunks, mapper, reducer, 4, pre_chunked=True)
    return spark.createDataFrame(
        [(float(res["sum"]), int(res["num"]), float(res["avg"]))],
        T.StructType([
            T.StructField("sum_value", T.DoubleType()),
            T.StructField("num_value", T.LongType()),
            T.StructField("avg_value", T.DoubleType()),
        ]),
    )


# ---------------------------------------------------------------------------
# q61 — prime summation (Simple.pm:836-929), vectorized
# ---------------------------------------------------------------------------

PRIME_LO = 1_000_001
PRIME_HI = 1_030_001  # exclusive; scaled from the POD's 300k-range for tests

# Oracle trial-division bound DERIVED from PRIME_HI (exclusive end ⇒ the
# largest candidate needs divisors up to isqrt(PRIME_HI - 1)) — the same
# single-source discipline as CHUNK_TOKENS/STOPWORDS: a literal bound
# here once left ~0.8% headroom before a PRIME_HI retune would make the
# oracle under-divide and count composites as prime.
import math as _math

_PRIME_TRIAL_END = _math.isqrt(PRIME_HI - 1) + 1  # range() end, exclusive


@query(
    "q61_prime_sum",
    oracle=f"""
    SELECT CAST(sum(n) AS BIGINT) AS prime_sum, CAST(count(*) AS BIGINT) AS n_primes
    FROM range({PRIME_LO}, {PRIME_HI}) t(n)
    WHERE NOT EXISTS (
        SELECT 1 FROM range(2, {_PRIME_TRIAL_END}) d(d)
        WHERE d.d * d.d <= n AND n % d.d = 0
    )
    """,
)
def q61_prime_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sum of primes in [1,000,001, 1,030,001) — the reference's benchmark
    workload (Simple.pm:836-929), where its mapper trial-divides one
    number at a time by EVERY integer. Here: the same segmented-sieve
    kernel as ``tools/prime_bench.py`` (one kernel, both places —
    optimization round 12, guide §4.2): each Arrow batch sieves the
    primes below √max once, then — because ``spark.range`` hands every
    batch a CONTIGUOUS value span — sieves the span itself (mark
    multiples of each base prime: O(span · Σ 1/p) ≈ 3 ops per candidate)
    instead of trial-dividing each candidate by every base prime
    (~3.4k mods per candidate at the 1e9 bench range). A batch whose
    span is far wider than its row count (nothing in this repo produces
    one) falls back to the round-11 blocked outer-mod, so the kernel
    stays correct on arbitrary inputs; both paths are equality-tested
    in test_properties."""
    return (
        spark.range(PRIME_LO, PRIME_HI)
        .withColumnRenamed("id", "n")
        .where(prime_predicate_udf()(F.col("n")))
        .agg(F.sum("n").alias("prime_sum"), F.count("*").alias("n_primes"))
    )


def prime_predicate_udf():
    """Factory for q61's primality pandas_udf — a FUNCTION so tests can
    apply the kernel to arbitrary frames (exercising both the segmented
    and the sparse-fallback paths), while the returned UDF's closure
    stays fully self-contained (no module references — the repo is not
    on executor PYTHONPATH for external consumers)."""

    @F.pandas_udf(T.BooleanType())
    def is_prime(s: pd.Series) -> pd.Series:
        import math

        import numpy as np

        n = s.to_numpy(dtype=np.int64)
        if len(n) == 0:
            return pd.Series(np.zeros(0, dtype=bool))
        lo, hi = int(n.min()), int(n.max())
        if hi < 2:  # all values < 2: no primes, and isqrt(hi<0) would raise
            return pd.Series(np.zeros(len(n), dtype=bool))
        limit = math.isqrt(hi) + 1
        sieve = np.ones(limit + 1, dtype=bool)
        sieve[:2] = False
        for p in range(2, math.isqrt(limit) + 1):
            if sieve[p]:
                sieve[p * p:: p] = False
        primes = np.nonzero(sieve)[0].astype(np.int64)
        span = hi - lo + 1
        if span <= 8 * len(n) + 1024:
            # segmented sieve over [lo, hi]: start each prime's marking
            # at max(p², first multiple ≥ lo) so an in-range prime never
            # marks itself; values < 2 are masked below
            seg = np.ones(span, dtype=bool)
            for p in primes.tolist():
                start = max(p * p, ((lo + p - 1) // p) * p)
                if start <= hi:
                    seg[start - lo:: p] = False
            out = seg[n - lo]
        else:
            # sparse batch: blocked outer-mod (bounded temporaries);
            # the n==p guard only matters when a candidate can BE a
            # sieve prime (n ≤ √max) — skip the comparison otherwise
            out = np.ones(len(n), dtype=bool)
            block = 512
            overlap = lo <= int(primes[-1]) if len(primes) else False
            for i in range(0, len(primes), block):
                pb = primes[i: i + block]
                nz = n[:, None] % pb[None, :] != 0
                if overlap:
                    nz |= n[:, None] == pb[None, :]
                out &= nz.all(axis=1)
        return pd.Series(out & (n >= 2))

    return is_prime


# ---------------------------------------------------------------------------
# q62 — matrix inversion over array columns (Simple.pm:756-828 parity)
# ---------------------------------------------------------------------------

@query(
    "q62_matrix_inverse",
    oracle="""
    WITH m AS (
        SELECT vec_id,
               CAST(embedding[1] AS DOUBLE) + 10 AS a, CAST(embedding[2] AS DOUBLE) AS b, CAST(embedding[3] AS DOUBLE) AS c,
               CAST(embedding[4] AS DOUBLE) AS d, CAST(embedding[5] AS DOUBLE) + 10 AS e, CAST(embedding[6] AS DOUBLE) AS f,
               CAST(embedding[7] AS DOUBLE) AS g, CAST(embedding[8] AS DOUBLE) AS h, CAST(embedding[9] AS DOUBLE) + 10 AS i
        FROM embeddings
    )
    SELECT vec_id,
           round(a*(e*i - f*h) - b*(d*i - f*g) + c*(d*h - e*g), 6) AS det,
           round((e*i - f*h) / (a*(e*i - f*h) - b*(d*i - f*g) + c*(d*h - e*g)), 6) AS inv00
    FROM m
    """,
)
def q62_matrix_inverse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row 3×3 matrix inversion — the Spark re-expression of the
    reference's PDL matrix example (map: invert each matrix,
    Simple.pm:756-828). Matrices are built from the first 9 embedding
    components with +10 on the diagonal (diagonal dominance → invertible).
    numpy LU inside a scalar pandas_udf.

    Determinism: the EMITTED det/inv00 are computed with the closed-form
    adjugate in the oracle's exact operation order (elementwise IEEE
    doubles → bit-identical on both engines), because LU-with-pivoting
    and cofactor expansion differ in low-order bits — a value landing
    within that error of a 0.5e-6 rounding boundary would round apart
    and flake the hash compare (probability grows with row count). The
    np.linalg LU inversion still runs as the actual PDL-parity work and
    is cross-checked against the adjugate in-batch (fail-fast, never
    fail-silent)."""

    out_t = T.StructType([
        T.StructField("det", T.DoubleType()),
        T.StructField("inv00", T.DoubleType()),
    ])

    @F.pandas_udf(out_t)
    def inv3(emb: pd.Series) -> pd.DataFrame:
        if len(emb) == 0:  # empty Arrow batch: np.stack([]) would raise
            return pd.DataFrame({"det": pd.Series(dtype="float64"),
                                 "inv00": pd.Series(dtype="float64")})
        mats = np.stack(
            [np.asarray(v[:9], dtype=np.float64).reshape(3, 3) + np.eye(3) * 10 for v in emb]
        )
        a, b, c = mats[:, 0, 0], mats[:, 0, 1], mats[:, 0, 2]
        d, e, f = mats[:, 1, 0], mats[:, 1, 1], mats[:, 1, 2]
        g, h, i = mats[:, 2, 0], mats[:, 2, 1], mats[:, 2, 2]
        dets = a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)
        inv00 = (e * i - f * h) / dets
        invs = np.linalg.inv(mats)  # the real LU inversion (PDL parity)
        if not np.allclose(invs[:, 0, 0], inv00, rtol=1e-9, atol=1e-12):
            raise AssertionError(
                "q62: LU inverse disagrees with the adjugate closed form"
            )
        def half_up6(x):
            # HALF_UP at 6 dp, matching DuckDB round() (half away from
            # zero) and Spark F.round — np.round is half-to-even, which
            # would hash a det landing exactly on a .5 micro boundary
            # apart from the oracle
            return np.sign(x) * np.floor(np.abs(x) * 1e6 + 0.5) / 1e6

        return pd.DataFrame({
            "det": half_up6(dets),
            "inv00": half_up6(inv00),
        })

    em = load_table(spark, "embeddings", sf_dir)
    return em.select("vec_id", inv3(F.col("embedding")).alias("r")).select(
        "vec_id", F.col("r.det").alias("det"), F.col("r.inv00").alias("inv00")
    )


# ---------------------------------------------------------------------------
# q63 — word count through mapInPandas (UDF surface ≡ declarative surface)
# ---------------------------------------------------------------------------

@query(
    "q63_word_count_pandas",
    oracle=f"""
    WITH toks AS (SELECT {DUCK_TOKS} AS toks FROM documents),
    words AS (SELECT unnest(toks) AS word FROM toks)
    SELECT word, CAST(count(*) AS BIGINT) AS cnt
    FROM words GROUP BY word
    """,
)
def q63_word_count_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word count with the tokenizer inside mapInPandas — the faithful
    "mapper closure" surface (chunk in, partial counts out), with the
    final merge left to a declarative groupBy. Matching q30's oracle
    proves the UDF path and the built-in path coincide.

    Scale: each Arrow batch emits (word, partial_count) — the map-side
    combine the reference's users had to hand-write (t/01_basic.t
    pattern) — so the shuffle is bounded by distinct words, not tokens."""

    schema = T.StructType([
        T.StructField("word", T.StringType()),
        T.StructField("partial", T.LongType()),
    ])

    def tokenize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import re

        # ASCII-only \s, matching the canonical tokenizer: Java regex \s
        # (tokens_expr) and DuckDB's RE2 \s are ASCII-only, while Python's
        # default \s is unicode-aware — an NBSP/ideographic space would
        # split here but nowhere else. No .strip(): Python strip removes
        # unicode whitespace Java trim keeps; the empty-token filter makes
        # leading/trailing ASCII whitespace irrelevant in every engine.
        ascii_ws = re.compile(r"\s+", re.ASCII)
        for pdf in batches:
            toks = pdf["text"].str.lower().str.split(ascii_ws).explode()
            toks = toks[toks.notna() & (toks != "")]
            counts = toks.value_counts()
            yield pd.DataFrame({"word": counts.index, "partial": counts.to_numpy()})

    docs = load_table(spark, "documents", sf_dir).select("text")
    return (
        docs.mapInPandas(tokenize, schema)
        .groupBy("word")
        .agg(F.sum("partial").cast("long").alias("cnt"))
    )


# ---------------------------------------------------------------------------
# q64/q65 — grouped UDF surfaces (applyInPandas / grouped-agg pandas_udf)
# ---------------------------------------------------------------------------

@query(
    "q64_apply_in_pandas",
    oracle="""
    SELECT l_returnflag,
           sum(l_quantity) AS sum_qty,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
             / (100.0 * count(*)) AS avg_price,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q64_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map UDF (applyInPandas): each group arrives as one pandas
    DataFrame — the faithful re-expression of the reference's
    mapper-per-chunk contract with grouping semantics on top
    (Simple.pm:149-339 has no grouping; users hand-rolled it in reducers).

    Scale: one shuffle on the group key; each group must fit one
    executor's memory — fine for bounded group counts (3 here), the
    documented caveat for high-cardinality keys (use built-in aggs or
    grouped-agg UDFs instead)."""

    out_schema = T.StructType([
        T.StructField("l_returnflag", T.StringType()),
        T.StructField("sum_qty", T.DoubleType()),
        T.StructField("avg_price", T.DoubleType()),
        T.StructField("n_rows", T.LongType()),
    ])

    def summarize(pdf: pd.DataFrame) -> pd.DataFrame:
        # prices are 2-dp decimals: average via exact integer cents so the
        # result is bit-identical to the oracle's (pandas .mean() pairwise
        # summation drifts from SQL avg at the 1e-10 level)
        cents = (pdf["l_extendedprice"] * 100).round().astype("int64")
        return pd.DataFrame({
            "l_returnflag": [pdf["l_returnflag"].iloc[0]],
            "sum_qty": [float(pdf["l_quantity"].sum())],
            "avg_price": [float(cents.sum()) / (100.0 * len(pdf))],
            "n_rows": [int(len(pdf))],
        })

    li = load_table(spark, "lineitem", sf_dir).select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    )
    return li.groupBy("l_returnflag").applyInPandas(summarize, out_schema)


@query(
    "q65_grouped_agg_udf",
    oracle="""
    SELECT l_linestatus,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * CAST(l_quantity AS BIGINT)) AS DOUBLE)
             / (100.0 * sum(CAST(l_quantity AS BIGINT))) AS weighted_price
    FROM lineitem
    GROUP BY l_linestatus
    """,
)
def q65_grouped_agg_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom UDAF as a grouped-agg pandas_udf: quantity-weighted mean
    price (≙ the reference's reducer-side merge of per-chunk partials,
    t/01_basic.t:30-39, as a first-class aggregate).

    Scale caveat (documented): grouped-agg pandas_udfs do NOT do partial
    aggregation — all group rows ship to one executor. Use for moderate
    group sizes; for 100 TB hot paths prefer expressing the same math as
    built-in aggs (as the oracle shows is possible here)."""

    @F.pandas_udf(T.DoubleType())
    def weighted_mean(price: pd.Series, qty: pd.Series) -> float:
        # exact integer arithmetic (2-dp prices, integral quantities) so
        # the result bit-matches the oracle regardless of summation order
        cents = (price * 100).round().astype("int64")
        q = qty.round().astype("int64")
        return float((cents * q).sum()) / (100.0 * float(q.sum()))

    li = load_table(spark, "lineitem", sf_dir)
    return li.groupBy("l_linestatus").agg(
        weighted_mean(F.col("l_extendedprice"), F.col("l_quantity")).alias(
            "weighted_price"
        )
    )


@query("q72_approx_percentile")  # rows-only: t-digest sketches differ across engines
def q72_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile — the sketch twin of q58's exact percentiles
    (same exact/approx pairing discipline as q12/q45): bounded memory per
    group at any cardinality, accuracy set by the 10000 accuracy knob."""
    li = load_table(spark, "lineitem", sf_dir)
    return li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_quantity", 0.5, 10000).alias("med_qty_approx"),
        F.percentile_approx("l_extendedprice", 0.9, 10000).alias("p90_price_approx"),
    )


# ---------------------------------------------------------------------------
# q80 — first-class Python UDTF: context-window document chunking
# ---------------------------------------------------------------------------

CHUNK_TOKENS = 16


@query(
    "q80_chunk_documents",
    oracle=f"""
    WITH t AS (SELECT doc_id, {DUCK_TOKS} AS toks FROM documents),
    c AS (SELECT doc_id, toks,
                 unnest(range(0, CAST(ceil(len(toks) / {CHUNK_TOKENS}.0) AS BIGINT))) AS chunk_idx
          FROM t)
    SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
           array_to_string(toks[chunk_idx * {CHUNK_TOKENS} + 1 :
                                (chunk_idx + 1) * {CHUNK_TOKENS}], ' ') AS chunk,
           CAST(least(len(toks) - chunk_idx * {CHUNK_TOKENS}, {CHUNK_TOKENS}) AS INT) AS n_tokens
    FROM c
    """,
)
def q80_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking via a first-class Python UDTF (lateral
    join): each document explodes into fixed 16-token chunks — the
    training-data prep step that feeds tokenizers/packers.

    The UDTF surface is the genuine table-function API (class with eval
    yielding rows, registered + LATERAL-joined); the oracle reproduces
    the chunking with list slicing. Tokenization matches the engine-wide
    canonical tokenizer."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx int, chunk string, n_tokens int")
    class ChunkText:
        # baked at class creation — the single source the oracles
        # interpolate; retuning CHUNK_TOKENS retunes both sides
        N = CHUNK_TOKENS

        def __init__(self):
            import re

            # compiled ONCE per UDTF instance, not per row: eval runs
            # once per document, and the per-call `import re` +
            # pattern-cache lookup is pure overhead in the chunking hot
            # path (cloudpickle ships the class self-contained; the
            # import stays inside so executors need no module global).
            # ASCII-only \s ≙ the canonical Java/RE2 tokenizer (Python's
            # str.split()/default \s are unicode-aware and would diverge
            # on NBSP/ideographic spaces)
            self._ws = re.compile(r"\s+", flags=re.ASCII)

        def eval(self, text: str):
            if not text:  # NULL/empty doc: no chunks (oracle emits none)
                return
            toks = [t for t in self._ws.split(text.lower()) if t]
            n = self.N
            for i in range(0, len(toks), n):
                piece = toks[i : i + n]
                yield i // n, " ".join(piece), len(piece)

    spark.udtf.register("mfss_chunk_text", ChunkText)
    docs = load_table(spark, "documents", sf_dir)
    docs.createOrReplaceTempView("q80_documents")
    return spark.sql(
        "SELECT d.doc_id, c.chunk_idx, c.chunk, c.n_tokens "
        "FROM q80_documents d, LATERAL mfss_chunk_text(d.text) c"
    )


PACK_BUDGET = 48  # tokens per packed sequence


@query(
    "q81_pack_chunks",
    oracle=f"""
    WITH t AS (SELECT doc_id, {DUCK_TOKS} AS toks FROM documents),
    c AS (SELECT doc_id, toks,
                 unnest(range(0, CAST(ceil(len(toks) / {CHUNK_TOKENS}.0) AS BIGINT))) AS chunk_idx
          FROM t),
    sized AS (SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
                     CAST(least(len(toks) - chunk_idx * {CHUNK_TOKENS}, {CHUNK_TOKENS}) AS INT) AS n_tokens
              FROM c),
    offs AS (SELECT doc_id, chunk_idx, n_tokens,
                    sum(n_tokens) OVER (PARTITION BY doc_id ORDER BY chunk_idx
                                        ROWS UNBOUNDED PRECEDING) - n_tokens AS start_off
             FROM sized)
    SELECT doc_id,
           CAST(start_off // {PACK_BUDGET} AS INT) AS seq_id,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(n_tokens) AS BIGINT) AS seq_tokens
    FROM offs GROUP BY doc_id, start_off // {PACK_BUDGET}
    """,
)
def q81_pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (chunking's companion): chunks are packed into
    training sequences by token offset — chunk goes to sequence
    floor(start_offset / budget). Offset packing is fully deterministic
    and windowable (one cumsum, no iterative bin state), the property
    that makes it the scalable packing flavor; first-fit packing needs a
    sequential scan and is what applyInPandas per shard would buy."""
    chunks = q80_chunk_documents(spark, sf_dir)
    from pyspark.sql import Window

    w = (
        Window.partitionBy("doc_id")
        .orderBy("chunk_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offs = chunks.select(
        "doc_id",
        "chunk_idx",
        "n_tokens",
        (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("start_off"),
    )
    return (
        offs.groupBy(
            "doc_id", F.floor(F.col("start_off") / PACK_BUDGET).cast("int").alias("seq_id")
        )
        .agg(F.count("*").alias("n_chunks"), F.sum("n_tokens").cast("long").alias("seq_tokens"))
    )
