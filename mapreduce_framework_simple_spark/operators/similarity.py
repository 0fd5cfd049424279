"""Similarity search over the ``embeddings`` table (array<float>, dim 64).

Four paths, per the north star — none of which materializes the corpus on
the driver:

* **Exact cosine top-k** (q40) — query set broadcast via ``sc.broadcast``
  (bounded, documented), corpus streamed through ``mapInPandas``; all
  math accumulates sequentially over dimensions, the DuckDB fold order,
  so oracle comparison is bit-exact.
* **IVF (inverted-file) ANN** (q41, rows-only + recall-tested) — the
  100 TB top-k path: partition vectors into Voronoi cells around
  centroids, probe the nearest few cells per query. Turns an O(N·Q) scan
  into O(N/cells · probes · Q) with a broadcast of the (tiny) centroids.
* **Exact all-pairs near-dup** (q42) — distributed block self-join
  (cogrouped applyInPandas): quadratic work by nature (ground truth) but
  fully distributed in memory and compute.
* **Hyperplane-LSH near-dup** (q96) — the 100 TB near-dup path: banded
  sign-bit signatures, bucket candidate join, exact verify; the oracle
  replicates the full pipeline bit-exactly from shared inlined constants.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_framework_simple_spark.ephemeral import (
    scoped_broadcast,
    scoped_cache,
)
from mapreduce_framework_simple_spark.registry import query
from mapreduce_framework_simple_spark.sources.io import load_table

TOP_K = 5
QUERY_STRIDE = 25  # vec_id % 25 == 0 → deterministic query subset


def to_double_array(a: str | Column) -> Column:
    """float[] → double[] once per vector; queries pre-cast before any
    pairwise math so the per-pair fold does 64 multiplies, not 128 casts
    plus 64 multiplies."""
    a = F.col(a) if isinstance(a, str) else a
    return F.transform(a, lambda x: x.cast("double"))


def dot_expr(a: str | Column, b: str | Column) -> Column:
    """Sequential left-fold dot product in double precision.

    DuckDB twin: list_reduce(list_zip → x*y, (acc,x) -> acc+x) — both
    engines add in identical order, so results agree bit-for-bit."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_expr(a: str | Column) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def cosine_expr(a: str | Column, b: str | Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


# DuckDB fragments mirroring the folds above (same order of operations).
def _duck_dot(a: str, b: str) -> str:
    return (
        f"list_reduce(list_prepend(0.0, list_transform(list_zip({a}, {b}), "
        "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), (acc, x) -> acc + x)"
    )

def _duck_norm(a: str) -> str:
    return (
        f"sqrt(list_reduce(list_prepend(0.0, list_transform({a}, "
        "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (acc, x) -> acc + x))"
    )


MAX_BROADCAST_QUERIES = 100_000  # documented bound: Q·dim·8B ≈ 50 MB at 64 dims
# per-task float64 budget for the scan kernel's (batch × ref-chunk) score
# matrix: 16M elements ≈ 134 MB — the same scale the block kernel's
# BLOCK_CHUNK_ROWS enforces
_SCAN_CHUNK_ELEMS = 16_777_216


def _pairwise_cosine_scan(spark: SparkSession, sf_dir: str, ref_df,
                          emit_top_k: int | None = None,
                          ref_count: int | None = None):
    """Vectorized query-vs-corpus cosine kernel. The reference (QUERY) set
    — never the corpus — is collected once on the driver and shipped via
    ``sc.broadcast``, so executors hold ONE torrent-distributed copy
    instead of a per-task closure payload; the corpus only ever streams
    through ``mapInPandas`` Arrow batches. The query-set size is bounded
    (``MAX_BROADCAST_QUERIES``); corpus-sized reference sets must use the
    block self-join kernel (:func:`_block_pairs_cosine`) or the LSH path.

    Why not the JVM higher-order-function fold: Spark evaluates lambda
    functions interpreted (outside codegen), ~50 boxed ops per element —
    measured 21 s for 2M pairs, vs <1 s for the same flops vectorized.

    Cross-engine parity: dot products and norms accumulate SEQUENTIALLY
    over dimensions (one vectorized FMA per dim), the exact addition
    order of the DuckDB ``list_reduce`` fold — results are bit-identical,
    not merely close.

    Emits (query_id=ref id, neighbor_id=corpus id, cos_sim UNROUNDED);
    per-batch top-k pruning when ``emit_top_k`` — pruned on the ROUNDED
    score with a margin so the union of batch survivors provably contains
    the global rounded-order top-k. (Threshold-style scans belong to the
    block kernel, which carries the half-quantum prefilter.)
    """
    import numpy as np  # local: keeps the shipped closure self-contained

    # bound check BEFORE collecting — toPandas() on an oversized set IS
    # the driver OOM the bound exists to prevent; callers that already
    # counted (q120's dispatch) pass ref_count to skip the extra scan
    if ref_count is None:
        ref_count = ref_df.limit(MAX_BROADCAST_QUERIES + 1).count()
    if ref_count > MAX_BROADCAST_QUERIES:
        raise ValueError(
            f"query set exceeds {MAX_BROADCAST_QUERIES} vectors; "
            "use the block or LSH kernels for corpus-scale reference sets"
        )
    ref = ref_df.toPandas()
    if len(ref) == 0:
        # empty reference set: no pairs (np.stack([]) would raise)
        spark_sess = ref_df.sparkSession
        return spark_sess.createDataFrame(
            [], "query_id long, neighbor_id long, cos_sim_raw double"
        )
    ref_ids_l = ref["vec_id"].to_numpy(dtype="int64")
    ref_mat_l = np.stack([np.asarray(v, dtype="float64") for v in ref["embedding"]])
    # registered for the query-boundary release: unpersisted (executor
    # copies dropped, re-shippable) once the consumer has materialized,
    # instead of leaking one ~50 MB torrent copy per invocation
    bc = scoped_broadcast(
        spark.sparkContext.broadcast((ref_ids_l, ref_mat_l))
    )
    top_k = emit_top_k

    def score(batches):
        import numpy as np
        import pandas as pd

        ref_ids, ref_mat = bc.value
        dim = ref_mat.shape[1]
        # ref norms: sequential fold order (0.0 + x0² + x1² + …).
        # Zero-norm guard (the iterative._assign convention, pinned for
        # every kernel in this module): cosine is undefined for a
        # zero vector, and 0/0 = NaN would poison the top-k prune
        # (NaN fails every comparison, so the pair silently vanishes)
        # — dividing by 1 instead yields sim 0 exactly (dots are 0).
        racc = np.zeros(len(ref_mat))
        for d in range(dim):
            racc += ref_mat[:, d] * ref_mat[:, d]
        rnorm = np.sqrt(racc)
        rnorm = np.where(rnorm == 0, 1.0, rnorm)
        for pdf in batches:
            if len(pdf) == 0:  # np.stack on an empty batch would raise
                continue
            ids = pdf["vec_id"].to_numpy(dtype="int64")
            mat = np.stack([np.asarray(v, dtype="float64") for v in pdf["embedding"]])
            nacc = np.zeros(len(mat))
            for d in range(dim):  # sequential over dims == the SQL fold
                nacc += mat[:, d] * mat[:, d]
            bnorm = np.sqrt(nacc)
            bnorm = np.where(bnorm == 0, 1.0, bnorm)
            out_q, out_n, out_c = [], [], []
            # chunk the (batch × Q) score matrix over the REFERENCE axis:
            # unchunked it is batch_rows × Q doubles — 8 GB per task at a
            # 10k-row batch against the 100k-query bound, far past any
            # executor budget (MAX_BROADCAST_QUERIES only sizes the 50 MB
            # broadcast). ~134 MB per temporary, the block kernel's
            # budget; per-pair dot products still fold dim-sequentially,
            # and the top-k prune is per-reference-column, so chunking
            # changes no emitted bit.
            step = max(1, _SCAN_CHUNK_ELEMS // max(1, len(mat)))
            for c0 in range(0, len(ref_mat), step):
                rchunk = ref_mat[c0:c0 + step]
                dots = np.zeros((len(mat), len(rchunk)))
                for d in range(dim):
                    dots += mat[:, d:d + 1] * rchunk[:, d][None, :]
                sims = dots / (rnorm[c0:c0 + step][None, :] * bnorm[:, None])
                for j in range(sims.shape[1]):
                    col = sims[:, j]
                    mask = ids != ref_ids[c0 + j]
                    idx = np.nonzero(mask)[0]
                    if top_k is not None and len(idx) > top_k:
                        r6 = np.round(col[idx], 6)
                        kth = -np.partition(-r6, top_k - 1)[top_k - 1]
                        # keep everything within one rounding quantum of
                        # the batch's k-th ROUNDED score: superset of any
                        # rounded-order top-k regardless of HALF_UP/
                        # half-even edge rows
                        idx = idx[r6 >= kth - 1e-6]
                    out_q.append(np.full(len(idx), ref_ids[c0 + j]))
                    out_n.append(ids[idx])
                    out_c.append(col[idx])
            yield pd.DataFrame({
                "query_id": np.concatenate(out_q) if out_q else np.array([], dtype="int64"),
                "neighbor_id": np.concatenate(out_n) if out_n else np.array([], dtype="int64"),
                "cos_sim_raw": np.concatenate(out_c) if out_c else np.array([], dtype="float64"),
            })

    em = load_table(spark, "embeddings", sf_dir).select("vec_id", "embedding")
    return em.mapInPandas(
        score, "query_id long, neighbor_id long, cos_sim_raw double"
    )


@query(
    "q40_cosine_topk",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings
               WHERE vec_id % {QUERY_STRIDE} = 0),
    scored AS (
        SELECT q.query_id, e.vec_id AS neighbor_id,
               round({_duck_dot('q.q_emb', 'e.embedding')}
                     / ({_duck_norm('q.q_emb')} * {_duck_norm('e.embedding')}), 6) AS cos_sim
        FROM q JOIN embeddings e ON e.vec_id <> q.query_id
    ),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY cos_sim DESC, neighbor_id) AS rnk
        FROM scored
    )
    SELECT query_id, neighbor_id, cos_sim, CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= {TOP_K}
    """,
)
def q40_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-k for a deterministic query subset,
    on the vectorized matmul kernel (queries ship via ONE torrent
    ``sc.broadcast`` — deliberately NOT the per-task closure, see
    :func:`_pairwise_cosine_scan`; corpus scan is embarrassingly
    parallel; per-batch top-k pruning keeps the final window shuffle at
    O(batches × k) rows per query). This exact kernel is also the recall
    referee for q41's IVF path."""
    em = load_table(spark, "embeddings", sf_dir)
    q = em.where(F.col("vec_id") % QUERY_STRIDE == 0).select("vec_id", "embedding")
    scored = _pairwise_cosine_scan(spark, sf_dir, q, emit_top_k=TOP_K).select(
        "query_id",
        "neighbor_id",
        F.round(F.col("cos_sim_raw"), 6).alias("cos_sim"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= TOP_K)
    )


N_CELLS_STRIDE = 31  # vec_id % 31 == 0 → deterministic centroid "training" set
# 6 probes of ~17 cells ≈ 35% of the corpus per query. The synthetic
# embeddings are weakly clustered (max pairwise cos ≈ 0.55), so recall is
# governed mostly by probe coverage; real embedding corpora cluster far
# tighter and would hit >0.9 recall at this probe fraction.
N_PROBE = 6


def kmeans_centroid_frame(spark: SparkSession, sf_dir: str,
                          k: int | None = None) -> DataFrame:
    """(cell_id, c_emb) IVF centroids from the seeded Lloyd's k-means
    (:func:`mapreduce_framework_simple_spark.operators.iterative.kmeans`)
    — THE production centroid source for the IVF index. ``k`` defaults
    to ⌈√N⌉, the standard IVF sizing under which both the probe-selection
    term (N·K cosines) and the candidate join (N·n_probe·N/K) are
    O(N^1.5·n_probe), and the centroid table stays √N rows (~10⁵ at
    10¹⁰ vectors — comfortably broadcastable). The deterministic stride
    sample (:func:`_stride_centroids`) remains only as the oracle-stable
    default of the q41/q120 query surface.

    Scale: k-means itself is n_iter distributed passes (see
    iterative.py); the returned frame is K × dim doubles created from
    the driver-held centroid list — tiny by construction. ``k=None``
    (the ⌈√N⌉ default) is passed through to :func:`iterative.kmeans`,
    which sizes it from the corpus count it takes anyway — no separate
    sizing scan here."""
    from mapreduce_framework_simple_spark.operators.iterative import kmeans

    _, _, cents, _ = kmeans(spark, sf_dir, k=k)
    rows = [(i, [float(x) for x in c]) for i, c in enumerate(cents)]
    return spark.createDataFrame(rows, "cell_id long, c_emb array<double>")


def _stride_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deterministic stride stand-in centroid set (vec_id % 31 == 0)
    — kept for oracle/test determinism (k-means assignment can flip on
    1-ULP partial-aggregation differences across partitionings); at
    K = N/31 it does NOT have the O(N^1.5) IVF sizing — production
    indexes pass :func:`kmeans_centroid_frame` instead."""
    em = load_table(spark, "embeddings", sf_dir)
    return em.where(F.col("vec_id") % N_CELLS_STRIDE == 0).select(
        F.col("vec_id").alias("cell_id"), F.col("embedding").alias("c_emb")
    )


def _nearest_cells(df: DataFrame, id_col: str, emb_col: str,
                   cents: DataFrame, top_n: int) -> DataFrame:
    """Vectorized top-``top_n`` centroid cells per vector — the shared
    kernel under :func:`ivf_assignments` (top_n=1) and
    :func:`_ivf_probes` (top_n=N_PROBE).

    Same shape as :func:`_pairwise_cosine_scan`: the BOUNDED centroid
    set (K ≈ √N by the IVF sizing; guarded by the same
    ``MAX_BROADCAST_QUERIES`` bound) collects once and ships via one
    torrent ``sc.broadcast``; the corpus streams through ``mapInPandas``
    Arrow batches. Replaces the earlier JVM higher-order-function fold,
    which Spark evaluates interpreted — ~50 boxed ops per element, the
    same ~20-50× constant the scan kernel's docstring measures — an
    N·K cost on every index build.

    Exact rule parity with the replaced expression pipeline: dot/norm
    fold SEQUENTIALLY over dims, scores round to 6 dp HALF_UP
    (``F.round``'s mode — NOT numpy's half-even default), ranking is
    (rounded sim DESC, cell_id ASC); equality-tested against the
    expression formulation on both centroid sources."""
    import numpy as np

    spark = df.sparkSession
    if cents.limit(MAX_BROADCAST_QUERIES + 1).count() > MAX_BROADCAST_QUERIES:
        raise ValueError(
            f"centroid set exceeds {MAX_BROADCAST_QUERIES}; IVF sizing is "
            "K ≈ √N — rebuild with kmeans_centroid_frame, or for K past "
            "the broadcast bound use the two-level router "
            "(two_level_probes, docs/SCALE.md)"
        )
    cp = cents.select("cell_id", "c_emb").toPandas()
    if len(cp) == 0:
        # Empty centroid frame (empty corpus ⇒ K ≈ √N = 0 centroids):
        # the nearest-of-zero-cells relation is empty. The replaced
        # join+window formulation returned empty here; without this
        # guard np.stack([]) raises on the driver and, past that,
        # best_c stays None in the worker. Schema matches the
        # mapInPandas declaration below exactly.
        return df.select(
            F.col(id_col).cast("long").alias(id_col),
            emb_col,
            F.lit(None).cast("long").alias("cell_id"),
        ).limit(0)
    cell_ids_l = cp["cell_id"].to_numpy(dtype="int64")
    cmat_l = np.stack([np.asarray(v, dtype="float64") for v in cp["c_emb"]])
    bc = scoped_broadcast(spark.sparkContext.broadcast((cell_ids_l, cmat_l)))
    n_keep = top_n

    def nearest(batches):
        import numpy as np
        import pandas as pd

        cell_ids, cmat = bc.value
        dim = cmat.shape[1]
        cacc = np.zeros(len(cmat))
        for d in range(dim):  # sequential over dims == the SQL fold
            cacc += cmat[:, d] * cmat[:, d]
        cnorm = np.sqrt(cacc)
        # zero-norm guard (module convention, see _pairwise_cosine_scan):
        # without it a zero vector's 0/0 = NaN flows into the int64 cast
        # of the HALF_UP micro-unit ranking — undefined (INT64_MIN) —
        # i.e. a garbage cell assignment; with it, sim is exactly 0
        cnorm = np.where(cnorm == 0, 1.0, cnorm)
        for pdf in batches:
            if len(pdf) == 0:  # np.stack on an empty batch would raise
                continue
            ids = pdf[id_col].to_numpy(dtype="int64")
            mat = np.stack([np.asarray(v, dtype="float64") for v in pdf[emb_col]])
            nacc = np.zeros(len(mat))
            for d in range(dim):
                nacc += mat[:, d] * mat[:, d]
            bnorm = np.sqrt(nacc)
            bnorm = np.where(bnorm == 0, 1.0, bnorm)
            best_r = best_c = None  # carried (rows × ≤n_keep) top lists
            step = max(1, _SCAN_CHUNK_ELEMS // max(1, len(mat)))
            for c0 in range(0, len(cmat), step):
                cch = cmat[c0:c0 + step]
                dots = np.zeros((len(mat), len(cch)))
                for d in range(dim):
                    dots += mat[:, d:d + 1] * cch[:, d][None, :]
                sims = dots / (bnorm[:, None] * cnorm[c0:c0 + step][None, :])
                # HALF_UP micro-units (F.round's mode; np.round is
                # half-even), kept integer so ranking ties are exact
                ri = (np.sign(sims) * np.floor(np.abs(sims) * 1e6 + 0.5)).astype("int64")
                ci = np.broadcast_to(cell_ids[c0:c0 + step], ri.shape)
                cand_r = ri if best_r is None else np.concatenate([best_r, ri], 1)
                cand_c = ci if best_c is None else np.concatenate([best_c, ci], 1)
                # per-row lexicographic (-sim, cell_id): stable sort by
                # cell, then stable sort by -sim — ties land on the
                # smaller cell, the window ordering of the old pipeline
                o1 = np.argsort(cand_c, axis=1, kind="stable")
                r1 = np.take_along_axis(cand_r, o1, 1)
                o2 = np.argsort(-r1, axis=1, kind="stable")
                sel = np.take_along_axis(o1, o2, 1)[:, :n_keep]
                best_r = np.take_along_axis(cand_r, sel, 1)
                best_c = np.take_along_axis(cand_c, sel, 1)
            k_out = best_c.shape[1]  # ≤ n_keep (fewer cells than probes)
            yield pd.DataFrame({
                id_col: np.repeat(ids, k_out),
                emb_col: [v for v in pdf[emb_col] for _ in range(k_out)],
                "cell_id": best_c.reshape(-1),
            })

    emb_t = df.schema[emb_col].dataType.simpleString()
    return df.select(id_col, emb_col).mapInPandas(
        nearest, f"{id_col} long, {emb_col} {emb_t}, cell_id long"
    )


def ivf_assignments(spark: SparkSession, sf_dir: str,
                    centroids: DataFrame | None = None) -> DataFrame:
    """Assign every vector to its nearest centroid cell (IVF build side).

    ``centroids`` is any (cell_id, c_emb) frame — production passes
    :func:`kmeans_centroid_frame` (K ≈ √N); None falls back to the
    deterministic stride sample. Assignment is argmax cosine over the
    broadcast centroid set on the vectorized :func:`_nearest_cells`
    kernel (6-dp HALF_UP rounding, ties to the smaller cell_id)."""
    em = load_table(spark, "embeddings", sf_dir)
    cents = centroids if centroids is not None else _stride_centroids(spark, sf_dir)
    return _nearest_cells(em, "vec_id", "embedding", cents, top_n=1)


def _ivf_probes(
    spark: SparkSession, sf_dir: str, queries: DataFrame | None = None,
    centroids: DataFrame | None = None
) -> DataFrame:
    """(query_id, q_emb, cell_id): the top-N_PROBE cells per query —
    shared by q41, the bucketed-index probe, and the leave-one-out kNN
    audit so the probe rule cannot drift between paths. ``queries``
    overrides the default deterministic stride subset with any
    (query_id, q_emb) frame (the audit passes the whole corpus);
    ``centroids`` must be the SAME frame the index/assignments were
    built with (the bucketed paths read it back from the index, so the
    two cannot drift)."""
    em = load_table(spark, "embeddings", sf_dir)
    cents = centroids if centroids is not None else _stride_centroids(spark, sf_dir)
    q = queries if queries is not None else em.where(
        F.col("vec_id") % QUERY_STRIDE == 0
    ).select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb"))
    return _nearest_cells(q, "query_id", "q_emb", cents, top_n=N_PROBE)


# meta cells routed per query in the two-level probe. Recall governor of
# the router layer the same way N_PROBE governs the fine layer: a fine
# cell is reachable only through its single meta route, so route_n = 1
# risks losing a near-boundary fine cell; 4 of ~√K meta cells keeps the
# routed candidate pool ≈ 4·√K fine centroids — still ≪ K.
META_ROUTE_PROBES = 4


def two_level_probes(
    spark: SparkSession, sf_dir: str, centroids: DataFrame,
    meta_centroids: DataFrame, queries: DataFrame | None = None,
    route_n: int = META_ROUTE_PROBES, keep_n: int = N_PROBE,
    attach_emb: bool = True,
) -> DataFrame:
    """(query_id, q_emb, cell_id): :func:`_ivf_probes`' exact contract
    for the K > MAX_BROADCAST_QUERIES regime — the two-level
    (coarse-router) probe selection of docs/SCALE.md §"Two-level IVF
    routing for K beyond the broadcast bound". ``attach_emb=False``
    returns the skinny (query_id, cell_id) frame instead, skipping the
    q_emb re-attach join and its second read of the query frame.

    :func:`_nearest_cells` broadcasts its whole centroid set, so flat
    probe selection caps at K = 100k centroids — N ≈ 10^10 vectors
    under K ≈ √N. Beyond that, only √K ≈ N^(1/4) META-centroids are
    ever broadcast (~10^5 meta cells not before N ≈ 10^20): the K fine
    centroids route to their nearest meta cell once per index build
    (``_nearest_cells`` over the fine-centroid FRAME — K rows stream
    through Arrow batches, √K broadcast), queries route to their top-
    ``route_n`` meta cells the same way, and fine scoring happens in a
    meta-cell-keyed DISTRIBUTED join + Arrow-batched exact cosine —
    no K-sized driver or broadcast structure anywhere. Meta-cell skew
    in the join is AQE's to split (the key is data-dependent, the same
    class as the LSH band join).

    Scoring parity with ``_nearest_cells`` is exact — sequential-over-
    dims accumulation, 6-dp HALF_UP integer micro-units, ties to the
    smaller fine cell_id — so with ``route_n`` ≥ the meta-cell count
    the output EQUALS the flat ``_ivf_probes`` row-for-row (tested);
    at small ``route_n`` it is the approximate router (recall tested).
    Both centroid frames come from :func:`kmeans_centroid_frame`
    (unchanged): K at the standard √N sizing, meta at k ≈ ⌈√K⌉."""
    if queries is None:
        # only the default stride subset needs the corpus table; callers
        # supplying every frame explicitly (router_probe's replica runs,
        # synthetic tests) must not require <sf_dir>/embeddings.parquet
        # to exist — spark.read lists the path eagerly
        em = load_table(spark, "embeddings", sf_dir)
        q = em.where(F.col("vec_id") % QUERY_STRIDE == 0).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
        )
    else:
        q = queries
    fine = centroids.select(
        F.col("cell_id").alias("fine_id"), F.col("c_emb").alias("f_emb")
    )
    # cached: consumed twice (live-meta filter + candidate join); K rows
    # — linear in the centroid count, never in the corpus
    fine_routes = scoped_cache(_nearest_cells(
        fine, "fine_id", "f_emb", meta_centroids, top_n=1
    ).withColumnRenamed("cell_id", "meta_id"))
    # queries route against NON-EMPTY metas only (metas that won ≥1 fine
    # centroid): a meta cell can be nearest to a query without being any
    # fine centroid's single route target, and a query whose route_n
    # picks were ALL such empty cells would silently get zero candidates
    # — on the assignment side, a silently dropped vector. Filtering
    # empty metas (FAISS probes non-empty lists the same way) guarantees
    # every query ≥1 candidate, never changes the full-route result
    # (empty metas contribute nothing), and can only improve recall at
    # fixed route_n.
    live_meta = meta_centroids.join(
        fine_routes.select(F.col("meta_id").alias("cell_id")).distinct(),
        "cell_id", "left_semi",
    )
    q_routes = _nearest_cells(
        q, "query_id", "q_emb", live_meta, top_n=route_n
    ).withColumnRenamed("cell_id", "meta_id")
    # (query, fine) pairs are unique: each fine centroid has exactly ONE
    # meta route, so no post-join dedup is needed before ranking
    cand = q_routes.join(fine_routes, "meta_id").select(
        "query_id", "q_emb", "fine_id", "f_emb"
    )

    def score(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            qm = np.stack([np.asarray(v, dtype="float64") for v in pdf["q_emb"]])
            fm = np.stack([np.asarray(v, dtype="float64") for v in pdf["f_emb"]])
            dots = np.zeros(len(qm))
            qa = np.zeros(len(qm))
            fa = np.zeros(len(fm))
            for d in range(qm.shape[1]):  # sequential over dims == the
                dots += qm[:, d] * fm[:, d]  # _nearest_cells fold order
                qa += qm[:, d] * qm[:, d]
                fa += fm[:, d] * fm[:, d]
            qn = np.sqrt(qa)
            fn = np.sqrt(fa)
            # zero-norm guard (module convention): sim 0, never NaN→int64
            sims = dots / (np.where(qn == 0, 1.0, qn) * np.where(fn == 0, 1.0, fn))
            # HALF_UP micro-units, integer — _nearest_cells' exact rule
            ri = (np.sign(sims) * np.floor(np.abs(sims) * 1e6 + 0.5)).astype("int64")
            # positional arrays throughout: mixing indexed Series with
            # the positional ri array would re-align rows if a batch
            # ever arrived with a non-default index
            yield pd.DataFrame({
                "query_id": pdf["query_id"].to_numpy(),
                "fine_id": pdf["fine_id"].to_numpy(),
                "ri": ri,
            })

    from pyspark.sql import Window

    # scored rows are SKINNY (query_id, fine_id, ri — 24 B): the rank
    # window's shuffle moves route_n·K/√K candidate rows PER QUERY, and
    # on the assignment path the query frame is the whole corpus — at
    # embedding width (~0.5 KB) that exchange would be ~20× the data it
    # needs. q_emb re-attaches AFTER the top-keep_n cut via a join on
    # query_id (keep_n rows per query vs the query frame — the same
    # exchange class as the candidate join, on 1/route_n·√K the rows).
    # attach_emb=False skips that join AND its second read of the query
    # frame for consumers that only want the (query_id, cell_id) pairs
    # (q129's oracle surface) — the optimizer cannot prune an inner
    # join, so the skip has to be explicit.
    scored = cand.mapInPandas(score, "query_id long, fine_id long, ri long")
    w = Window.partitionBy("query_id").orderBy(F.desc("ri"), F.asc("fine_id"))
    kept = (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= keep_n)
        .select("query_id", F.col("fine_id").alias("cell_id"))
    )
    if not attach_emb:
        return kept
    return kept.join(q, "query_id").select("query_id", "q_emb", "cell_id")


def two_level_assignments(
    spark: SparkSession, sf_dir: str, centroids: DataFrame,
    meta_centroids: DataFrame, route_n: int = META_ROUTE_PROBES,
) -> DataFrame:
    """Two-level twin of :func:`ivf_assignments` — the index-BUILD side
    of the K > MAX_BROADCAST_QUERIES regime (the probe side is
    :func:`two_level_probes`; together they bound every broadcast at
    √K for any N). Each corpus vector routes to its ``route_n`` nearest
    meta cells and takes the argmax-cosine fine cell among the fine
    centroids routed there — ``two_level_probes`` with the corpus as
    the query frame and keep_n=1, so the scoring/tie rules cannot
    drift from the probe path. route_n > 1 keeps a near-meta-boundary
    vector's true argmax fine cell reachable (with route_n = the
    meta-cell count the output EQUALS ivf_assignments — tested)."""
    em = load_table(spark, "embeddings", sf_dir).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    return two_level_probes(
        spark, sf_dir, centroids, meta_centroids,
        queries=em, route_n=route_n, keep_n=1,
    ).select(
        F.col("query_id").alias("vec_id"),
        F.col("q_emb").alias("embedding"),
        "cell_id",
    )


def _score_and_rank_candidates(cand: DataFrame, k: int = TOP_K) -> DataFrame:
    """Exact-cosine score + per-query top-k over (query_id, q_emb,
    vec_id, embedding) candidate rows — shared tail of both IVF paths.
    ``k`` is explicit because consumers truncate at DIFFERENT depths
    (TOP_K for the q41 surface, KNN_K for the vote audit): a fixed
    TOP_K here would silently pre-truncate the kNN vote whenever
    KNN_K were retuned above it.

    Scoring runs in the Arrow-batched row-pair kernel (the
    ``two_level_probes.score`` shape), NOT the JVM higher-order fold the
    module's docstrings measure at ~20-50× slower interpreted — this
    tail scores the O(N^1.5) candidate sets of q41/the bucketed probe
    and the CORPUS-sized candidate set of the kNN audit, exactly where
    that constant matters. Parity is exact: sequential-over-dims
    accumulation, 6-dp HALF_UP via integer micro-units (÷1e6 — 1e6 is
    exactly representable, so the final division is correctly rounded;
    the ``floor(|x|·1e6 + 0.5)`` tie decision itself can disagree with
    ``F.round``'s BigDecimal HALF_UP when ``|x|·1e6`` lands within one
    ulp of a .5 tie — the float multiply may round across the
    boundary — so parity is CORPUS-PINNED, not universal: pinned by
    the oracle-checked bucketed-probe matrix row and the path-equality
    tests, which hash every value this corpus produces), zero-norm →
    sim 0 (module convention)."""
    pairs = cand.where(F.col("vec_id") != F.col("query_id")).select(
        "query_id", "q_emb", F.col("vec_id").alias("neighbor_id"), "embedding"
    )

    def score(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:  # np.stack on an empty batch would raise
                continue
            qm = np.stack([np.asarray(v, dtype="float64") for v in pdf["q_emb"]])
            nm = np.stack([np.asarray(v, dtype="float64") for v in pdf["embedding"]])
            dots = np.zeros(len(qm))
            qa = np.zeros(len(qm))
            na = np.zeros(len(nm))
            for d in range(qm.shape[1]):  # sequential over dims == SQL fold
                dots += qm[:, d] * nm[:, d]
                qa += qm[:, d] * qm[:, d]
                na += nm[:, d] * nm[:, d]
            qn = np.sqrt(qa)
            nn = np.sqrt(na)
            sims = dots / (np.where(qn == 0, 1.0, qn) * np.where(nn == 0, 1.0, nn))
            # HALF_UP micro-units (F.round's mode; np.round is half-even)
            ri = (np.sign(sims) * np.floor(np.abs(sims) * 1e6 + 0.5)).astype("int64")
            # positional arrays throughout (the two_level_probes rule):
            # indexed Series would re-align against the positional ri
            yield pd.DataFrame({
                "query_id": pdf["query_id"].to_numpy(),
                "neighbor_id": pdf["neighbor_id"].to_numpy(),
                "cos_sim": ri / 1e6,
            })

    scored = pairs.mapInPandas(
        score, "query_id long, neighbor_id long, cos_sim double"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= k)
    )


def ann_ivf_topk(spark: SparkSession, sf_dir: str,
                 centroids: DataFrame | None = None) -> DataFrame:
    """IVF approximate top-k for the deterministic query subset against
    any centroid set — q41's body, parameterized so production (k-means
    centroids, K ≈ √N) and the oracle-stable stride default share one
    probe/score/rank path. Recall vs exact q40 is tested for BOTH
    centroid sources."""
    # resolve the default ONCE and cache it: assignment and probe
    # selection each bound-probe + collect their centroid frame, so
    # leaving the default to resolve inside each call re-ran the stride
    # scan and re-broadcast an identical frame twice per query
    cents = centroids if centroids is not None else scoped_cache(
        _stride_centroids(spark, sf_dir)
    )
    assigned = ivf_assignments(spark, sf_dir, centroids=cents)
    cand = _ivf_probes(spark, sf_dir, centroids=cents).join(assigned, "cell_id")
    return _score_and_rank_candidates(cand)


def ann_two_level_topk(spark: SparkSession, sf_dir: str,
                       centroids: DataFrame,
                       meta_centroids: DataFrame) -> DataFrame:
    """IVF ANN with BOTH sides routed — :func:`ann_ivf_topk`'s twin for
    the K > MAX_BROADCAST_QUERIES regime: index assignment via
    :func:`two_level_assignments`, probe selection via
    :func:`two_level_probes`, exact-cosine rank via the same
    :func:`_score_and_rank_candidates` tail as q41/q120, so the scoring
    rule cannot drift between the flat and routed paths. Recall vs the
    exact q40 is tested on the stride layers."""
    assigned = two_level_assignments(spark, sf_dir, centroids, meta_centroids)
    cand = two_level_probes(
        spark, sf_dir, centroids, meta_centroids
    ).join(assigned, "cell_id")
    return _score_and_rank_candidates(cand)


@query("q41_ann_ivf")  # rows-only check; recall vs q40 asserted in tests
def q41_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k: probe the N_PROBE nearest cells per query,
    exact cosine rank within the probed shard.

    Scale: corpus is hash-partitioned by cell_id (in production:
    bucketed-by-cell parquet — see :func:`ivf_probe_bucketed`, built
    with k-means centroids at K ≈ √N via
    :func:`kmeans_centroid_frame`); each query touches N_PROBE cells.
    This query entry keeps the deterministic stride centroids so its
    row count is oracle-stable. Approximation error is bounded by probe
    count, tested as recall@k ≥ 0.6 against the exact q40 answer — on
    both the stride and the k-means centroid sets."""
    return ann_ivf_topk(spark, sf_dir)


META_STRIDE = 155  # 31 × 5: stride meta layer = every 5th stride centroid


def _stride_meta_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stride META layer for the two-level router's
    ORACLE surface (vec_id % 155 == 0 — every 5th stride centroid), the
    same oracle-stability role :func:`_stride_centroids` plays for q41:
    k-means metas can flip on 1-ULP partial-agg differences, a stride
    subset cannot. Production passes :func:`kmeans_centroid_frame`
    (k=⌈√K⌉) for both layers."""
    em = load_table(spark, "embeddings", sf_dir)
    return em.where(F.col("vec_id") % META_STRIDE == 0).select(
        F.col("vec_id").alias("cell_id"), F.col("embedding").alias("c_emb")
    )


def _duck_route(out_id: str, src: str, src_id: str, src_emb: str,
                keep: int, metas: str = "meta") -> str:
    """One routing hop as DuckDB SQL — top-``keep`` meta cells per
    ``src`` row by (rounded cosine DESC, meta_id ASC), the exact
    :func:`_nearest_cells` rule (round() is HALF_UP in both engines;
    the fold helpers are the q40-validated sequential-reduce forms).
    ``metas`` names the meta relation: fine centroids route against ALL
    metas, queries against the LIVE (non-empty) subset — mirroring
    two_level_probes' live-meta filter exactly."""
    cos = (f"round({_duck_dot(src_emb, 'm.m_emb')} / "
           f"({_duck_norm(src_emb)} * {_duck_norm('m.m_emb')}), 6)")
    return f"""
    SELECT {out_id}, meta_id FROM (
        SELECT s.{src_id} AS {out_id}, m.meta_id,
               row_number() OVER (PARTITION BY s.{src_id}
                                  ORDER BY {cos} DESC, m.meta_id) AS rn
        FROM {src} s CROSS JOIN {metas} m
    ) WHERE rn <= {keep}
    """


@query(
    "q129_two_level_probe",
    oracle=f"""
    WITH cents AS (SELECT vec_id AS cell_id, embedding AS c_emb
                   FROM embeddings WHERE vec_id % {N_CELLS_STRIDE} = 0),
    meta AS (SELECT vec_id AS meta_id, embedding AS m_emb
             FROM embeddings WHERE vec_id % {META_STRIDE} = 0),
    q AS (SELECT vec_id AS query_id, embedding AS q_emb
          FROM embeddings WHERE vec_id % {QUERY_STRIDE} = 0),
    fr AS ({_duck_route('cell_id', 'cents', 'cell_id', 's.c_emb', 1)}),
    live_meta AS (
        SELECT * FROM meta WHERE meta_id IN (SELECT meta_id FROM fr)
    ),
    qr AS ({_duck_route('query_id', 'q', 'query_id', 's.q_emb',
                        META_ROUTE_PROBES, metas='live_meta')}),
    cand AS (
        SELECT qr.query_id, fr.cell_id
        FROM qr JOIN fr ON qr.meta_id = fr.meta_id
    ),
    scored AS (
        SELECT c.query_id, c.cell_id,
               round({_duck_dot('q.q_emb', 'ce.c_emb')} /
                     ({_duck_norm('q.q_emb')} * {_duck_norm('ce.c_emb')}),
                     6) AS s
        FROM cand c
        JOIN q ON q.query_id = c.query_id
        JOIN cents ce ON ce.cell_id = c.cell_id
    )
    SELECT query_id, cell_id FROM (
        SELECT query_id, cell_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY s DESC, cell_id) AS rn
        FROM scored
    ) WHERE rn <= {N_PROBE}
    """,
)
def q129_two_level_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level routed IVF probe selection on fully deterministic
    stride layers (fine = every 31st vector, meta = every 155th) — the
    oracle-checked surface of :func:`two_level_probes`, whose k-means
    production configuration is rows-only for the same ULP reason as
    q41. Every hop (fine→meta route, query→meta routes, fine scoring
    within routed cells, top-N_PROBE rank) is replicated in SQL with
    the q40-validated sequential-fold cosine and HALF_UP rounding.

    Scale: this is the K > 100k regime's plan shape — broadcasts
    bounded at the meta layer (√K), fine scoring a meta-keyed
    distributed join (docs/SCALE.md §two-level routing; measured past
    the flat ceiling in tools/router_probe.py)."""
    return two_level_probes(
        spark, sf_dir,
        centroids=_stride_centroids(spark, sf_dir),
        meta_centroids=_stride_meta_centroids(spark, sf_dir),
        attach_emb=False,  # q129 wants the pairs; skip the re-attach join
    )


NEARDUP_THRESHOLD = 0.45
N_BLOCKS = 8  # B(B+1)/2 = 36 block pairs; each vector shuffles (B+1)× total
# cross-product chunk edge: temporaries ≤ CH²·8 B (~134 MB at 4096)
BLOCK_CHUNK_ROWS = 4096


def _block_cogroup(spark: SparkSession, sf_dir: str):
    """Driver-side scaffolding shared by both block kernels: vectors hash
    into B blocks; returns the (left, right) frames keyed by the
    B(B+1)/2 unordered block pairs, ready to cogroup. NOTHING is
    materialized on the driver — both sides stream through the shuffle,
    so the plan survives a corpus that would OOM a collect (the round-1
    kernel's failure mode)."""
    em = load_table(spark, "embeddings", sf_dir).select("vec_id", "embedding")
    em = em.withColumn("blk", F.pmod(F.col("vec_id"), F.lit(N_BLOCKS)).cast("int"))
    block_pairs = spark.createDataFrame(
        [(a, b) for a in range(N_BLOCKS) for b in range(N_BLOCKS) if a <= b],
        "ba int, bb int",
    )
    left = (
        em.alias("ea")
        .join(F.broadcast(block_pairs.alias("pa")), F.col("ea.blk") == F.col("pa.ba"))
        .select(
            F.col("pa.ba").alias("ba"), F.col("pa.bb").alias("bb"),
            F.col("ea.vec_id").alias("vec_id"), F.col("ea.embedding").alias("embedding"),
        )
    )
    right = (
        em.alias("eb")
        .join(F.broadcast(block_pairs.alias("pb")), F.col("eb.blk") == F.col("pb.bb"))
        .select(
            F.col("pb.ba").alias("ba"), F.col("pb.bb").alias("bb"),
            F.col("eb.vec_id").alias("vec_id"), F.col("eb.embedding").alias("embedding"),
        )
    )
    return left, right


def _chunked_block_kernel(empty, emit, chunk_rows):
    """One cogroup kernel body shared by both block kernels — norms and
    chunked cross products live HERE only, so the cross-engine
    "sequential over dims" parity rule cannot drift between them.
    ``emit(parts, diagonal, lids, rids, cos)`` appends result
    DataFrames per chunk; ``empty()`` supplies the mode's empty frame.
    All three callables are NESTED functions (cloudpickle serializes
    them by value), keeping the shipped closure self-contained — no
    module-reference imports on executors.

    Chunking: temporaries stay ≤ CH² × 8 B regardless of block row
    counts, so a block-size miscalibration degrades to more chunks,
    never an executor OOM."""

    def kernel(l, r):
        import numpy as np
        import pandas as pd

        if len(l) == 0 or len(r) == 0:
            return empty()
        la = np.stack([np.asarray(v, dtype="float64") for v in l["embedding"]])
        rb = np.stack([np.asarray(v, dtype="float64") for v in r["embedding"]])
        lids = l["vec_id"].to_numpy(dtype="int64")
        rids = r["vec_id"].to_numpy(dtype="int64")
        dim = la.shape[1]
        lacc = np.zeros(len(la))
        racc = np.zeros(len(rb))
        for d in range(dim):  # sequential over dims == the SQL fold
            lacc += la[:, d] * la[:, d]
            racc += rb[:, d] * rb[:, d]
        # zero-norm guard (module convention, see _pairwise_cosine_scan):
        # unguarded, a zero vector's 0/0 = NaN fails every threshold
        # compare and silently drops its pairs — divergent from the
        # guarded kernels' sim = 0 convention
        lnorm = np.where(lacc == 0, 1.0, np.sqrt(lacc))
        rnorm = np.where(racc == 0, 1.0, np.sqrt(racc))
        # diagonal groups hold the SAME block on both sides, so the cos
        # matrix covers every ordered pair within the block
        diagonal = l["ba"].iloc[0] == l["bb"].iloc[0]
        parts = []
        CH = chunk_rows
        for i0 in range(0, len(la), CH):
            i1 = min(i0 + CH, len(la))
            for j0 in range(0, len(rb), CH):
                j1 = min(j0 + CH, len(rb))
                dots = np.zeros((i1 - i0, j1 - j0))
                for d in range(dim):  # sequential over dims == the SQL fold
                    dots += la[i0:i1, d:d + 1] * rb[j0:j1, d][None, :]
                cos = dots / (lnorm[i0:i1, None] * rnorm[None, j0:j1])
                emit(parts, diagonal, lids[i0:i1], rids[j0:j1], cos)
        return pd.concat(parts, ignore_index=True) if parts else empty()

    return kernel


def _block_pairs_cosine(spark: SparkSession, sf_dir: str,
                        threshold: float) -> DataFrame:
    """Distributed exact all-pairs cosine ≥ threshold via the block
    self-join (see :func:`_block_cogroup` / :func:`_chunked_block_kernel`
    for the shared scaffolding). Emits UNORDERED pairs once each
    (vec_a < vec_b).

    Cross-engine parity: dots/norms accumulate sequentially over dims —
    bit-identical to the DuckDB list_reduce fold (see
    :func:`_pairwise_cosine_scan`). Threshold prefilter keeps raw ≥
    threshold − 5e-7 (half the 6-dp rounding quantum) so the caller's
    rounded cut decides, never the prefilter.

    Scale: O(N²/B²) work per group, N·(B+1) rows shuffled; N_BLOCKS is
    the parallelism knob (B(B+1)/2 tasks; production sizes
    B ≈ √(N²/target_task_work)). Work is quadratic by nature (it is the
    exact ground truth) — the subquadratic production paths are q41
    (IVF) and q96 (hyperplane LSH)."""
    left, right = _block_cogroup(spark, sf_dir)
    thresh = threshold  # closure LOCALS (module globals pickle by reference)

    def empty():
        import numpy as np
        import pandas as pd

        return pd.DataFrame({
            "vec_a": np.array([], dtype="int64"),
            "vec_b": np.array([], dtype="int64"),
            "cos_raw": np.array([], dtype="float64"),
        })

    def emit(parts, diagonal, lids, rids, cos):
        import numpy as np
        import pandas as pd

        keep = cos >= thresh - 5e-7
        if diagonal:
            # both orientations of every pair are present in the
            # diagonal group — the id order dedupes them
            keep &= lids[:, None] < rids[None, :]
        ii, jj = np.nonzero(keep)
        a = lids[ii]
        b = rids[jj]
        if not diagonal:
            # off-diagonal group: each unordered pair appears exactly
            # once, in block (not id) orientation — normalize
            a, b = np.minimum(a, b), np.maximum(a, b)
        parts.append(pd.DataFrame({"vec_a": a, "vec_b": b, "cos_raw": cos[ii, jj]}))

    kernel = _chunked_block_kernel(empty, emit, BLOCK_CHUNK_ROWS)
    return (
        left.groupby("ba", "bb")
        .cogroup(right.groupby("ba", "bb"))
        .applyInPandas(kernel, "vec_a long, vec_b long, cos_raw double")
    )


def _block_topk_cosine(spark: SparkSession, sf_dir: str, k: int) -> DataFrame:
    """Directed per-query top-k over the exact all-pairs cosine, on the
    block self-join kernel — the corpus-scale fallback when the query set
    IS the corpus and therefore cannot ship under
    ``MAX_BROADCAST_QUERIES`` (q120's self-kNN beyond the broadcast
    bound). Emits (query_id, neighbor_id, cos_raw) rows, pruned per chunk
    to each query's rounded top-k with the same one-rounding-quantum
    margin as :func:`_pairwise_cosine_scan`, so the union over chunks and
    block pairs provably contains every query's global rounded-order
    top-k; the caller's window does the final rank.

    Scale: same shuffle shape as :func:`_block_pairs_cosine` (N·(B+1)
    rows, B(B+1)/2 tasks, chunked O(CH²) temporaries); output is
    O(N · B · k · chunks-per-block) rows, never N²."""
    left, right = _block_cogroup(spark, sf_dir)
    top_k = k  # closure LOCAL (module globals pickle by reference)

    def empty():
        import numpy as np
        import pandas as pd

        return pd.DataFrame({
            "query_id": np.array([], dtype="int64"),
            "neighbor_id": np.array([], dtype="int64"),
            "cos_raw": np.array([], dtype="float64"),
        })

    def emit(parts, diagonal, lids, rids, cos):
        import numpy as np
        import pandas as pd

        def one_direction(qids, nids, mat):
            # per-chunk rounded top-k with a one-quantum margin: superset
            # of any global rounded-order top-k (see _pairwise_cosine_scan)
            not_self = qids[:, None] != nids[None, :]
            r6 = np.round(mat, 6)
            r6 = np.where(not_self, r6, -np.inf)  # self never votes nor counts
            if r6.shape[1] > top_k:
                kth = -np.partition(-r6, top_k - 1, axis=1)[:, top_k - 1]
            else:
                kth = np.full(r6.shape[0], -np.inf)
            keep = (r6 >= kth[:, None] - 1e-6) & not_self
            ii, jj = np.nonzero(keep)
            parts.append(pd.DataFrame({
                "query_id": qids[ii],
                "neighbor_id": nids[jj],
                "cos_raw": mat[ii, jj],
            }))

        # the diagonal group's l→r orientation already enumerates every
        # ordered pair; off-diagonal groups need the transpose too
        one_direction(lids, rids, cos)
        if not diagonal:
            one_direction(rids, lids, cos.T)

    kernel = _chunked_block_kernel(empty, emit, BLOCK_CHUNK_ROWS)
    return (
        left.groupby("ba", "bb")
        .cogroup(right.groupby("ba", "bb"))
        .applyInPandas(kernel, "query_id long, neighbor_id long, cos_raw double")
    )


@query(
    "q42_embed_neardup",
    oracle=f"""
    WITH pairs AS (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               round({_duck_dot('a.embedding', 'b.embedding')}
                     / ({_duck_norm('a.embedding')} * {_duck_norm('b.embedding')}), 6) AS cos_sim
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    )
    SELECT vec_a, vec_b, cos_sim FROM pairs WHERE cos_sim >= {NEARDUP_THRESHOLD}
    """,
)
def q42_embed_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine high-similarity pairs (cos ≥ 0.45), exact — on the
    DISTRIBUTED block self-join kernel: no driver-side materialization of
    the corpus anywhere in the plan (the round-1 version collected the
    whole table into every task closure).

    (Threshold is data-driven: the synthetic embeddings max out near
    cos ≈ 0.55 pairwise, so a production-style 0.98 dedup cut would
    select nothing — 0.45 keeps the operator observable end-to-end.)

    Scale caveat (by design, like q36): all-pairs is the oracle-checkable
    ground truth and stays quadratic in WORK, but now distributes —
    B(B+1)/2 block-pair tasks, N·(B+1) rows shuffled, O((N/B)²) memory
    per task. The subquadratic production paths are q41 (IVF) and q96
    (hyperplane-LSH candidates + exact verify)."""
    scored = _block_pairs_cosine(spark, sf_dir, NEARDUP_THRESHOLD)
    return (
        scored.select(
            "vec_a",
            "vec_b",
            F.round(F.col("cos_raw"), 6).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= NEARDUP_THRESHOLD)
    )


# ---------------------------------------------------------------------------
# Hyperplane-LSH near-dup: the bucketed scale path for q42's semantics
# ---------------------------------------------------------------------------

LSH_N_BITS = 16
LSH_N_BANDS = 2


def _lsh_hyperplanes(n_bits: int):
    """The fixed seeded hyperplane matrix H (64 × n_bits). Driver-side
    helper for SQL generation; executor closures inline the identical
    RandomState(42) call directly (module references don't survive
    cloudpickle when the consumer's cwd isn't the repo)."""
    import numpy as np

    return np.random.RandomState(42).randn(64, n_bits)


def _lsh_band_exprs_sql(vec: str, n_bits: int = LSH_N_BITS,
                        n_bands: int = LSH_N_BANDS) -> list[str]:
    """DuckDB expressions computing the SAME banded sign-bit signature as
    the Spark kernel: the hyperplane constants are inlined as full-
    precision literals, and each dot is the sequential list_reduce fold —
    the exact addition order of the Spark-side per-dim accumulation — so
    the sign of every bit is bit-identical across engines."""
    H = _lsh_hyperplanes(n_bits)
    bpb = n_bits // n_bands
    out = []
    for b in range(n_bands):
        terms = []
        for i in range(bpb):
            lits = ", ".join(repr(float(x)) for x in H[:, b * bpb + i])
            dot = (
                f"list_reduce(list_prepend(0.0, list_transform(list_zip({vec}, [{lits}]), "
                "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), (acc, x) -> acc + x)"
            )
            terms.append(f"(CASE WHEN {dot} > 0 THEN {1 << i} ELSE 0 END)")
        out.append("(" + " + ".join(terms) + ")")
    return out


def hyperplane_lsh_pairs(df: DataFrame, threshold: float = 0.9,
                         n_bits: int = LSH_N_BITS, n_bands: int = LSH_N_BANDS,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding",
                         max_bucket_size: int | None = None) -> DataFrame:
    """Embedding near-dup via random-hyperplane LSH (SimHash for vectors).

    Signature: sign bits of H·v for a fixed seeded hyperplane matrix H
    (identical on every executor). Docs sharing any band of sign bits
    become candidates; candidates are verified with exact cosine.
    P(bit match) = 1 - θ/π, so recall ≈ 1 - (1-(1-θ/π)^(bits/bands))^bands
    — near 1 for cos → 1, which is the near-dup regime this targets (the
    exact q42 covers the exploratory low-threshold regime).

    Scale: signatures are 64 vectorized FMAs per Arrow batch; the band
    bucketing is q38's exact long shape — (vec_id, band, band_sig), one
    self-join on (band, band_sig) — and every shuffle up to candidate
    dedup carries IDS ONLY (two longs per pair). Embeddings attach
    AFTER dropDuplicates, via two joins against the id-pruned corpus
    scan. The earlier formulation dragged both 64-double embeddings
    through the per-band joins and the dedup shuffle (~1.1 KB/pair);
    the 100× dup-heavy probe (200k vectors, 99 exact copies each,
    ~40M pre-dedup candidates) spilled >75 GB and died on disk — the
    id-only form shuffles ~60× narrower and completes that same probe
    in 185 s (1× = 1.2 s; wall grew 156× while verify-work grew
    ~10⁴× — each vector's 99 copies share every band bucket, so
    intra-bucket pairs go from ~0 to C(100,2) per original).
    ``max_bucket_size``
    optionally applies q38's hot-bucket guard (same helper, same
    logged drop count) for boilerplate-heavy production corpora; the
    default None keeps the exact uncapped semantics of the q96 oracle.
    """
    import numpy as np
    import pandas as pd

    bits_per_band = n_bits // n_bands

    def signatures(batches):
        H = np.random.RandomState(42).randn(64, n_bits)
        for pdf in batches:
            if len(pdf) == 0:  # np.stack on an empty batch would raise
                continue
            mat = np.stack([np.asarray(v, dtype="float64") for v in pdf[vec_col]])
            if mat.shape[1] != H.shape[0]:
                # H is the FIXED seeded 64-row hyperplane matrix the SQL
                # twin (_lsh_band_exprs_sql) inlines literal-for-literal;
                # a non-64-dim vector must fail loudly — dim > 64 would
                # IndexError anyway, dim < 64 would silently truncate H
                # here while DuckDB's list_zip NULL-pads, putting every
                # SQL-side dot at NULL (all sign bits 0) and the two
                # candidate sets in silent disagreement
                raise ValueError(
                    f"hyperplane_lsh_pairs: {vec_col} has dim "
                    f"{mat.shape[1]}, but the seeded hyperplane matrix "
                    f"(and its inlined SQL twin) is fixed at {H.shape[0]}"
                )
            acc = np.zeros((len(mat), n_bits))
            for d in range(mat.shape[1]):  # sequential over dims == SQL fold
                acc += mat[:, d:d + 1] * H[d][None, :]
            bits = acc > 0  # (n × n_bits), bit-identical to the oracle's
            # the id column is ALIASED to vec_id in the select feeding
            # mapInPandas, so index the batch by that name — pdf[id_col]
            # raised KeyError for any non-default id_col
            out = {"vec_id": pdf["vec_id"].to_numpy(dtype="int64")}
            for b in range(n_bands):
                chunk = bits[:, b * bits_per_band:(b + 1) * bits_per_band]
                out[f"band{b}"] = chunk.dot(1 << np.arange(chunk.shape[1])).astype("int64")
            yield pd.DataFrame(out)

    band_schema = ", ".join([f"band{b} long" for b in range(n_bands)])
    stack_args = ", ".join(f"{b}, band{b}" for b in range(n_bands))
    bands = df.select(F.col(id_col).alias("vec_id"), F.col(vec_col)).mapInPandas(
        signatures, f"vec_id long, {band_schema}"
    ).selectExpr(
        "vec_id", f"stack({n_bands}, {stack_args}) as (band, band_sig)"
    )
    bands = scoped_cache(bands)
    if max_bucket_size is not None:
        from mapreduce_framework_simple_spark.operators.dedup import (
            _drop_oversized_buckets,
        )

        bands = _drop_oversized_buckets(
            bands, max_bucket_size, "hyperplane_lsh_pairs"
        )
    # the banded candidate self-join is THE single candidate-rule
    # definition in dedup.lsh_candidate_pairs — reuse it (cap disabled:
    # already applied above under this function's own log label) so a
    # future change to the rule cannot silently diverge the vector-LSH
    # path from the document-LSH path it mirrors
    from mapreduce_framework_simple_spark.operators.dedup import (
        lsh_candidate_pairs,
    )

    cand_ids = lsh_candidate_pairs(
        bands.select(F.col("vec_id").alias("doc_id"), "band", "band_sig"),
        max_bucket_size=None,
    ).select(F.col("doc_a").alias("vec_a"), F.col("doc_b").alias("vec_b"))
    emb = df.select(F.col(id_col).alias("vec_id"), F.col(vec_col))
    cand = cand_ids.join(
        emb.select(
            F.col("vec_id").alias("vec_a"), F.col(vec_col).alias("emb_a")
        ),
        "vec_a",
    ).join(
        emb.select(
            F.col("vec_id").alias("vec_b"), F.col(vec_col).alias("emb_b")
        ),
        "vec_b",
    )
    # raw columns: dot_expr/norm_expr cast each element inside their
    # folds already — wrapping in to_double_array would cast everything
    # TWICE per candidate pair (the redundancy its docstring warns about)
    cos = F.round(
        dot_expr("emb_a", "emb_b") / (norm_expr("emb_a") * norm_expr("emb_b")),
        6,
    )
    return (
        cand.select("vec_a", "vec_b", cos.alias("cos_sim"))
        .where(F.col("cos_sim") >= threshold)
    )


_LSH_BANDS_SQL = _lsh_band_exprs_sql("embedding")
# generated from LSH_N_BANDS so a band-count retune cannot strand a
# frozen 2-band oracle against an n-band kernel
_LSH_BAND_COLS_SQL = ",\n               ".join(
    f"{expr} AS band{b}" for b, expr in enumerate(_LSH_BANDS_SQL)
)
_LSH_BAND_MATCH_SQL = " OR ".join(
    f"a.band{b} = b.band{b}" for b in range(len(_LSH_BANDS_SQL))
)
# Lower cut than q42: LSH band recall at cos≈0.45 on this weakly-clustered
# synthetic corpus keeps ~0 pairs; 0.30 keeps the operator observable
# (≈30 verified pairs at sf0.01) while exercising the identical pipeline.
NEARDUP_LSH_THRESHOLD = 0.3


@query(
    "q96_embed_neardup_lsh",
    oracle=f"""
    WITH sig AS (
        SELECT vec_id, embedding,
               {_LSH_BAND_COLS_SQL}
        FROM embeddings
    ),
    cand AS (
        SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b,
               a.embedding AS emb_a, b.embedding AS emb_b
        FROM sig a JOIN sig b
          ON a.vec_id < b.vec_id
         AND ({_LSH_BAND_MATCH_SQL})
    ),
    scored AS (
        SELECT vec_a, vec_b,
               round({_duck_dot('emb_a', 'emb_b')}
                     / ({_duck_norm('emb_a')} * {_duck_norm('emb_b')}), 6) AS cos_sim
        FROM cand
    )
    SELECT vec_a, vec_b, cos_sim FROM scored WHERE cos_sim >= {NEARDUP_LSH_THRESHOLD}
    """,
)
def q96_embed_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup, LSH-bucketed — the declared 100 TB path for
    q42's semantics: hyperplane sign-bit signatures, band-bucket
    candidate join, exact-cosine verification of candidates only. No
    all-pairs join, no driver-side vector materialization anywhere.

    The oracle replicates the ENTIRE pipeline in SQL (same inlined
    hyperplane constants, same sequential fold order, so every sign bit
    and cosine is bit-identical) — this checks the operator exactly, not
    just statistically; recall vs the exact q42 is covered separately in
    tests (planted near-dups, recall ≥ 0.9 at cos ≥ 0.95).

    At exploratory thresholds the band filter keeps only a slice
    of true pairs (hyperplane LSH is built for the cos → 1 regime);
    that trade is the point — candidates stay near-linear while q42 pays
    the quadratic ground-truth cost."""
    em = load_table(spark, "embeddings", sf_dir)
    return hyperplane_lsh_pairs(em, threshold=NEARDUP_LSH_THRESHOLD)


# ---------------------------------------------------------------------------
# IVF with a physical bucketed layout: the partition-pruned probe that the
# SCALE.md design promises ("in production the corpus is bucketed by
# cell_id so a probe is a partition-pruned read, not a filter").
# ---------------------------------------------------------------------------

def _auto_meta_centroids(spark: SparkSession, sf_dir: str,
                         cents: DataFrame) -> DataFrame | None:
    """Size-dispatch the two-level router on centroid count (the q07 /
    q120 planner-``if`` pattern): probe the centroid frame with the same
    ``limit(bound+1).count()`` probe :func:`_nearest_cells` refuses on.
    Within the broadcast bound → None (the flat path is correct and
    cheaper). Past it → auto-build the routing layer at the production
    sizing, ``kmeans_centroid_frame(k=⌈√K⌉)``, so a caller who hands
    ``write_ivf_index`` a K > MAX_BROADCAST_QUERIES frame gets the
    router the repo ships instead of the flat probe's loud refusal.
    The full ``cents.count()`` for sizing runs only in the over-bound
    branch — K rows, linear in the centroid count, never the corpus."""
    import math

    if cents.limit(MAX_BROADCAST_QUERIES + 1).count() <= MAX_BROADCAST_QUERIES:
        return None
    return kmeans_centroid_frame(
        spark, sf_dir, k=math.ceil(math.sqrt(cents.count()))
    )


def write_ivf_index(spark: SparkSession, sf_dir: str, path: str,
                    centroids: DataFrame | None = None,
                    meta_centroids: DataFrame | None = None) -> None:
    """IVF build step: materialize the corpus partitioned by cell_id.
    Each Voronoi cell becomes its own parquet directory, so a probe reads
    only the probed cells' files — partition pruning at the source, the
    layout that turns IVF from a full-scan-with-filter into a
    fraction-of-corpus read at 100 TB.

    ``centroids`` (production: :func:`kmeans_centroid_frame`, K ≈ √N) is
    persisted WITH the index under ``<path>/_centroids`` — the
    underscore prefix makes Spark's file listing skip it on the main
    index read — so every probe path reads back the exact centroid set
    the cells were built from; index and probe geometry cannot drift.
    None keeps the deterministic stride stand-in (oracle/test use) —
    and the STRIDE set is persisted too, so every complete index carries
    its geometry and a missing sidecar is unambiguous evidence of a
    partial build (the write order is index-then-sidecar because
    overwrite mode clears ``path`` first; :func:`_index_centroids`
    therefore treats an absent sidecar as fail-fast, never as a
    fallback — probing a k-means index with stride geometry would
    return silently wrong neighbors).

    The assignment frame is repartitioned BY CELL before the
    partitionBy write: without it every write task holds rows of most
    cells, so the layout fans out to tasks × K files (measured at the
    100× probe: 14,320 files for 447 cells, and the build was
    write-dominated at 190 s; with the shuffle: one file per cell,
    118 s — the remainder is the N·K assignment compute, not the
    write). At index scale (K = 10⁵ cells, 10³ write tasks) the
    unshuffled form is ~10⁸ tiny files — a listing/metadata failure
    mode, not just slow. One extra corpus shuffle is the right trade
    for a write-once index.

    ``meta_centroids`` (K > MAX_BROADCAST_QUERIES regime) switches the
    assignment to the two-level router (:func:`two_level_assignments`)
    and persists the meta layer under ``<path>/_meta_centroids`` — the
    probe path (:func:`ivf_probe_bucketed`) detects the sidecar and
    routes its probe selection the same way, so build and probe
    geometry (including the routing layer) cannot drift. When the
    caller passes NO meta layer but the centroid frame exceeds the
    flat broadcast bound, the meta layer is AUTO-BUILT
    (:func:`_auto_meta_centroids`, k = ⌈√K⌉) — the over-bound regime
    routes instead of hitting :func:`_nearest_cells`' refusal."""
    # cached: the centroid frame has three consumers per build (the
    # auto-dispatch probe, the assignment kernel's own bounded probe +
    # collect/route, the _centroids sidecar write) — K rows, linear in
    # the centroid count, never the corpus; without the cache a
    # corpus-derived frame re-scans its source for each
    cents = scoped_cache(
        centroids if centroids is not None else _stride_centroids(spark, sf_dir)
    )
    # Index contract: cell ids are NON-NEGATIVE. Both in-tree centroid
    # sources satisfy it by construction (kmeans enumerates 0..K-1, the
    # stride stand-in reuses non-negative vec_ids); enforcing it here —
    # one tiny action on the cached K-row frame of a write-once build —
    # is what lets ivf_probe_bucketed's past-bound branch state
    # `cell_id >= 0` as the selective predicate Catalyst's dynamic
    # partition pruning requires, without ever silently dropping a cell.
    bad = F.col("cell_id").isNull() | (F.col("cell_id") < 0)
    if cents.where(bad).limit(1).count() > 0:
        # NULL is as fatal as negative: NULL rows land in the
        # __HIVE_DEFAULT_PARTITION__ directory, and NEITHER probe branch
        # can select them (NULL isin [...] is never true; NULL >= 0
        # filters out) — every vector in that cell would silently vanish
        # from candidate sets
        raise ValueError(
            "centroid frame carries NULL or negative cell_id values; the "
            "IVF index contract requires non-negative cell ids (probe-"
            "side partition pruning states cell_id >= 0)"
        )
    if meta_centroids is None:
        meta_centroids = _auto_meta_centroids(spark, sf_dir, cents)
    assigned = (
        two_level_assignments(spark, sf_dir, cents, meta_centroids)
        if meta_centroids is not None
        else ivf_assignments(spark, sf_dir, centroids=cents)
    )
    assigned.repartition(
        "cell_id"
    ).write.partitionBy("cell_id").mode("overwrite").parquet(path)
    cents.write.mode("overwrite").parquet(path + "/_centroids")
    if meta_centroids is not None:
        meta_centroids.write.mode("overwrite").parquet(
            path + "/_meta_centroids"
        )


def _index_centroids(spark: SparkSession, index_path: str) -> DataFrame:
    """The centroid frame persisted with a bucketed IVF index. A missing
    sidecar means the build died between the index write and the sidecar
    write (or a pre-sidecar legacy layout): raise rather than guess — a
    probe against assumed geometry returns wrong neighbors silently."""
    try:
        return spark.read.parquet(index_path + "/_centroids")
    except AnalysisException:
        raise ValueError(
            f"IVF index at {index_path!r} has no _centroids sidecar: the "
            "index write did not complete (or predates sidecar layouts). "
            "Rebuild it with write_ivf_index — probing with assumed "
            "centroid geometry would silently return wrong neighbors."
        )


def _index_meta_centroids(spark: SparkSession,
                          index_path: str) -> DataFrame | None:
    """The routing (meta) layer persisted with a two-level index, or
    None for a flat index. UNLIKE :func:`_index_centroids`, absence is
    a VALID state (flat indexes carry no meta layer). A routed build
    that died between the `_centroids` and `_meta_centroids` writes
    surfaces here as flat — which probes the routed corpus with FLAT
    selection: same candidate cells ranked over ALL fine centroids
    instead of the routed subset, equal-or-better recall, never wrong
    geometry — so fail-open is safe here where it was not for the fine
    centroids (and it fails loudly anyway past the broadcast bound,
    where a flat probe of a >100k-centroid frame refuses)."""
    try:
        return spark.read.parquet(index_path + "/_meta_centroids")
    except AnalysisException:
        return None


# Scan-pruning dispatch bound for ivf_probe_bucketed: up to this many
# DISTINCT probed cells the scan predicate is a driver-collected
# `isin` IN-list (planner-evaluated partition pruning — the cheapest
# read when the deduplicated list stays planner-sized). Past the bound
# the probe frame stays DISTRIBUTED and a broadcast semi-join on
# cell_id prunes the bucketed scan instead (dynamic partition pruning
# does the file skipping) — the join side is the same bound class as
# MAX_BROADCAST_QUERIES: cell ids ≈ sub-MB broadcast, never
# corpus-sized.
#
# The bound is MEASURED, not reasoned (round 11; the earlier 10⁴ rested
# on a plan-literal-cost argument that was directionally right but ~20×
# high): tools/probe_crossover.py times both branches cold-for-cold
# over a 10⁵-cell bucketed layout across distinct-cell counts —
# committed as docs/probe_crossover_r11.json (a contended full sweep
# plus a quiet at-anchor confirmation, calibration ratio 1.006). The
# IN-list branch wins below ~300 cells (its only rival cost is the
# semi branch's flat ~0.1–0.2 s DPP-subquery + broadcast overhead) and
# LOSES from ~500 up, with a penalty that grows ~linearly in the
# literal count (0.83 s vs 0.59 s at 10³; 8.2 s vs 3.6 s at 10⁴;
# 73 s vs 33 s at 10⁵): expression construction, planner
# partition-pruning evaluation and plan serialization are all
# per-literal. The costs are ASYMMETRIC around the measured [300, 500]
# crossover bracket — picking too LOW costs at most the semi branch's
# flat overhead once per probe; picking too HIGH costs an unbounded
# linearly-growing planner stall — so the bound sits at 384, inside
# the bracket and nearer its isin-wins edge, erring toward the
# bounded-regret side. A second sweep at K=10⁴ total cells shows the
# crossover is K-sensitive DOWNWARD (the semi branch's flat overhead
# shrinks with index size while the IN-list penalty is roughly
# K-independent), so 384's low-side regret stays ≤0.25 s at both
# measured Ks — a K-aware bound buys nothing. Typical probe sets
# (heavily overlapping query cells; 17–65 distinct cells at the test
# SFs) stay on the IN-list branch; both branches remain equality- and
# plan-tested either side of the bound.
PROBE_ISIN_MAX_CELLS = 384


def ivf_probe_bucketed(spark: SparkSession, sf_dir: str, index_path: str) -> DataFrame:
    """Approximate top-k against the bucketed IVF index — q41's answer,
    but the candidate read is PARTITION-PRUNED: the probed cell ids
    (a few ints per query, from the tiny query×centroid ranking —
    bounded by Q·N_PROBE and by K, never corpus-sized) prune the index
    scan so only probed directories are read. HOW they prune is a
    measured-size dispatch (``PROBE_ISIN_MAX_CELLS``): a driver-collected
    ``isin`` IN-list while the distinct-cell list is planner-sized, a
    broadcast LEFT SEMI join on ``cell_id`` (dynamic partition pruning
    skips unprobed directories at runtime) past it — the dispatch and
    the IN-list share one collect capped at bound+1 rows, so no driver
    structure ever exceeds the bound.
    The probe geometry comes from the centroids stored WITH the index
    (:func:`_index_centroids`). Tests assert result equality with the
    recompute formulation and the pruning shape of both branches. A
    two-level index (built with ``meta_centroids=``) is detected by its
    ``_meta_centroids`` sidecar and probed with the ROUTED selection —
    read geometry always matches build geometry, routing layer
    included."""
    cents = _index_centroids(spark, index_path)
    meta = _index_meta_centroids(spark, index_path)
    probes = scoped_cache(
        two_level_probes(spark, sf_dir, cents, meta)
        if meta is not None
        else _ivf_probes(spark, sf_dir, centroids=cents)
    )
    # probes is cached so the dispatch probe, the pruning side and the
    # candidate join share one computation of the centroid ranking
    cells = probes.select("cell_id").distinct()
    idx = spark.read.parquet(index_path)
    # ONE bounded collect serves both the dispatch and the IN-list: a
    # separate limit(bound+1).count() probe would re-run the distinct
    # shuffle a second time for the below-bound collect, and bound+1
    # single-int64 rows (a few KB at the measured 384 bound) is driver-safe
    # either way
    rows = cells.limit(PROBE_ISIN_MAX_CELLS + 1).collect()
    if len(rows) <= PROBE_ISIN_MAX_CELLS:
        probe_cells = sorted(r["cell_id"] for r in rows)
        idx = idx.where(F.col("cell_id").isin(probe_cells))
    else:
        # `cell_id >= 0` is the index CONTRACT (enforced at build by
        # write_ivf_index), restated here because Catalyst's dynamic
        # partition pruning only inserts its runtime subquery when the
        # filtering side carries a likely-selective predicate
        # (PartitionPruning.hasPartitionPruningFilter) — the probe
        # side's real selectivity (Q·N_PROBE of K cells) hides inside
        # the cached plan. With it, the bucketed scan's PartitionFilters
        # gain dynamicpruningexpression(cell_id IN <subquery>) reusing
        # the semi-join's broadcast: file skipping at runtime, no
        # driver-sized structure anywhere.
        idx = idx.join(
            F.broadcast(cells.where(F.col("cell_id") >= 0)),
            "cell_id",
            "left_semi",
        )
    # the probes cache stays live for the returned (lazy) plan: it is
    # Q·N_PROBE rows — bounded driver-of-the-query state, one small DF
    return _score_and_rank_candidates(probes.join(idx, "cell_id"))


@query(
    "q109_centroid_assign",
    oracle=f"""
    WITH e AS (SELECT vec_id, label,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
               FROM embeddings),
    ex AS (SELECT label, generate_subscripts(vec, 1) AS pos, unnest(vec) AS x
           FROM e),
    cd AS (SELECT label AS clabel, pos,
                  CAST(sum(CAST(round(x * 1e12) AS HUGEINT)) AS DOUBLE)
                      / (1e12 * count(*)) AS cx
           FROM ex GROUP BY 1, 2),
    cent AS (SELECT clabel, list(cx ORDER BY pos) AS cvec FROM cd GROUP BY 1),
    scored AS (SELECT e.vec_id, e.label, cent.clabel,
                      round({_duck_dot('e.vec', 'cent.cvec')}
                            / ({_duck_norm('e.vec')} * {_duck_norm('cent.cvec')}),
                            9) AS cos
               FROM e CROSS JOIN cent),
    pred AS (SELECT vec_id, label, clabel AS pred_label
             FROM (SELECT *, row_number() OVER (
                       PARTITION BY vec_id ORDER BY cos DESC, clabel ASC) AS rn
                   FROM scored)
             WHERE rn = 1)
    SELECT label, CAST(pred_label AS INT) AS pred_label,
           CAST(count(*) AS BIGINT) AS n
    FROM pred GROUP BY label, pred_label
    """,
)
def q109_centroid_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid classification over the embedding corpus: average
    each label's vectors into a centroid, assign every vector to its
    highest-cosine centroid, and report the label × predicted-label
    confusion counts — the standard cluster-purity / probe-classifier
    check run on embedding tables before using them for curation.

    Scale: the centroid build is one posexplode + (label, pos) partial
    aggregation — corpus-sized map work but a tiny shuffle (labels × dim
    rows). Centroids then BROADCAST (labels × dim doubles — KBs), so
    assignment is a map-side cross product with 10 fused dot products per
    row and zero shuffle; the confusion aggregation moves ≤ labels² rows.
    Cosines are rounded to 9 dp before the argmax so a 1-ULP libm
    difference can never flip the winner across engines; ties break to
    the smaller label in both (max_by on (cos, -label)). Centroid
    coordinates are FIXED-POINT sums (exact integer pico-units /1e12,
    decimal/HUGEINT — a float avg() merges partials in layout-dependent
    order, drifting centroids by several ULPs across partitionings; the
    ≤1e-12 quantization sits three orders below the 0.5e-9 cosine
    rounding quantum)."""
    e = load_table(spark, "embeddings", sf_dir).select(
        "vec_id", "label", to_double_array("embedding").alias("vec")
    )
    cent = (
        e.select("label", F.posexplode("vec").alias("pos", "x"))
        .groupBy(F.col("label").alias("clabel"), F.col("pos"))
        .agg(
            (
                F.sum(F.round(F.col("x") * 1e12).cast("decimal(38,0)")).cast("double")
                / (1e12 * F.count("*"))
            ).alias("cx")
        )
        .groupBy("clabel")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "cx"))),
                lambda s: s.cx,
            ).alias("cvec")
        )
    )
    scored = e.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        "label",
        "clabel",
        F.round(
            dot_expr("vec", "cvec") / (norm_expr("vec") * norm_expr("cvec")), 9
        ).alias("cos"),
    )
    pred = scored.groupBy("vec_id", "label").agg(
        F.max_by(
            "clabel", F.struct(F.col("cos"), (-F.col("clabel")).cast("double"))
        ).alias("pred_label")
    )
    return pred.groupBy("label", "pred_label").agg(F.count("*").alias("n"))


KNN_K = 3


def _knn_vote_predictions(top: DataFrame, labels: DataFrame) -> DataFrame:
    """(query_id, pred_label) from ranked neighbor rows (query_id,
    neighbor_id, rnk) — THE single definition of the kNN vote rule
    (majority label, tied counts fall back to the nearest neighbor via
    min best_rank), shared by the exact q120 and the IVF audit twin so
    the two paths cannot diverge on tie handling. ``labels`` maps
    (neighbor_id, nlabel); unhinted join (corpus-sized at scale)."""
    votes = top.join(labels, "neighbor_id")
    grp = votes.groupBy("query_id", "nlabel").agg(
        F.count("*").alias("cnt"), F.min("rnk").alias("best_rank")
    )
    return grp.groupBy("query_id").agg(
        F.max_by(
            "nlabel", F.struct(F.col("cnt"), (-F.col("best_rank")).alias("nr"))
        ).alias("pred_label")
    )


def ivf_knn_predictions(
    spark: SparkSession, sf_dir: str, index_path: str
) -> DataFrame:
    """(query_id, pred_label) leave-one-out kNN predictions for EVERY
    corpus vector, on the bucketed IVF index: each vector probes its
    N_PROBE nearest cells and votes over its KNN_K nearest neighbors
    within them — exact cosine there, q120's rounding and vote rule
    (:func:`_knn_vote_predictions`). Probe geometry comes from the
    centroids stored with the index. A vector whose probed cells hold
    no other vectors yields no prediction row — the confusion wrapper
    surfaces those as NULL pred_label rather than dropping them."""
    em = load_table(spark, "embeddings", sf_dir)
    all_q = em.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    cents = _index_centroids(spark, index_path)
    probes = _ivf_probes(spark, sf_dir, queries=all_q, centroids=cents)
    idx = spark.read.parquet(index_path)
    # rank explicitly at KNN_K depth — the default TOP_K truncation
    # would silently clip the vote set if KNN_K were ever raised past it
    top = _score_and_rank_candidates(
        probes.join(idx, "cell_id"), k=KNN_K
    )
    labels = em.select(
        F.col("vec_id").alias("neighbor_id"), F.col("label").alias("nlabel")
    )
    return _knn_vote_predictions(top, labels)


def ivf_knn_confusion(
    spark: SparkSession, sf_dir: str, index_path: str
) -> DataFrame:
    """Leave-one-out kNN audit on the BUCKETED IVF INDEX — q120's
    semantics on the subquadratic path, returning the same
    (label, pred_label, n) confusion schema. Vectors whose probed cells
    hold no other vectors appear with NULL pred_label (truth-side left
    join) instead of vanishing — every corpus vector is accounted for.

    Scale — stated precisely, since the query side here IS the corpus:
    with K centroids, probe selection costs N·K cosines against a
    broadcast K-row centroid table, and the candidate join (probes ⋈
    index on cell_id, both sides shuffled once by cell, no broadcast of
    anything corpus-sized) costs N·N_PROBE·(N/K). Under the production
    configuration — an index built with ``centroids=``
    :func:`kmeans_centroid_frame` (K ≈ √N k-means centroids, read back
    from the index here) — BOTH terms are O(N^1.5·n_probe), the audit's
    win over exact q120's O(N²), and the centroid table is √N rows
    (~10^5 at 10^10 vectors), comfortably broadcastable. A stride-built
    index (K = N/31, kept for oracle determinism) lacks that sizing —
    its probe-selection term is N²/31 — so production indexes pass
    k-means centroids; the whole plan is identical either way. Per-query
    agreement with the exact q120 is asserted ≥ 0.55 in tests on BOTH
    centroid sources at sf0.001 (weakly-clustered synthetic embeddings;
    agreement is governed by probe coverage exactly like q41's recall ≥
    0.6 — real embedding corpora cluster far tighter)."""
    pred = ivf_knn_predictions(spark, sf_dir, index_path)
    truth = load_table(spark, "embeddings", sf_dir).select(
        F.col("vec_id").alias("query_id"), "label"
    )
    return (
        truth.join(pred, "query_id", "left")
        .groupBy("label", "pred_label")
        .agg(F.count("*").alias("n"))
    )


@query(
    "q120_knn_accuracy",
    oracle=f"""
    WITH scored AS (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               round({_duck_dot('a.embedding', 'b.embedding')}
                     / ({_duck_norm('a.embedding')} * {_duck_norm('b.embedding')}), 6)
                   AS cos_sim
        FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
    ),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY cos_sim DESC, neighbor_id) AS rnk
        FROM scored
    ),
    votes AS (SELECT r.query_id, l.label AS nlabel, r.rnk
              FROM ranked r JOIN embeddings l ON l.vec_id = r.neighbor_id
              WHERE r.rnk <= {KNN_K}),
    grp AS (SELECT query_id, nlabel, count(*) AS cnt, min(rnk) AS best_rank
            FROM votes GROUP BY 1, 2),
    pred AS (SELECT query_id, nlabel AS pred_label
             FROM (SELECT *, row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY cnt DESC, best_rank ASC) AS pr
                   FROM grp)
             WHERE pr = 1)
    SELECT t.label, CAST(p.pred_label AS INT) AS pred_label,
           CAST(count(*) AS BIGINT) AS n
    FROM pred p JOIN embeddings t ON t.vec_id = p.query_id
    GROUP BY 1, 2
    """,
)
def q120_knn_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN classification audit: every vector is classified by majority
    label of its 3 nearest neighbors (cosine; tied vote counts fall back
    to the nearest neighbor's label — min(best_rank) makes the rule
    total and deterministic) and the label × predicted-label confusion
    counts come back — the standard leave-one-out check of whether an
    embedding space separates its labels, run before trusting embeddings
    for curation. Complements q109 (centroid parametric twin).

    Scale: kernel choice is a size-based planner `if` — under the
    documented broadcast bound the corpus ships as the q40 kernel's
    reference set (per-batch top-k pruning, self excluded in-kernel);
    beyond it the scan switches AUTOMATICALLY to the directed block
    self-join kernel (:func:`_block_topk_cosine` — same chunked
    distributed shape as q42, per-chunk top-k pruning), so a
    corpus-sized self-kNN never attempts a corpus broadcast. Both
    kernels emit margin-pruned supersets of the global rounded top-k;
    the one window shuffle carries O(N·k·blocks-or-batches) rows, not
    N². The dispatch count() is one cheap scan-count action. Cosines
    are rounded to 6 dp before ranking, so neighbor order cannot flip
    across engines. Exact self-kNN work stays quadratic by definition —
    the measured subquadratic audit for 100 TB use is
    :func:`ivf_knn_confusion` (same vote rule, IVF-probed candidates,
    agreement-tested against this query)."""
    em = load_table(spark, "embeddings", sf_dir)
    ref = em.select("vec_id", "embedding")
    n_ref = ref.count()
    if n_ref <= MAX_BROADCAST_QUERIES:
        scored_raw = _pairwise_cosine_scan(
            spark, sf_dir, ref, emit_top_k=KNN_K, ref_count=n_ref
        )
    else:
        scored_raw = _block_topk_cosine(spark, sf_dir, KNN_K).withColumnRenamed(
            "cos_raw", "cos_sim_raw"
        )
    scored = scored_raw.select(
        "query_id",
        "neighbor_id",
        F.round(F.col("cos_sim_raw"), 6).alias("cos_sim"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    top = scored.withColumn("rnk", F.row_number().over(w)).where(F.col("rnk") <= KNN_K)
    # per-vector label map: unhinted (a hint is unconditional; the map is
    # corpus-sized at scale) — broadcast under the threshold, shuffled
    # join on the O(N·k) top list beyond it
    labels = em.select(F.col("vec_id").alias("neighbor_id"), F.col("label").alias("nlabel"))
    pred = _knn_vote_predictions(top, labels)
    truth = em.select(F.col("vec_id").alias("query_id"), "label")
    return (
        pred.join(truth, "query_id")
        .groupBy("label", "pred_label")
        .agg(F.count("*").alias("n"))
    )
