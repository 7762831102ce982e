"""Similarity search over embedding columns (``array<float>``).

  * ``topk_brute_force`` — exact cosine top-k: broadcast the (small) query
    set against the corpus, score with native zip_with/aggregate expressions,
    rank per query.  This is the correctness baseline and is already the
    right plan when |queries| is small: the corpus is scanned ONCE, never
    shuffled; ranking is the two-phase ``_rank_topk`` below, whose only
    shuffle is ~k rows per (query, Arrow batch).
  * ``topk_brute_force_pandas`` — same semantics via an Arrow-batched
    numpy matmul (vectorized; faster for wide vectors / many queries).
  * ``lsh_hyperplane_buckets`` / ``topk_lsh`` — the scale path: deterministic
    random-hyperplane signatures (hash-seeded, no rand()) bucket the corpus;
    queries probe their own bucket (+ optional 1-bit flips), so each query
    scores ~corpus/2^bits candidates instead of everything.

Determinism: scores are computed in float64 and ties broken by id; the
hyperplane matrix derives from md5, so every run and engine sees the same
planes.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..tuning import ensure_jit_codegen

__all__ = [
    "dot",
    "l2_norm",
    "cosine",
    "topk_brute_force",
    "topk_brute_force_pandas",
    "hyperplanes",
    "lsh_signature",
    "topk_lsh",
    "topk_auto",
    "choose_topk_path",
    "embedding_near_dup_pairs",
    "seed_centroids",
    "kmeans_refine",
    "topk_ivf",
    "TOPK_CROSSOVER_PAIRS",
]

# Measured crossover (dim=64, bits=8, tables=4, multiprobe=1).  Round-3
# re-measure at local[32] AFTER the norm-precompute (5.2x brute speedup) and
# two-phase rank — the boundary barely moved because LSH's candidate scoring
# sped up the same way:
#   corpus x queries   pairs   brute     lsh      winner
#   100k x 10          1e6     5.9s      ~19s*    brute   (*sig map dominates)
#   20k  x 100         2e6     12.4s     5.6s     lsh (2.2x)
#   100k x 100         1e7     69.5s     20.4s    lsh (3.4x)
# (round-2 local[8] matrix with the old scorer: 2k x 10 brute 1.4 / lsh 5.8;
#  20k x 100 brute 63.2 / lsh 8.9; 100k x 100 brute 312 / lsh 21.1.)
# Brute cost ~ |C|x|Q| scores; LSH pays a fixed |C| x tables x bits signature
# map plus ~|C|x|Q| x tables/2^bits candidate scores, so the boundary sits
# near |C| x |Q| ~= 1e6 pairs for these defaults.
TOPK_CROSSOVER_PAIRS = 1_000_000

# The Arrow-batched numpy-matmul brute twin dominates BOTH in its regime —
# measured (same r3 conditions): 0.59s at 2e5 pairs, 1.79s at 2e6 (expr
# brute 12.4s, LSH 5.6s), 5.06s at 1e7 (expr 69.5s, LSH 20.4s) — EXACT
# results 4x faster than approximate LSH.  Matmul cost is linear in pairs
# (~0.5s / 1e6 here); LSH's is corpus-bound (signature map), so the lines
# cross near 3e7 pairs for these defaults.  The matmul path requires the
# query set on the driver (its documented contract), hence the query cap.
TOPK_PANDAS_LSH_CROSSOVER_PAIRS = 30_000_000
TOPK_MAX_DRIVER_QUERIES = 10_000


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot(a, b) / denom).otherwise(F.lit(0.0))


def _rank_topk(scored: DataFrame, k: int, query_id: str, id_col: str) -> DataFrame:
    """Two-phase top-k over a scored candidate frame.

    Phase 1 (narrow, no shuffle): a per-partition partial top-k — each Arrow
    batch keeps only its best ``k`` rows per query (exact order: score desc,
    id asc), so at most k rows per (query, batch) survive.  Phase 2 (one slim
    shuffle of ~k*P rows per query): merge the survivors with a
    slice(array_sort(collect_list(struct)), 1, k) aggregate and rank by array
    position.  No task ever materializes a query's full candidate set — the
    old ``row_number() OVER (PARTITION BY query_id)`` form put |candidates|
    rows of each query in ONE task, which is a scale-killer when candidates ~
    |corpus| (brute force) at 10^12 docs.

    Exactness: phase 1 keeps each batch's top-k under the SAME total order
    the final rank uses, and the global top-k is a subset of the union of
    per-batch top-k's, so the result is identical to the single-window form
    (regression-tested + oracle-checked).

    Measured (scripts/topk_rank_ab.py, 100k corpus x 10 queries, local[32]):
    window 5.92s vs two-phase 6.11s min-warm — wall parity (+3% Arrow-pass
    constant) with byte-identical results; the win is boundedness, not
    small-scale speed: the window form holds |corpus| rows per query in one
    task (OOM at 10^9+), two-phase never exceeds the Arrow batch + k*P merge.
    """
    fields = {f.name: f.dataType.simpleString() for f in scored.schema.fields}
    out_schema = f"{query_id} {fields[query_id]}, {id_col} {fields[id_col]}, score double"
    qcol, icol, kk = query_id, id_col, k  # plain values only in the closure

    def partial_topk(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            yield (
                pdf.sort_values(["score", icol], ascending=[False, True], kind="mergesort")
                .groupby(qcol, sort=False)
                .head(kk)
            )

    survivors = scored.select(
        query_id, id_col, F.col("score").cast("double").alias("score")
    ).mapInPandas(
        partial_topk, schema=out_schema
    )
    merged = survivors.groupBy(query_id).agg(
        F.slice(
            F.array_sort(
                F.collect_list(
                    F.struct((-F.col("score")).alias("ns"), F.col(id_col).alias("i"))
                )
            ),
            1,
            k,
        ).alias("__top")
    )
    return merged.select(
        F.col(query_id), F.posexplode("__top").alias("__r", "__t")
    ).select(
        query_id,
        F.col("__t.i").alias(id_col),
        F.round(-F.col("__t.ns"), 6).alias("score"),
        (F.col("__r") + 1).cast("int").alias("rank"),
    )


def topk_brute_force(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "query_id",
    metric: str = "cosine",
) -> DataFrame:
    """Exact top-k: corpus x broadcast(queries); returns
    (query_id, vec_id, score, rank) with deterministic id tie-breaks."""
    ensure_jit_codegen(corpus.sparkSession)
    q = queries.select(
        F.col(id_col).alias(query_id),
        F.col(vec_col).alias("__qvec"),
        l2_norm(F.col(vec_col)).alias("__qn"),
    )
    # norms precomputed ONCE per vector (corpus side in the scan projection,
    # query side in the broadcast): cosine() inline would recompute the
    # corpus norm per query and the query norm per corpus row — 3 dots per
    # pair instead of 1 (measured 5.2x end-to-end at 100k x 10: 31.0s -> 5.9s)
    c = corpus.select(id_col, vec_col, l2_norm(F.col(vec_col)).alias("__cn"))
    if metric == "cosine":
        denom = F.col("__cn") * F.col("__qn")
        score = F.when(denom > 0, dot(F.col(vec_col), F.col("__qvec")) / denom).otherwise(
            F.lit(0.0)
        )
    else:
        score = dot(F.col(vec_col), F.col("__qvec"))
    scored = c.crossJoin(F.broadcast(q)).select(query_id, id_col, score.alias("score"))
    return _rank_topk(scored, k, query_id, id_col)


def topk_brute_force_pandas(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "query_id",
) -> DataFrame:
    """Same result via one numpy matmul per Arrow batch: queries are collected
    to the driver (small by contract) and closed over; the corpus streams
    through mapInPandas without shuffle."""
    import numpy as _np

    ensure_jit_codegen(corpus.sparkSession)
    qrows = queries.select(id_col, vec_col).collect()
    q_ids = [r[id_col] for r in qrows]
    # one C-level stack, same as the corpus side (driver-side and small by
    # contract, but symmetric with the batch path)
    q_mat = _np.array([r[vec_col] for r in qrows], dtype=_np.float64)

    # id dtypes derived from the INPUT schemas (string doc ids etc. must
    # round-trip — hardcoding 'long' mis-casts or fails in Arrow when
    # topk_auto routes a non-integer-id frame here)
    c_id_type = {f.name: f.dataType.simpleString() for f in corpus.schema.fields}[id_col]
    q_id_type = {f.name: f.dataType.simpleString() for f in queries.schema.fields}[id_col]
    out_schema = f"{query_id} {q_id_type}, {id_col} {c_id_type}, score double"

    def score_batches(batches):
        import numpy as np
        import pandas as pd

        qm = np.asarray(q_mat, dtype=np.float64)  # (Q, D)
        qn = np.linalg.norm(qm, axis=1)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            # one C-level stack per Arrow batch (each element arrives as a
            # numpy array already) — no per-row Python float loop in the
            # hot path
            cm = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64, copy=False)
            cn = np.linalg.norm(cm, axis=1)
            denom = np.outer(cn, qn)
            sims = np.divide(cm @ qm.T, denom, out=np.zeros_like(denom), where=denom > 0)
            n = len(pdf)
            yield pd.DataFrame(
                {
                    query_id: np.repeat(q_ids, n),
                    id_col: list(pdf[id_col]) * len(q_ids),
                    "score": sims.T.reshape(-1),
                }
            )

    scored = corpus.select(id_col, vec_col).mapInPandas(score_batches, schema=out_schema)
    return _rank_topk(scored, k, query_id, id_col)


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: coarse-quantizer cells + nprobe search.
# ---------------------------------------------------------------------------


def seed_centroids(
    corpus: DataFrame, n_cells: int, *, id_col: str = "vec_id", vec_col: str = "embedding"
) -> list[list[float]]:
    """Deterministic coarse-quantizer seeds: the ``n_cells`` corpus vectors
    ranked first by md5 of their id — a data-dependent but seed-free pick
    that any engine can reproduce with ORDER BY md5(id) LIMIT k (which is
    what the DuckDB oracle does).  Cell order = the md5 rank."""
    rows = (
        corpus.select(id_col, vec_col)
        .orderBy(F.md5(F.col(id_col).cast("string")))
        .limit(n_cells)
        .collect()
    )
    return [[float(x) for x in r[vec_col]] for r in rows]


def kmeans_refine(
    corpus_sample: list[list[float]], centroids: list[list[float]], iters: int = 10
) -> list[list[float]]:
    """Optional Lloyd refinement of the seed centroids on a driver-side
    sample (numpy, deterministic: fixed init + iteration count, no RNG).
    Better cell balance / recall than raw seeds; NOT SQL-reproducible, so
    the oracle path uses the raw seeds and this is recall-tested in pytest."""
    import numpy as np

    x = np.asarray(corpus_sample, dtype=np.float64)
    c = np.asarray(centroids, dtype=np.float64)
    for _ in range(iters):
        # cosine assignment (normalize both sides)
        xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        cn = c / np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-12)
        assign = (xn @ cn.T).argmax(axis=1)
        for j in range(len(c)):
            members = x[assign == j]
            if len(members):
                c[j] = members.mean(axis=0)
    return [[float(v) for v in row] for row in c]


def _cell_dots(vec: Column, centroids: list[list[float]]) -> Column:
    """Array of raw <vec, centroid_j> dot products.  Assignment is by max
    INNER PRODUCT, not cosine: raw centroid components stay byte-exact
    across engines (normalizing on the driver would bake Python's summation
    order into the literals and flip ulp-close argmax ties in the oracle)."""
    # one ARRAY LITERAL per centroid (not CreateArray of n Literal nodes):
    # round-6 profiling put ~3s of every topk_* call in driver-side plan
    # construction/analysis of the element-wise literal trees; F.lit(row)
    # is a single Literal node with identical values
    return F.array(*[dot(vec, F.lit([float(v) for v in row])) for row in centroids])


def assign_cell(vec: Column, centroids: list[list[float]]) -> Column:
    """1-based cell id = argmax centroid inner product (first index wins ties)."""
    dots = _cell_dots(vec, centroids)
    return F.array_position(dots, F.array_max(dots)).cast("int")


def topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    *,
    n_cells: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "query_id",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF approximate top-k: corpus vectors are bucketed into ``n_cells``
    coarse-quantizer cells (argmax centroid cosine, a pure expression over
    broadcast-free centroid literals — the corpus is scanned once, never
    shuffled for the index); each query probes its ``nprobe`` closest cells
    and scores only those cells' members.

    Per-query cost ~ |corpus| x nprobe / n_cells.  Pass ``centroids`` (e.g.
    kmeans_refine output) for better recall; default = seed_centroids, which
    the DuckDB oracle reproduces exactly."""
    ensure_jit_codegen(corpus.sparkSession)
    if centroids is None:
        centroids = seed_centroids(corpus, n_cells, id_col=id_col, vec_col=vec_col)
    c = corpus.select(
        F.col(id_col),
        F.col(vec_col),
        l2_norm(F.col(vec_col)).alias("__cn"),
        assign_cell(F.col(vec_col), centroids).alias("__cell"),
    )
    qdots = _cell_dots(F.col(vec_col), centroids)
    # nprobe nearest cells: rank (dot desc, cell asc) via array sort on
    # (-dot, idx) structs, then take the first nprobe indices
    ranked = F.array_sort(
        F.zip_with(
            qdots,
            F.sequence(F.lit(1), F.lit(len(centroids))),
            lambda d, i: F.struct((-d).alias("nd"), i.alias("idx")),
        )
    )
    probes = F.slice(F.transform(ranked, lambda s: s["idx"]), 1, nprobe)
    q = queries.select(
        F.col(id_col).alias(query_id),
        F.col(vec_col).alias("__qvec"),
        l2_norm(F.col(vec_col)).alias("__qn"),
        F.explode(probes).alias("__cell"),
    )
    denom = F.col("__cn") * F.col("__qn")
    cand = c.join(F.broadcast(q), on="__cell").select(
        query_id,
        id_col,
        F.when(denom > 0, dot(F.col(vec_col), F.col("__qvec")) / denom)
        .otherwise(F.lit(0.0))
        .alias("score"),
    )
    return _rank_topk(cand, k, query_id, id_col)


def choose_topk_path(
    n_corpus: int,
    n_queries: int,
    crossover: int = TOPK_CROSSOVER_PAIRS,
    *,
    allow_pandas: bool = True,
    pandas_crossover: int = TOPK_PANDAS_LSH_CROSSOVER_PAIRS,
    max_driver_queries: int = TOPK_MAX_DRIVER_QUERIES,
) -> str:
    """Three-way pick by the measured crossovers: 'brute' (pure-JVM
    expressions) for tiny jobs, 'pandas' (exact Arrow/numpy matmul) through
    the mid range whenever the query set fits the driver, 'lsh'
    (approximate) only beyond the matmul/LSH crossover or when the query set
    itself is too big to collect."""
    pairs = n_corpus * n_queries
    if pairs < crossover:
        return "brute"
    if allow_pandas and n_queries <= max_driver_queries and pairs < pandas_crossover:
        return "pandas"
    return "lsh"


def topk_auto(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    *,
    n_corpus: int | None = None,
    n_queries: int | None = None,
    crossover: int = TOPK_CROSSOVER_PAIRS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "query_id",
    bits: int = 8,
    tables: int = 4,
    multiprobe: int = 1,
    dim: int | None = None,
) -> DataFrame:
    """Auto-pick expression-brute vs numpy-matmul-brute vs hyperplane-LSH by
    the measured |corpus| x |queries| crossovers (TOPK_CROSSOVER_PAIRS /
    TOPK_PANDAS_LSH_CROSSOVER_PAIRS).  Pass ``n_corpus`` / ``n_queries``
    when known to skip the count() scans (parquet counts are footer-stat
    cheap, but a known cardinality is free)."""
    n_c = n_corpus if n_corpus is not None else corpus.count()
    n_q = n_queries if n_queries is not None else queries.count()
    path = choose_topk_path(n_c, n_q, crossover)
    if path == "lsh":
        return topk_lsh(
            corpus, queries, k,
            bits=bits, tables=tables, multiprobe=multiprobe, dim=dim,
            id_col=id_col, vec_col=vec_col, query_id=query_id,
        )
    if path == "pandas":
        return topk_brute_force_pandas(
            corpus, queries, k, id_col=id_col, vec_col=vec_col, query_id=query_id
        )
    return topk_brute_force(
        corpus, queries, k, id_col=id_col, vec_col=vec_col, query_id=query_id
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 8,
    tables: int = 4,
    dim: int | None = None,
    max_bucket: int = 1000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs — the vector twin of the
    MinHash/SimHash dedup family: candidates share a hyperplane-LSH bucket in
    at least one of ``tables`` signature tables (collision probability
    (1 - theta/pi)^bits per table, near 1 for near-parallel vectors), then
    exact float64 cosine verifies.  The corpus is mapped once (signatures are
    pure expressions); the only shuffle is the bucket self-join — never
    all-pairs.  Deterministic md5 hyperplanes keep it oracle-reproducible.

    Payload discipline: the banded frame is SLIM (id + tagged signature);
    vectors persist once at x1 and re-attach by id only AFTER candidate
    dedup, so the vector payload never crosses the persist or the self-join
    shuffle x tables (the round-2 shape did both)."""
    from pyspark import StorageLevel

    ensure_jit_codegen(df.sparkSession)
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    vecs = df.select(
        id_col, vec_col, l2_norm(F.col(vec_col)).alias("__n")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    sig_tagged = [
        F.concat(F.lit(f"{t}:"), F.expr(_sig_sql(vec_col, hyperplanes(dim, bits, seed=f"lsh-{t}"))))
        for t in range(tables)
    ]
    banded_cached = vecs.select(
        id_col, F.explode(F.array(*sig_tagged)).alias("__sig")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    # degenerate-bucket guard (minhash_lsh_pairs parity): a signature shared
    # by >max_bucket vectors (e.g. mass-identical or zero vectors) makes the
    # self-join quadratic in that bucket — drop such buckets wholesale.
    # Contract: a dropped bucket can lose pairs; a near-dup cluster still
    # pairs via its other ``tables`` signatures unless all are degenerate.
    bucket_sizes = banded_cached.groupBy("__sig").agg(F.count(F.lit(1)).alias("__bn"))
    banded = banded_cached.join(
        F.broadcast(bucket_sizes.filter(F.col("__bn") > max_bucket)),
        on="__sig",
        how="left_anti",
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(b, on="__sig")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    cand = cand.join(
        vecs.select(
            F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"), F.col("__n").alias("__na")
        ),
        on="id_a",
    ).join(
        vecs.select(
            F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"), F.col("__n").alias("__nb")
        ),
        on="id_b",
    )
    denom = F.col("__na") * F.col("__nb")
    from .dedup import _with_cached_deps

    return _with_cached_deps(
        cand.withColumn(
            "cosine",
            F.when(denom > 0, dot(F.col("__va"), F.col("__vb")) / denom).otherwise(F.lit(0.0)),
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine")),
        [vecs, banded_cached],
    )


def hyperplanes(dim: int, bits: int, seed: str = "lsh") -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes: component (i,j) from md5 —
    reproducible across runs, engines and languages (no RNG state)."""
    planes = []
    for i in range(bits):
        row = []
        for j in range(dim):
            h = hashlib.md5(f"{seed}:{i}:{j}".encode()).hexdigest()
            row.append((int(h[:8], 16) / 0x7FFFFFFF) - 1.0)  # ~uniform [-1, 1)
        planes.append(row)
    return planes


def lsh_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit signature string, one char per hyperplane."""
    bits = [
        F.when(
            dot(vec, F.array(*[F.lit(x) for x in row])) >= 0, F.lit("1")
        ).otherwise(F.lit("0"))
        for row in planes
    ]
    return F.concat(*bits)


def _sig_sql(vec_name: str, planes: list[list[float]]) -> str:
    """``lsh_signature`` as ONE SQL string over a named vector column.

    Driver-side cost fix (round 6): building the signature through the
    Column API issues ~27k py4j round-trips per topk_lsh call (one per
    element literal, two lambda constructions per dot), measured as ~3s of
    every call's wall BEFORE any execution.  Parsing one SQL string
    JVM-side produces the IDENTICAL expression tree (same zip_with /
    aggregate fold, same cast and comparison semantics; float literals use
    repr round-trip so the doubles are bit-equal) — parity is pinned by
    tests/test_training_ops.py::test_sig_sql_matches_column_api."""
    vec_ref = "`" + vec_name.replace("`", "``") + "`"  # escape embedded backticks
    bits = []
    for row in planes:
        arr = "array(" + ",".join(f"CAST({float(x)!r} AS DOUBLE)" for x in row) + ")"
        d = (
            f"aggregate(zip_with({vec_ref}, {arr}, "
            "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
            "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
        )
        bits.append(f"CASE WHEN {d} >= 0 THEN '1' ELSE '0' END")
    return "concat(" + ", ".join(bits) + ")"


def topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    *,
    bits: int = 8,
    tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "query_id",
    multiprobe: int = 1,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k via the standard L-table hyperplane-LSH construction:
    ``tables`` independent signatures bucket the corpus; each query probes its
    own bucket (+ ``multiprobe`` 1-bit-flip neighbors) in EVERY table and the
    candidate sets union.  Tune (bits up = fewer candidates, tables/probes up
    = higher recall); recall is regression-tested against topk_brute_force.

    Scale shape: the corpus is mapped once per run (signatures are pure
    expressions), the tiny probe set broadcasts, and only candidate rows are
    scored — per-query cost ~ tables * corpus / 2^bits instead of |corpus|.
    """
    ensure_jit_codegen(corpus.sparkSession)
    # hyperplane construction needs the vector dimensionality, which
    # array<float> schemas don't carry — pass ``dim`` to avoid the
    # driver-side probe read
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    # one F.expr per signature instead of per-element Column calls — see
    # _sig_sql (kills ~3s of py4j chatter per topk_lsh call).  Signatures
    # are STAGED as projected columns on both sides; the explode arrays and
    # the multiprobe bit-flips then reference tiny column refs instead of
    # re-embedding each table's full dot-product tree (the flip probes
    # previously carried ~4 copies of it per table through analysis).
    sig_exprs = {
        f"__s{t}": F.expr(_sig_sql(vec_col, hyperplanes(dim, bits, seed=f"lsh-{t}")))
        for t in range(tables)
    }
    sig_tagged = [F.concat(F.lit(f"{t}:"), F.col(f"__s{t}")) for t in range(tables)]
    probe_tagged = []
    for t in range(tables):
        qsig = F.col(f"__s{t}")
        probes = [qsig]
        for i in range(min(multiprobe, bits)):
            probes.append(
                F.concat(
                    F.substring(qsig, 1, i),
                    F.when(F.substring(qsig, i + 1, 1) == "1", F.lit("0")).otherwise(F.lit("1")),
                    F.substring(qsig, i + 2, bits - i - 1),
                )
            )
        probe_tagged.extend(F.concat(F.lit(f"{t}:"), p) for p in probes)

    c = corpus.select(
        id_col,
        vec_col,
        l2_norm(F.col(vec_col)).alias("__cn"),  # norm once per vector, pre-explode
        *[e.alias(n) for n, e in sig_exprs.items()],
    ).select(
        id_col,
        vec_col,
        "__cn",
        F.explode(F.array(*sig_tagged)).alias("__sig"),
    )
    q = (
        queries.select(
            F.col(id_col).alias(query_id),
            F.col(vec_col).alias("__qvec"),
            l2_norm(F.col(vec_col)).alias("__qn"),
            *[e.alias(n) for n, e in sig_exprs.items()],
        )
        .select(
            query_id,
            "__qvec",
            "__qn",
            F.explode(F.array(*probe_tagged)).alias("__sig"),
        )
        .dropDuplicates([query_id, "__sig"])
    )
    denom = F.col("__cn") * F.col("__qn")
    cand = (
        c.join(F.broadcast(q), on="__sig")
        .select(query_id, id_col, "__qvec", "__qn", "__cn", F.col(vec_col).alias("__cvec"))
        .dropDuplicates([query_id, id_col])
        .select(
            query_id,
            id_col,
            F.when(denom > 0, dot(F.col("__cvec"), F.col("__qvec")) / denom)
            .otherwise(F.lit(0.0))
            .alias("score"),
        )
    )
    return _rank_topk(cand, k, query_id, id_col)
