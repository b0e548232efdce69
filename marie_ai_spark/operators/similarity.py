"""Similarity search over embedding columns.

Brute-force cosine top-k as the correctness baseline (JVM-side zip_with /
aggregate — no UDF, no collect), and an LSH-bucketed variant as the scale
path: random-hyperplane signatures prune the candidate set so the 100 TB
plan joins on bucket instead of cross-joining all vectors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import cosine


def brute_force_topk(
    embeddings: DataFrame, query_vec: list[float], k: int = 10
) -> DataFrame:
    """Top-k by cosine vs a constant query vector. The query is a literal
    array (broadcast by construction); one narrow projection + one top-k
    sort — Spark's TakeOrdered, no full sort at scale."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = embeddings.select(
        "vec_id",
        F.round(cosine(F.col("embedding").cast("array<double>"), q), 6).alias(
            "cos_sim"
        ),
    )
    return scored.orderBy(F.desc("cos_sim"), F.asc("vec_id")).limit(k)


def hyperplane_signature(embeddings: DataFrame, planes: list[list[float]]) -> DataFrame:
    """Random-hyperplane LSH bucket id: bit p = sign(dot(v, plane_p)).
    Deterministic planes are supplied by the caller (seeded)."""
    v = F.col("embedding").cast("array<double>")
    sig = None
    for p, plane in enumerate(planes):
        pl = F.array(*[F.lit(float(x)) for x in plane])
        dot = F.aggregate(
            F.zip_with(v, pl, lambda a, b: a * b), F.lit(0.0), lambda s, x: s + x
        )
        bit = F.when(dot >= 0, F.lit(1 << p)).otherwise(F.lit(0))
        sig = bit if sig is None else sig + bit
    return embeddings.select("vec_id", "embedding", sig.alias("bucket"))


def lsh_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    planes: list[list[float]],
    k: int = 10,
) -> DataFrame:
    """ANN top-k: score only vectors in the query's hyperplane bucket."""
    import builtins

    qbucket = builtins.sum(
        (1 << p)
        for p, plane in enumerate(planes)
        if builtins.sum(a * b for a, b in zip(query_vec, plane)) >= 0
    )
    bucketed = hyperplane_signature(embeddings, planes).filter(
        F.col("bucket") == qbucket
    )
    return brute_force_topk(bucketed.select("vec_id", "embedding"), query_vec, k)


def cosine_neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.45,
    block_col: str | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (verification stage).

    Pair generation is quadratic, so at scale it MUST be restricted to
    candidates: pass `block_col` (an equality blocking key — a cluster
    label, or a `hyperplane_signature` LSH bucket) so the self-join is an
    equi-join on the block, never a cross join. Norms are precomputed once
    per vector (one narrow pass) so each pair costs a single dot product;
    the dot is a sequential left-to-right fold, bit-identical to the SQL
    oracle's list_dot_product.
    """
    def dot(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda p, q: p * q),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    cols = ["vec_id", F.col("embedding").cast("array<double>").alias("v")]
    if block_col:
        cols.append(F.col(block_col).alias("_blk"))
    e = embeddings.select(*cols).withColumn("norm", F.sqrt(dot(F.col("v"), F.col("v"))))
    a, b = e.alias("a"), e.alias("b")
    cond = F.col("a.vec_id") < F.col("b.vec_id")
    if block_col:
        join = a.join(b, (F.col("a._blk") == F.col("b._blk")) & cond)
    else:
        join = a.join(b, cond)
    den = F.col("a.norm") * F.col("b.norm")
    return (
        join.select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(
                F.when(den != 0, dot(F.col("a.v"), F.col("b.v")) / den), 4
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def _kmeans(x, n_centroids: int, iters: int) -> list[list[float]]:
    """Deterministic k-means: init = first k sample vectors, fixed
    iteration count, ties broken by centroid index (np.argmin keeps the
    first minimum)."""
    k = min(n_centroids, len(x))
    cent = x[:k].copy()
    for _ in range(iters):
        d = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(k):
            m = x[assign == c]
            if len(m):
                cent[c] = m.mean(axis=0)
    return [[float(v) for v in row] for row in cent]


def train_ivf_centroids(
    embeddings: DataFrame, n_centroids: int = 16, iters: int = 5,
    sample_size: int = 2048,
) -> list[list[float]]:
    """IVF coarse quantizer: k-means on a deterministic sample.

    The sample (lowest vec_ids) is tiny and driver-side by design — the
    quantizer is index METADATA, like the planes of the hyperplane LSH;
    the data-scale work (assignment, probing) stays distributed.
    """
    import numpy as np

    rows = (
        embeddings.select("vec_id", "embedding")
        .orderBy("vec_id")
        .limit(sample_size)
        .collect()
    )
    x = np.array([list(r.embedding) for r in rows], dtype="float64")
    return _kmeans(x, n_centroids, iters)


def train_ivf_centroids_local(
    parquet_path: str, n_centroids: int = 16, iters: int = 5,
    sample_size: int = 2048,
) -> list[list[float]]:
    """Numpy twin of train_ivf_centroids reading the parquet file
    directly (no SparkSession) — used by the DuckDB oracle to reproduce
    the exact quantizer. Bit-identical: same deterministic sample (lowest
    vec_ids), same init, same iteration count, same numpy arithmetic."""
    import numpy as np
    import pyarrow.parquet as pq

    tbl = pq.read_table(parquet_path, columns=["vec_id", "embedding"])
    df = tbl.to_pandas().sort_values("vec_id").head(sample_size)
    x = np.array([list(v) for v in df["embedding"]], dtype="float64")
    return _kmeans(x, n_centroids, iters)


def _nearest_centroid_col(centroids: list[list[float]]):
    """argmin squared-distance over centroid literals, JVM-side: build an
    array of (dist, cell) structs and take array_min (struct ordering
    compares dist first, then cell — deterministic ties)."""
    v = F.col("embedding").cast("array<double>")
    cells = []
    for ci, c in enumerate(centroids):
        lit = F.array(*[F.lit(float(x)) for x in c])
        d = F.aggregate(
            F.zip_with(v, lit, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda s, x: s + x,
        )
        cells.append(F.struct(d.alias("dist"), F.lit(ci).alias("cell")))
    return F.array_min(F.array(*cells))["cell"]


def ivf_assign(embeddings: DataFrame, centroids: list[list[float]]) -> DataFrame:
    """Add the IVF cell id; at scale the index table is written
    partitioned/clustered by cell so probes prune partitions."""
    return embeddings.withColumn("cell", _nearest_centroid_col(centroids))


def ivf_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    centroids: list[list[float]],
    k: int = 10,
    nprobe: int = 4,
) -> DataFrame:
    """ANN top-k: score only vectors in the nprobe cells nearest the query.
    nprobe = len(centroids) degrades to exact brute force (tested)."""
    import builtins

    dists = [
        (builtins.sum((a - b) ** 2 for a, b in zip(query_vec, c)), ci)
        for ci, c in enumerate(centroids)
    ]
    probe_cells = [ci for _d, ci in sorted(dists)[:nprobe]]
    candidates = ivf_assign(embeddings, centroids).filter(
        F.col("cell").isin(probe_cells)
    )
    return brute_force_topk(
        candidates.select("vec_id", "embedding"), query_vec, k
    )


def _cell_neardup_drops(assigned: DataFrame, threshold: float) -> DataFrame:
    """Within-cell near-dup victims as one Arrow stage per IVF cell: a
    vec_id is emitted iff some same-cell vector with a smaller id scores
    rounded-cosine >= threshold against it. The JVM higher-order fold
    scores ~10x slower per pair (expression interpreter, no codegen);
    numpy does the same arithmetic BIT-IDENTICALLY: dot products and
    norms accumulate in index order (np.cumsum running sum = the fold's
    left-to-right order), float32 -> float64 widening is exact, and the
    4-decimal rounding replicates the JVM/SQL HALF_UP."""
    import numpy as np
    import pandas as pd

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id")
        ids = pdf["vec_id"].to_numpy()
        m = len(ids)
        if m < 2:
            return pd.DataFrame({"vec_id": np.array([], dtype="int64")})
        v = np.array([list(x) for x in pdf["embedding"]], dtype="float64")
        norms = np.sqrt(np.cumsum(v * v, axis=1)[:, -1])
        dropped = np.zeros(m, dtype=bool)
        for i in range(m - 1):
            rest = v[i + 1 :]
            dots = np.cumsum(rest * v[i], axis=1)[:, -1]
            den = norms[i] * norms[i + 1 :]
            nz = den != 0
            cos = np.zeros(len(rest))
            cos[nz] = dots[nz] / den[nz]
            rounded = np.sign(cos) * np.floor(
                np.abs(cos) * 10000.0 + 0.5
            ) / 10000.0
            dropped[i + 1 :] |= nz & (rounded >= threshold)
        return pd.DataFrame({"vec_id": ids[dropped].astype("int64")})

    return assigned.groupBy("cell").applyInPandas(fn, "vec_id long")


def semantic_dedup(
    embeddings: DataFrame,
    centroids: list[list[float]],
    threshold: float = 0.45,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): embeddings are clustered by the IVF coarse
    quantizer, and near-duplicates are detected only WITHIN a cell —
    pair generation is a cell-equality self-join, never a cross join, so
    the 100 TB cost is sum(|cell|^2) over balanced cells instead of N^2
    (the paper's within-cluster pruning, on the same quantizer the ANN
    index already maintains).

    Keep rule (deterministic): a vector is DROPPED iff ANY same-cell
    vector with a smaller vec_id is cosine-similar at >= threshold —
    lowest-id-representative preference, evaluated against all smaller
    ids (not only kept ones), so chains a~b, b~c drop both b and c even
    when a!~c. One relational pass, no iteration, engine-portable.

    Returns the kept rows as (vec_id, cell). The within-cell scoring is
    an Arrow stage (_cell_neardup_drops) doing the fold-identical numpy
    arithmetic — the relational pair join (cosine_neardup_pairs with
    block_col="cell") remains available and produces the identical drop
    set (test-asserted), but scores ~10x slower through the expression
    interpreter.
    """
    assigned = ivf_assign(
        embeddings.select("vec_id", "embedding"), centroids
    )
    drops = _cell_neardup_drops(assigned, threshold)
    return assigned.join(drops, "vec_id", "left_anti").select(
        "vec_id", "cell"
    )


def ivf_write_index(
    embeddings: DataFrame, centroids: list[list[float]], path: str
) -> None:
    """Materialize the IVF index as a cell-partitioned parquet table — the
    100 TB layout: probes then touch only the nprobe nearest cells'
    partitions (directory-level pruning, no full scan). The quantizer
    itself is metadata; persist it next to the data."""
    import json

    ivf_assign(embeddings, centroids).write.mode("overwrite").partitionBy(
        "cell"
    ).parquet(path)
    spark = embeddings.sparkSession
    spark.createDataFrame(
        [(json.dumps(centroids),)], "centroids_json string"
    ).coalesce(1).write.mode("overwrite").parquet(path + "_quantizer")


def ivf_read_quantizer(spark, path: str) -> list[list[float]]:
    import json

    return json.loads(
        spark.read.parquet(path + "_quantizer").first()["centroids_json"]
    )


def ivf_upsert(
    new_embeddings: DataFrame,
    path: str,
    new_ids_only: bool = False,
) -> dict:
    """Incremental maintenance of the written IVF index: upsert a batch of
    (vec_id, embedding) rows into the cell-partitioned table WITHOUT
    rebuilding it — the ingest path a 100 TB index needs (the reference
    keeps a persistent FAISS index it adds to per document batch:
    /root/reference/marie/extract/annotators/faiss_hybrid_annotator.py).

    Semantics: last-write-wins per vec_id. The batch is assigned with the
    PERSISTED quantizer (frozen at train time — standard IVF `add`:
    centroids never shift on ingest, so cell assignment stays a pure
    function of the embedding and probes stay consistent).

    Scale shape, per phase:
      1. assign the batch JVM-side; collect its distinct cells — bounded
         by n_centroids, index metadata.
      2. stale-copy hunt (skipped when new_ids_only=True): an UPDATED
         embedding can move its vector to a different cell, which would
         leave the old row stranded in a partition the merge never
         rewrites. Scan ONLY the vec_id column of the NON-touched cells
         with the batch ids broadcast into a semi-join — a columnar
         projection + partition-pruned scan, no shuffle of the index —
         and add any cell holding a stale copy to the touched set.
      3. merge = (touched-cell rows anti-joined on the broadcast batch
         ids) UNION the assigned batch, staged to a scratch dir (Spark
         refuses to overwrite a path it is reading), then committed with
         DYNAMIC partition overwrite — only touched cell dirs are
         replaced, every other partition's files are untouched bytes.
      4. a touched cell whose rows were ALL moved away produces no
         partition in the merge output, so dynamic overwrite would leave
         its old files in place: such cell dirs are deleted explicitly.

    Returns {n_batch, cells_touched, cells_stale, cells_emptied}."""
    import uuid as _uuid

    spark = new_embeddings.sparkSession
    centroids = ivf_read_quantizer(spark, path)
    index_cols = [
        c for c in spark.read.parquet(path).columns if c != "cell"
    ]
    if set(new_embeddings.columns) != set(index_cols):
        raise ValueError(
            f"upsert batch columns {sorted(new_embeddings.columns)} must "
            f"match the index payload columns {sorted(index_cols)}"
        )
    batch = ivf_assign(new_embeddings, centroids)
    touched = sorted(
        r.cell for r in batch.select("cell").distinct().collect()
    )
    if not touched:
        return {"n_batch": 0, "cells_touched": [], "cells_stale": [],
                "cells_emptied": []}
    ids = batch.select("vec_id").distinct()
    index = spark.read.parquet(path)  # (re-read after the column check)
    stale_cells: list[int] = []
    if not new_ids_only:
        stale_cells = sorted(
            r.cell
            for r in index.filter(~F.col("cell").isin(touched))
            .join(F.broadcast(ids), "vec_id", "left_semi")
            .select("cell")
            .distinct()
            .collect()
        )
    all_touched = sorted(set(touched) | set(stale_cells))
    keep_old = index.filter(F.col("cell").isin(all_touched)).join(
        F.broadcast(ids), "vec_id", "left_anti"
    )
    merged = keep_old.unionByName(batch.select(keep_old.columns))

    stage = f"{path}__upsert_{_uuid.uuid4().hex}"
    merged.write.mode("overwrite").parquet(stage)
    staged = spark.read.parquet(stage)
    (
        staged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("cell")
        .parquet(path)
    )
    nonempty = {r.cell for r in staged.select("cell").distinct().collect()}
    emptied = sorted(set(all_touched) - nonempty)
    jvm = spark._jvm
    Path = jvm.org.apache.hadoop.fs.Path
    fs = Path(path).getFileSystem(spark._jsc.hadoopConfiguration())
    for c in emptied:
        fs.delete(Path(f"{path}/cell={c}"), True)
    fs.delete(Path(stage), True)
    n_batch = batch.count()
    return {
        "n_batch": n_batch,
        "cells_touched": all_touched,
        "cells_stale": stale_cells,
        "cells_emptied": emptied,
    }


def ivf_topk_indexed(
    spark,
    path: str,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
) -> DataFrame:
    """ANN top-k over the WRITTEN index: the cell filter is a partition
    predicate, so the scan reads only the probed cells' files (verify via
    PartitionFilters in the plan — tested)."""
    import builtins

    centroids = ivf_read_quantizer(spark, path)
    dists = [
        (builtins.sum((a - b) ** 2 for a, b in zip(query_vec, c)), ci)
        for ci, c in enumerate(centroids)
    ]
    probe_cells = [ci for _d, ci in sorted(dists)[:nprobe]]
    candidates = spark.read.parquet(path).filter(
        F.col("cell").isin(probe_cells)
    )
    return brute_force_topk(
        candidates.select("vec_id", "embedding"), query_vec, k
    )


def rrf_fuse(
    rankings: list[DataFrame],
    names: list[str],
    k: int = 60,
    topn: int = 20,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009): combine
    the lexical (BM25) and semantic (ANN cosine) retrieval sides into one
    ranking — rrf(d) = sum over systems of 1/(k + rank_s(d)), summing only
    over systems that returned d. This is the standard hybrid-retrieval
    merge the reference reaches via its FAISS+lexical hybrid annotator
    (/root/reference/marie/extract/annotators/faiss_hybrid_annotator.py);
    here it is a pure DataFrame op over the engine's own bm25_topk /
    brute_force_topk / ivf_topk outputs.

    Each input is a 2-column (id, score) TOP-K result — already bounded
    (<= its k rows), so the unpartitioned rank window and the outer joins
    below run over driver-scale metadata no matter the corpus size (the
    corpus-sized work happened inside the retrieval queries). For fusing
    per-query result sets in bulk use `rrf_fuse_bulk`, which partitions
    the same plan by query_id.

    Determinism: ranks are row_number by (score desc, id asc) — total
    order, engine-portable; contributions are added in input-list order,
    left-to-right, so the float sum is order-deterministic and
    hash-stable. Output: (doc_id, rrf, <name>_rank ... nullable ints),
    top-`topn` by (rrf desc, doc_id).
    """
    from pyspark.sql import Window

    fused = None
    for r, name in zip(rankings, names):
        id_col, score_col = r.columns[:2]
        w = Window.orderBy(F.desc(score_col), F.asc(id_col))
        ranked = r.select(
            F.col(id_col).alias("doc_id"),
            F.row_number().over(w).alias(f"{name}_rank"),
        )
        fused = (
            ranked
            if fused is None
            else fused.join(ranked, "doc_id", "full_outer")
        )
    contribs = [
        F.coalesce(
            F.lit(1.0) / (F.lit(float(k)) + F.col(f"{n}_rank")), F.lit(0.0)
        )
        for n in names
    ]
    total = contribs[0]
    for c in contribs[1:]:
        total = total + c
    return (
        fused.select(
            "doc_id",
            F.round(total, 6).alias("rrf"),
            *[F.col(f"{n}_rank") for n in names],
        )
        .orderBy(F.desc("rrf"), F.asc("doc_id"))
        .limit(topn)
    )


def rrf_fuse_bulk(
    rankings: list[DataFrame],
    names: list[str],
    k: int = 60,
    topn: int = 20,
    query_col: str = "query_id",
) -> DataFrame:
    """Bulk reciprocal-rank fusion: `rrf_fuse` generalized to MANY queries
    at once — the hybrid-retrieval EVALUATION path (fuse every eval
    query's lexical and semantic result lists in one job, not one driver
    round-trip per query).

    Each input is a (query_col, id, score) per-query top-k table (id and
    score are the first two non-query columns, any names). Scale shape:
    every window below is PARTITIONED BY query_col — rank assignment,
    the full-outer merge (keyed on (query, doc)), and the final per-query
    top-`topn` are all hash-distributed over queries, so the plan carries
    no single-partition window and no driver-side state; per-query input
    is already top-k-bounded, so partitions stay tiny no matter the
    corpus. Determinism matches rrf_fuse: ranks by (score desc, id asc),
    contributions summed in input-list order, per-query cut by
    (rrf desc, doc_id asc).

    Output: (query_col, doc_id, rrf, <name>_rank ...), `topn` rows per
    query.
    """
    from pyspark.sql import Window

    fused = None
    for r, name in zip(rankings, names):
        rest = [c for c in r.columns if c != query_col]
        id_col, score_col = rest[:2]
        w = Window.partitionBy(query_col).orderBy(
            F.desc(score_col), F.asc(id_col)
        )
        ranked = r.select(
            F.col(query_col),
            F.col(id_col).alias("doc_id"),
            F.row_number().over(w).alias(f"{name}_rank"),
        )
        fused = (
            ranked
            if fused is None
            else fused.join(ranked, [query_col, "doc_id"], "full_outer")
        )
    contribs = [
        F.coalesce(
            F.lit(1.0) / (F.lit(float(k)) + F.col(f"{n}_rank")), F.lit(0.0)
        )
        for n in names
    ]
    total = contribs[0]
    for c in contribs[1:]:
        total = total + c
    wq = Window.partitionBy(query_col).orderBy(
        F.desc("rrf"), F.asc("doc_id")
    )
    return (
        fused.select(
            query_col,
            "doc_id",
            F.round(total, 6).alias("rrf"),
            *[F.col(f"{n}_rank") for n in names],
        )
        .withColumn("__rn", F.row_number().over(wq))
        .filter(F.col("__rn") <= topn)
        .drop("__rn")
    )
