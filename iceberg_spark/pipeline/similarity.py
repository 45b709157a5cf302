"""Similarity search over the embeddings table.

* knn_bruteforce — exact cosine top-k per query vector. The query side is
  tiny and broadcast; the data side streams through a single projection
  (no shuffle until the final per-query top-k, which is a partial
  top-k-per-partition then merge under AQE).
* ann_lsh — random-hyperplane LSH: 6 sign-bits -> one of 64 buckets;
  the query probes its own bucket plus all hamming-1 neighbors
  (multiprobe), then exact-cosine re-ranks inside the probed set.
  Hyperplane weights are +-1 derived from md5('plane{p}_{d}') so both
  engines (and any future run) regenerate the identical planes without
  shipping state. At scale the bucket join replaces the O(n*q) cross
  product; plane count tunes bucket occupancy vs recall.

Cosines are computed as sequential double-precision folds in both engines
so the DuckDB oracle hash-matches (see dedup.cosine).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .common import engine_embeddings
from .dedup import _cos_sql, cosine

N_QUERIES = 20  # vec_id < 20 are the query vectors
TOP_K = 5
N_PLANES = 6


def _qd(spark, sf_dir):
    emb = engine_embeddings(spark, sf_dir).select("vec_id", "embedding")
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    d = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ne"))
    return q, d


def knn_bruteforce(spark, sf_dir):
    """Exact cosine top-k: the query matrix broadcasts to executors and
    every data partition GEMMs its block against it (one BLAS call per
    Arrow batch instead of interpreted per-row fold), with a per-partition
    local top-k so only k rows per (query, partition) reach the final
    window — the partial-top-k shape that survives a 1000-executor scan."""
    import numpy as np

    q, d = _qd(spark, sf_dir)
    qp = q.toPandas()
    q_ids = qp["query_id"].to_numpy()
    qm = np.stack(qp["qe"].to_numpy()).astype(np.float64)
    qm /= np.linalg.norm(qm, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((q_ids, qm))

    def score(batches):
        import pandas as pd

        ids_q, mat_q = bc.value
        k = TOP_K
        for b in batches:
            mat = np.stack(b["ne"].to_numpy()).astype(np.float64)
            mat /= np.linalg.norm(mat, axis=1, keepdims=True)
            sims = np.round(mat @ mat_q.T, 4)  # rows x n_queries
            n_ids = b["neighbor_id"].to_numpy()
            out_q, out_n, out_c = [], [], []
            for j in range(len(ids_q)):
                col = sims[:, j]
                mask = n_ids != ids_q[j]
                cand_idx = np.nonzero(mask)[0]
                if len(cand_idx) > k:
                    # local partial top-k (ties by neighbor_id asc)
                    order = np.lexsort((n_ids[cand_idx], -col[cand_idx]))
                    cand_idx = cand_idx[order[:k]]
                out_q.extend([ids_q[j]] * len(cand_idx))
                out_n.extend(n_ids[cand_idx])
                out_c.extend(col[cand_idx])
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "cos": out_c})

    # the testdata table is a single parquet file -> one input partition;
    # spread the GEMM across cores. At cluster scale the scan is already
    # many-filed, so the shuffle would be pure waste — only repartition
    # when the input is narrower than the cluster.
    par = max(spark.sparkContext.defaultParallelism, 8)
    if d.rdd.getNumPartitions() < par:
        d = d.repartition(par)
    scored = d.mapInPandas(score, "query_id long, neighbor_id long, cos double")
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "neighbor_id", "rnk", "cos")
        .orderBy("query_id", "rnk")
    )


KNN_SQL = f"""
WITH scored AS (
  SELECT q.vec_id AS query_id, d.vec_id AS neighbor_id,
         ROUND({_cos_sql("q.embedding", "d.embedding")}, 4) AS cos
  FROM embeddings q JOIN embeddings d ON q.vec_id <> d.vec_id
  WHERE q.vec_id < {N_QUERIES}
),
ranked AS (
  SELECT query_id, neighbor_id, cos,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id ASC) AS rnk
  FROM scored
)
SELECT query_id, neighbor_id, rnk, cos FROM ranked
WHERE rnk <= {TOP_K} ORDER BY query_id, rnk
"""


# Hyperplane weight for (plane p, dim d): +1 if the first hex nibble of
# md5('plane{p}_{d}') is >= 8 else -1 — regenerable in any engine.
_PLANE_W = (
    "CASE WHEN instr('89abcdef', substring(md5(concat('plane', {p}, '_', "
    "cast(d as string))), 1, 1)) > 0 THEN 1.0 ELSE -1.0 END"
)


def _bucket_expr(col: str) -> str:
    """Bucket id = sum over planes p of (sign bit of plane.emb dot) << p."""
    dots = (
        f"aggregate(sequence(1, 64), cast(0.0 as double), "
        f"(acc, d) -> acc + ({_PLANE_W}) * cast(element_at({col}, d) as double))"
    )
    bit = f"(CASE WHEN ({dots}) >= 0 THEN 1 ELSE 0 END)"
    return (
        f"aggregate(sequence(0, {N_PLANES - 1}), 0L, "
        f"(acc, p) -> acc + cast({bit.format(p='p')} as long) "
        f"* cast(power(2, p) as long))"
    )


def ann_lsh(spark, sf_dir):
    """LSH-bucketed ANN with hamming-1 multiprobe: candidates live in the
    query's hyperplane bucket or any bucket one bit-flip away; exact
    cosine re-rank inside the probed set. Deterministic planes =>
    identical result in the SQL oracle (which mirrors the bucketing)."""
    q, d = _qd(spark, sf_dir)
    probes = (
        f"transform(sequence(-1, {N_PLANES - 1}), p -> CASE WHEN p = -1 "
        f"THEN bucket ELSE bucket ^ cast(power(2, p) as bigint) END)"
    )
    qb = (
        q.withColumn("bucket", F.expr(_bucket_expr("qe")))
        .withColumn("bucket", F.explode(F.expr(probes)))
    )
    db = d.withColumn("bucket", F.expr(_bucket_expr("ne")))
    scored = (
        F.broadcast(qb).join(db, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id",
                F.round(cosine(F.col("qe"), F.col("ne")), 4).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "neighbor_id", "rnk", "cos")
        .orderBy("query_id", "rnk")
    )


def _bucket_sql(col: str) -> str:
    plane_w = (
        "CASE WHEN strpos('89abcdef', substring(md5(concat('plane', p, '_', "
        "CAST(d AS VARCHAR))), 1, 1)) > 0 THEN 1.0 ELSE -1.0 END"
    )
    dots = (
        f"list_sum(list_transform(generate_series(1, 64), "
        f"d -> ({plane_w}) * CAST({col}[d] AS DOUBLE)))"
    )
    bit = f"(CASE WHEN ({dots}) >= 0 THEN 1 ELSE 0 END)"
    return (
        f"list_sum(list_transform(generate_series(0, {N_PLANES - 1}), "
        f"p -> CAST({bit} AS BIGINT) * CAST(power(2, p) AS BIGINT)))"
    )


ANN_LSH_SQL = f"""
WITH bucketed AS (
  SELECT vec_id, embedding, {_bucket_sql("embedding")} AS bucket
  FROM embeddings
),
probes AS (
  SELECT vec_id, embedding,
         unnest([bucket] || list_transform(generate_series(0, {N_PLANES - 1}),
                p -> xor(bucket, CAST(power(2, p) AS BIGINT)))) AS bucket
  FROM bucketed WHERE vec_id < {N_QUERIES}
),
scored AS (
  SELECT q.vec_id AS query_id, d.vec_id AS neighbor_id,
         ROUND({_cos_sql("q.embedding", "d.embedding")}, 4) AS cos
  FROM probes q JOIN bucketed d
    ON q.bucket = d.bucket AND q.vec_id <> d.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id ASC) AS rnk
  FROM scored
)
SELECT query_id, neighbor_id, rnk, cos FROM ranked
WHERE rnk <= {TOP_K} ORDER BY query_id, rnk
"""


N_LISTS = 32   # IVF coarse lists
N_PROBE = 4    # lists probed per query


def ann_ivf(spark, sf_dir):
    """IVF-flat ANN — the inverted-file scale path next to LSH:

    * coarse quantizer: {N_LISTS} deterministic seed centroids (the
      embeddings with vec_id in [{N_QUERIES}, {N_QUERIES}+{N_LISTS}) —
      random-init IVF without a driver-side kmeans loop, regenerable by
      any engine);
    * build: every vector joins its nearest centroid's list — one
      Arrow-batched GEMM per partition (rows x {N_LISTS}), assignment
      cosines rounded to 6dp with centroid-id tiebreak so independent
      engines agree bit-for-bit;
    * search: each query probes its {N_PROBE} nearest lists, candidates
      re-rank by exact cosine (same double fold as the oracle).

    At cluster scale the per-list candidate join replaces the O(n*q)
    cross product, and list sizes (~n/{N_LISTS}) bound executor memory."""
    import numpy as np

    emb = engine_embeddings(spark, sf_dir).select("vec_id", "embedding")
    cents = (emb.filter((F.col("vec_id") >= N_QUERIES)
                        & (F.col("vec_id") < N_QUERIES + N_LISTS))
             .toPandas().sort_values("vec_id"))  # driver-small: N_LISTS rows
    c_ids = cents["vec_id"].to_numpy()
    cm = np.stack(cents["embedding"].to_numpy()).astype(np.float64)
    cm /= np.linalg.norm(cm, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((c_ids, cm))

    def assign(batches):
        import pandas as pd

        ids_c, mat_c = bc.value
        for b in batches:
            mat = np.stack(b["embedding"].to_numpy()).astype(np.float64)
            mat /= np.linalg.norm(mat, axis=1, keepdims=True)
            sims = np.round(mat @ mat_c.T, 6)  # rows x N_LISTS
            # argmax with centroid-id tiebreak: ids_c ascending, stable argmax
            best = sims.argmax(axis=1)  # first (lowest id) wins ties
            yield pd.DataFrame({
                "vec_id": b["vec_id"],
                "list_id": ids_c[best],
                "ne": b["embedding"],
            })

    par = max(spark.sparkContext.defaultParallelism, 8)
    if emb.rdd.getNumPartitions() < par:
        emb = emb.repartition(par)
    assigned = emb.mapInPandas(
        assign, "vec_id long, list_id long, ne array<float>")

    # query probes: N_QUERIES x N_LISTS is driver-trivial
    qp = (engine_embeddings(spark, sf_dir)
          .filter(F.col("vec_id") < N_QUERIES)
          .select("vec_id", "embedding").toPandas().sort_values("vec_id"))
    qm = np.stack(qp["embedding"].to_numpy()).astype(np.float64)
    qm /= np.linalg.norm(qm, axis=1, keepdims=True)
    sims = np.round(qm @ cm.T, 6)
    rows = []
    for i, qid in enumerate(qp["vec_id"].to_numpy()):
        order = np.lexsort((c_ids, -sims[i]))[:N_PROBE]
        for li in order:
            rows.append((int(qid), int(c_ids[li]),
                         [float(x) for x in qp["embedding"].iloc[i]]))
    probes = spark.createDataFrame(
        rows, "query_id long, list_id long, qe array<float>")

    scored = (
        F.broadcast(probes).join(assigned, "list_id")
        .filter(F.col("query_id") != F.col("vec_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"),
                F.round(cosine(F.col("qe"), F.col("ne")), 4).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "neighbor_id", "rnk", "cos")
        .orderBy("query_id", "rnk")
    )


ANN_IVF_SQL = f"""
WITH cents AS (
  SELECT vec_id AS c_id, embedding AS ce FROM embeddings
  WHERE vec_id >= {N_QUERIES} AND vec_id < {N_QUERIES + N_LISTS}
),
assigned AS (
  SELECT vec_id, embedding, c_id FROM (
    SELECT d.vec_id, d.embedding, c.c_id,
           ROW_NUMBER() OVER (PARTITION BY d.vec_id
                              ORDER BY ROUND({_cos_sql("c.ce", "d.embedding")}, 6)
                                       DESC, c.c_id ASC) AS rn
    FROM embeddings d CROSS JOIN cents c
  ) WHERE rn = 1
),
probes AS (
  SELECT vec_id AS query_id, embedding AS qe, c_id FROM (
    SELECT q.vec_id, q.embedding, c.c_id,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
                              ORDER BY ROUND({_cos_sql("c.ce", "q.embedding")}, 6)
                                       DESC, c.c_id ASC) AS rn
    FROM embeddings q CROSS JOIN cents c WHERE q.vec_id < {N_QUERIES}
  ) WHERE rn <= {N_PROBE}
),
scored AS (
  SELECT p.query_id, d.vec_id AS neighbor_id,
         ROUND({_cos_sql("p.qe", "d.embedding")}, 4) AS cos
  FROM probes p JOIN assigned d ON p.c_id = d.c_id
  WHERE p.query_id <> d.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id ASC) AS rnk
  FROM scored
)
SELECT query_id, neighbor_id, rnk, cos FROM ranked
WHERE rnk <= {TOP_K} ORDER BY query_id, rnk
"""


KM_K = 4        # clusters
KM_DIMS = 64    # embedding dimensionality
KM_ROUND = 6    # centroid rounding: kills cross-engine summation-order ulps


def _dist2_lit(col, cent):
    """Squared L2 to a PYTHON-list centroid, sequential double fold (the
    cosine() order, so the oracle's list_sum fold is bit-identical)."""
    arr = F.array(*[F.lit(float(v)) for v in cent])
    return F.aggregate(
        F.zip_with(col, arr,
                   lambda x, y: (x.cast("double") - y)
                   * (x.cast("double") - y)),
        F.lit(0.0), lambda acc, v: acc + v)


def embedding_kmeans(spark, sf_dir):
    """Two Lloyd iterations of k-means over the embedding column with
    deterministic seeding (centroids = the KM_K lowest vec_ids), the
    corpus-clustering step a curation pipeline runs before per-cluster
    sampling. Output: per-cluster membership count and label mass.

    Distributed shapes: assignment is a rowwise fold against broadcast
    centroids (no shuffle); the recompute is posexplode -> partial-agg
    groupBy(cluster, pos) — KM_K*KM_DIMS result rows regardless of corpus
    size — and only those rows reach the driver between iterations.
    Cross-engine exactness: recomputed centroid components round to
    KM_ROUND dp before the next assignment, so the engines' different
    per-group summation orders cannot flip an argmin."""
    emb = engine_embeddings(spark, sf_dir).select("vec_id", "embedding",
                                                  "label")
    seeds = (emb.filter(F.col("vec_id") < KM_K)
             .select("vec_id", "embedding").collect())  # KM_K rows
    cents = {int(r["vec_id"]): [float(x) for x in r["embedding"]]
             for r in seeds}

    a1 = _assign(emb, cents)
    # recompute: partial-agg per (cluster, pos); KM_K*KM_DIMS rows out
    c1 = (a1.select("cluster", F.posexplode("embedding")
                    .alias("pos", "val"))
          .groupBy("cluster", "pos")
          .agg(F.round(F.avg(F.col("val").cast("double")),
                       KM_ROUND).alias("c"))
          .groupBy("cluster")
          .agg(F.array_sort(F.collect_list(F.struct("pos", "c")))
               .alias("sc"))
          .select("cluster",
                  F.transform("sc", lambda s: s["c"]).alias("ce"))
          .collect())  # KM_K rows back on the driver
    cents2 = {int(r["cluster"]): [float(x) for x in r["ce"]] for r in c1}
    a2 = _assign(emb, cents2)
    return (a2.groupBy("cluster")
            .agg(F.count(F.lit(1)).alias("n_vecs"),
                 F.sum("label").cast("long").alias("label_mass"))
            .orderBy("cluster"))


def _assign(df, cents):
    """Nearest-centroid label: min over (dist, cluster-id) structs — the
    id in the struct makes equal-distance ties resolve to the LOWEST
    cluster id, same as the oracle's ORDER BY dist, cluster."""
    dists = F.array(*[
        F.struct(_dist2_lit(F.col("embedding"), cents[k]).alias("d"),
                 F.lit(k).alias("k")) for k in sorted(cents)])
    return df.withColumn("cluster", F.array_min(dists)["k"])


def _km_dist_sql(e, c):
    return (f"list_sum(list_transform(generate_series(1, {KM_DIMS}), "
            f"i -> (CAST({e}[i] AS DOUBLE) - {c}[i]) "
            f"* (CAST({e}[i] AS DOUBLE) - {c}[i])))")


EMBEDDING_KMEANS_SQL = f"""
WITH emb AS (
  SELECT vec_id, embedding, label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
c0 AS (SELECT vec_id AS cluster, e AS ce FROM emb WHERE vec_id < {KM_K}),
s1 AS (
  SELECT v.vec_id, v.e, v.label, c.cluster,
         ROW_NUMBER() OVER (PARTITION BY v.vec_id
                            ORDER BY {_km_dist_sql('v.e', 'c.ce')},
                                     c.cluster) AS rn
  FROM emb v CROSS JOIN c0 c
),
a1 AS (SELECT * FROM s1 WHERE rn = 1),
c1 AS (
  SELECT cluster, list(cc ORDER BY pos) AS ce FROM (
    SELECT a.cluster, g.pos, ROUND(AVG(a.e[g.pos]), {KM_ROUND}) AS cc
    FROM a1 a CROSS JOIN generate_series(1, {KM_DIMS}) AS g(pos)
    GROUP BY a.cluster, g.pos)
  GROUP BY cluster
),
s2 AS (
  SELECT v.vec_id, v.label, c.cluster,
         ROW_NUMBER() OVER (PARTITION BY v.vec_id
                            ORDER BY {_km_dist_sql('v.e', 'c.ce')},
                                     c.cluster) AS rn
  FROM emb v CROSS JOIN c1 c
)
SELECT cluster, COUNT(*) AS n_vecs, CAST(SUM(label) AS BIGINT) AS label_mass
FROM s2 WHERE rn = 1 GROUP BY cluster ORDER BY cluster
"""


# outlier detection: quantization scale is a power of two, so
# float->double, *SCALE, and floor are all IEEE-exact in both engines;
# all downstream arithmetic is integer (order-independent sums)
OUT_SCALE = 256
OUT_TOP = 20
OUT_DIMS = 64


def embedding_outliers(spark, sf_dir):
    """Corpus outlier detection: top-{OUT_TOP} vectors by squared L2
    distance to the corpus centroid — the garbage/anomaly sweep a
    curation pipeline runs before training. Computed entirely in
    integer space: components quantize to floor(x*256) (exact — see
    OUT_SCALE), the centroid stays as per-dim integer SUMs (never
    divided), and d2_scaled = sum_i (q_i*N - S_i)^2 is an
    order-independent integer, so both engines rank identically with
    no float-summation ambiguity.

    100 TB shape: one posexplode -> partial-agg pass produces exactly
    OUT_DIMS rows (centroid-sized driver materialization, like the IVF
    centroids); scoring is a rowwise fold against the broadcast sums
    (no shuffle) and a global top-k. Integer headroom: |q|<=~2.5e3,
    so q*N stays under 2^62 for corpora up to ~1e15 rows."""
    emb = engine_embeddings(spark, sf_dir).select(
        "vec_id", "label", "embedding")
    q = emb.select(
        "vec_id", "label",
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * OUT_SCALE).cast("long"),
        ).alias("qv"),
    )
    sums = (q.select(F.posexplode("qv").alias("pos", "v"))
            .groupBy("pos")
            .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
            .orderBy("pos")
            .collect())  # OUT_DIMS rows — centroid-sized by construction
    svec = [int(r["s"]) for r in sums]
    n_rows = int(sums[0]["n"])
    sarr = F.array(*[F.lit(s) for s in svec])
    d2 = F.aggregate(
        F.zip_with(F.col("qv"), sarr,
                   lambda x, s: (x * n_rows - s) * (x * n_rows - s)),
        F.lit(0).cast("long"), lambda acc, v: acc + v)
    return (q.select("vec_id", "label", d2.alias("d2_scaled"))
            .orderBy(F.col("d2_scaled").desc(), "vec_id")
            .limit(OUT_TOP))


EMBEDDING_OUTLIERS_SQL = f"""
WITH q AS (
  SELECT vec_id, label,
         list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * {OUT_SCALE}) AS BIGINT)) AS qv
  FROM embeddings
),
s AS (
  SELECT g.i AS pos, SUM(qv[g.i]) AS sv, COUNT(*) AS n
  FROM q CROSS JOIN generate_series(1, {OUT_DIMS}) AS g(i)
  GROUP BY g.i
),
cent AS (SELECT list(sv ORDER BY pos) AS sv, MAX(n) AS n FROM s)
SELECT vec_id, label,
       CAST(list_sum(list_transform(generate_series(1, {OUT_DIMS}),
              i -> (qv[i] * cent.n - cent.sv[i])
                 * (qv[i] * cent.n - cent.sv[i]))) AS BIGINT) AS d2_scaled
FROM q CROSS JOIN cent
ORDER BY d2_scaled DESC, vec_id LIMIT {OUT_TOP}
"""


REGISTRY = {
    "knn_bruteforce": (knn_bruteforce, KNN_SQL),
    "embedding_outliers": (embedding_outliers, EMBEDDING_OUTLIERS_SQL),
    "ann_lsh": (ann_lsh, ANN_LSH_SQL),
    "ann_ivf": (ann_ivf, ANN_IVF_SQL),
    "embedding_kmeans": (embedding_kmeans, EMBEDDING_KMEANS_SQL),
}
