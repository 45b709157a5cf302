"""Corpus-curation operators: the steps a training-data pipeline runs
AFTER candidate generation — resolving near-dup pairs into clusters,
removing benchmark contamination, packing documents into fixed token
budgets, and deterministic domain mixing.

Scale notes (the 100 TB shapes):

* cluster resolve  — iterative min-label propagation over the near-dup
                     edge list (the DataFrame formulation of connected
                     components; one shuffle join per round, rounds =
                     cluster diameter, which for dedup graphs is tiny).
                     Labels are cached per round and unpersisted after;
                     the only driver values are per-round change counts.
* decontamination  — the benchmark side is ~1% of the corpus by
                     construction, so its shingle-hash set broadcasts and
                     the flagging join is shuffle-free on the train side.
* sequence packing — running token totals are computed per pack-shard
                     (hash of doc_id), never globally: a single global
                     ordering would serialize 100 TB through one window
                     partition. Shards are independent -> embarrassingly
                     parallel, and each training sequence is built from
                     one shard's contiguous run.
* domain mixing    — Bernoulli-by-arithmetic-hash gate (Knuth
                     multiplicative). A pure rowwise filter: no shuffle,
                     no sampling state, reproducible across engines and
                     retries — the property that matters when a sampled
                     corpus must be re-derivable bit-for-bit.

Every operator has a value-identical DuckDB oracle (connected components
via a recursive CTE).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .common import engine_docs, shingles, shingles_sql, tokens, tokens_sql
from .dedup import NGRAM_JACCARD_SQL, _cached_df, dedup_ngram_jaccard

MAX_CC_ROUNDS = 20          # backstop; dedup graphs converge in 2-4
DECON_SHINGLE_N = 5         # word 5-grams, the usual decontamination unit
PACK_BUDGET = 256           # tokens per training sequence
PACK_SHARDS = 8
MIX_PERMILLE = {"en": 400}  # downsample dominant language; default 900
MIX_DEFAULT_PERMILLE = 900


# ---------------------------------------------------------------------------
# near-dup cluster resolution (connected components over pair edges)
# ---------------------------------------------------------------------------


def dedup_cluster_resolve(spark, sf_dir):
    """Resolve pairwise near-dup candidates into clusters and pick the
    canonical doc (min doc_id) per cluster.

    Pair generators (Jaccard/MinHash/SimHash) emit edges; keep-one-drop-
    rest needs the transitive closure. Min-label propagation over the
    symmetrized edge list: every round each node takes the min label among
    itself and its neighbors; converges in diameter rounds. This is the
    standard DataFrame connected-components shape (cf. the large-star/
    small-star formulation of Kiveris et al., "Connected Components in
    MapReduce and Beyond", SoCC'14) — per round one shuffle join, driver
    sees only a scalar convergence check."""
    return _cached_df("cc_resolved", sf_dir,
                      lambda: _resolve_clusters(spark, sf_dir))


def _cluster_labels(spark, sf_dir):
    """doc_id -> cluster label (min reachable id) for every node of the
    near-dup graph — the shared output both resolvers consume; memoized
    so the propagation loop runs once per (session, sf)."""
    return _cached_df("cc_labels", sf_dir,
                      lambda: _propagate_labels(spark, sf_dir))


def _resolve_clusters(spark, sf_dir):
    labels = _cluster_labels(spark, sf_dir)
    out = (labels.groupBy("label")
           .agg(F.count(F.lit(1)).alias("cluster_size"))
           .select(F.col("label").alias("keep_id"), "cluster_size")
           .filter(F.col("cluster_size") >= 2)
           .orderBy("keep_id"))
    out = out.cache()
    out.count()
    return out


def _propagate_labels(spark, sf_dir):
    edges = _cached_df(
        "cc_edges", sf_dir,
        lambda: dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b"))
    sym = edges.unionAll(
        edges.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")))
    # nodes restricted to the edge set: singletons keep label = self and
    # never change, so they need no propagation work
    labels = (sym.select(F.col("doc_a").alias("doc_id"))
              .distinct()
              .withColumn("label", F.col("doc_id"))
              .cache())
    # labels only ever decrease, so sum(label) is strictly monotone until
    # convergence — one scalar agg per round is the whole driver traffic
    prev_sum = labels.agg(F.sum("label")).collect()[0][0]
    converged = False
    for _ in range(MAX_CC_ROUNDS):
        nbr = (sym.join(labels, sym.doc_b == labels.doc_id)
               .groupBy(F.col("doc_a").alias("doc_id"))
               .agg(F.min("label").alias("nbr_min")))
        new_labels = (labels.join(nbr, "doc_id", "left")
                      .select("doc_id",
                              F.least("label", F.coalesce("nbr_min", "label"))
                              .alias("label"))
                      .cache())
        new_sum = new_labels.agg(F.sum("label")).collect()[0][0]
        labels.unpersist()
        labels = new_labels
        if new_sum == prev_sum:
            converged = True
            break
        prev_sum = new_sum
    if not converged:
        labels.unpersist()
        raise RuntimeError(
            f"cluster resolution did not converge in {MAX_CC_ROUNDS} rounds "
            "(near-dup graph diameter exceeds the backstop; raise "
            "MAX_CC_ROUNDS)")
    # the converged label map stays cached (memoized by _cluster_labels);
    # it is node-count-sized, not corpus-sized
    return labels


def dedup_keep_best(spark, sf_dir):
    """Near-dup cluster resolution keeping the BEST document per cluster
    instead of the lowest id — what a production curation pipeline
    actually ships (near-dups differ by boilerplate/truncation; keeping
    the longest member preserves the most content). Quality key here:
    n_chars desc, doc_id asc tiebreak — deterministic in both engines.

    100 TB shape: the label map is near-dup-node-sized (not corpus-
    sized); the quality join keys on doc_id and the winner pick is one
    window over cluster-sized groups."""
    from pyspark.sql import Window

    labels = _cluster_labels(spark, sf_dir)
    docs = engine_docs(spark, sf_dir).select("doc_id", "n_chars")
    sized = (labels.groupBy("label")
             .agg(F.count(F.lit(1)).alias("cluster_size"))
             .filter(F.col("cluster_size") >= 2))
    members = (labels.join(sized, "label")
               .join(docs, "doc_id"))
    w = Window.partitionBy("label").orderBy(
        F.col("n_chars").desc(), F.col("doc_id"))
    return (members.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") == 1)
            .select(F.col("label").alias("cluster_id"),
                    F.col("doc_id").alias("keep_id"),
                    "cluster_size",
                    F.col("n_chars").alias("keep_n_chars"))
            .orderBy("cluster_id"))


DEDUP_KEEP_BEST_SQL = f"""
WITH pairs AS (
  SELECT doc_a, doc_b FROM ({NGRAM_JACCARD_SQL.strip()}) q
),
sym AS (
  SELECT doc_a, doc_b FROM pairs
  UNION ALL SELECT doc_b, doc_a FROM pairs
),
reach AS (
  WITH RECURSIVE r(doc_id, label) AS (
    SELECT DISTINCT doc_a, doc_a FROM sym
    UNION
    SELECT s.doc_a, r.label FROM r JOIN sym s ON s.doc_b = r.doc_id
  )
  SELECT doc_id, MIN(label) AS label FROM r GROUP BY doc_id
),
sized AS (
  SELECT label, COUNT(*) AS cluster_size FROM reach
  GROUP BY label HAVING COUNT(*) >= 2
),
ranked AS (
  SELECT r.label, r.doc_id, s.cluster_size, d.n_chars,
         ROW_NUMBER() OVER (PARTITION BY r.label
                            ORDER BY d.n_chars DESC, r.doc_id) AS rnk
  FROM reach r JOIN sized s USING (label)
  JOIN documents d USING (doc_id)
)
SELECT label AS cluster_id, doc_id AS keep_id, cluster_size,
       n_chars AS keep_n_chars
FROM ranked WHERE rnk = 1 ORDER BY cluster_id
"""


CLUSTER_RESOLVE_SQL = f"""
WITH pairs AS (
  SELECT doc_a, doc_b FROM ({NGRAM_JACCARD_SQL.strip()}) q
),
sym AS (
  SELECT doc_a, doc_b FROM pairs
  UNION ALL SELECT doc_b, doc_a FROM pairs
),
reach AS (
  WITH RECURSIVE r(doc_id, label) AS (
    SELECT DISTINCT doc_a, doc_a FROM sym
    UNION
    SELECT s.doc_a, r.label FROM r JOIN sym s ON s.doc_b = r.doc_id
  )
  SELECT doc_id, MIN(label) AS label FROM r GROUP BY doc_id
)
SELECT label AS keep_id, COUNT(*) AS cluster_size
FROM reach GROUP BY label HAVING COUNT(*) >= 2 ORDER BY keep_id
"""


# ---------------------------------------------------------------------------
# benchmark decontamination (n-gram overlap vs a held-out set)
# ---------------------------------------------------------------------------


def decontamination(spark, sf_dir):
    """Flag training docs sharing any word 5-gram with the benchmark set
    (docs with doc_id % 97 == 0 stand in for a held-out eval set).

    The benchmark's distinct shingle hashes are corpus-fraction-of-a-
    percent sized -> broadcast; the train side never shuffles. Per-source
    rollup of contaminated docs and total n-gram hits."""
    def build_posts():
        docs = engine_docs(spark, sf_dir).select("doc_id", "text", "source")
        sh = docs.select(
            "doc_id", "source",
            shingles(tokens(F.col("text")), DECON_SHINGLE_N).alias("sh"))
        return (sh.select("doc_id", "source", F.explode("sh").alias("s"))
                .select("doc_id", "source", F.xxhash64("s").alias("h")))

    # cache the shingle posts: they feed both the broadcast benchmark side
    # and the train side — uncached, the Pandas-UDF shingling would run
    # twice per action over the whole corpus
    posts = _cached_df("decon_posts", sf_dir, build_posts)
    bench = (posts.filter(F.col("doc_id") % 97 == 0)
             .select("h").distinct())
    hits = (posts.filter(F.col("doc_id") % 97 != 0)
            .join(F.broadcast(bench), "h")
            .groupBy("doc_id", "source")
            .agg(F.count(F.lit(1)).alias("hits")))
    return (hits.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_contaminated"),
                 F.sum("hits").alias("total_hits"))
            .orderBy("source"))


DECONTAMINATION_SQL = f"""
WITH sh AS (
  SELECT doc_id, source,
         {shingles_sql(tokens_sql(), DECON_SHINGLE_N)} AS sh
  FROM documents
),
posts AS (SELECT doc_id, source, unnest(sh) AS s FROM sh),
bench AS (SELECT DISTINCT s FROM posts WHERE doc_id % 97 = 0),
hits AS (
  SELECT p.doc_id, p.source, COUNT(*) AS hits
  FROM posts p JOIN bench b ON p.s = b.s
  WHERE p.doc_id % 97 <> 0
  GROUP BY 1, 2
)
SELECT source, COUNT(*) AS n_contaminated,
       CAST(SUM(hits) AS BIGINT) AS total_hits
FROM hits GROUP BY source ORDER BY source
"""


# ---------------------------------------------------------------------------
# sequence packing (concat-and-chunk into fixed token budgets)
# ---------------------------------------------------------------------------


def sequence_packing(spark, sf_dir):
    """Pack documents into {PACK_BUDGET}-token training sequences.

    Concat-and-chunk: within a pack-shard (doc_id % {PACK_SHARDS}),
    documents are laid end-to-end in doc_id order and cut every
    PACK_BUDGET tokens; a doc belongs to the sequence its last token
    lands in. The running total is a per-shard window — shards bound the
    window partition size so no single ordering serializes the corpus."""
    docs = engine_docs(spark, sf_dir).select("doc_id", "text")
    toks = docs.select(
        "doc_id",
        (F.col("doc_id") % PACK_SHARDS).alias("shard"),
        F.size(tokens(F.col("text"))).alias("tok"))
    from pyspark.sql import Window

    w = Window.partitionBy("shard").orderBy("doc_id")
    packed = toks.withColumn("cum", F.sum("tok").over(w)) \
                 .withColumn("seq_id",
                             F.floor((F.col("cum") - 1) / PACK_BUDGET))
    return (packed.groupBy("shard", "seq_id")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("tok").alias("seq_tokens"))
            .orderBy("shard", "seq_id"))


SEQUENCE_PACKING_SQL = f"""
WITH toks AS (
  SELECT doc_id, doc_id % {PACK_SHARDS} AS shard,
         len({tokens_sql()}) AS tok
  FROM documents
),
packed AS (
  SELECT shard, tok,
         SUM(tok) OVER (PARTITION BY shard ORDER BY doc_id) AS cum
  FROM toks
)
SELECT shard, CAST(FLOOR((cum - 1) / {PACK_BUDGET}) AS BIGINT) AS seq_id,
       COUNT(*) AS n_docs, CAST(SUM(tok) AS BIGINT) AS seq_tokens
FROM packed GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# domain mixing (deterministic weighted sampling)
# ---------------------------------------------------------------------------


MIX_M = 2147483647  # MINSTD modulus (2^31 - 1)
MIX_A = 48271       # MINSTD multiplier


def mix_gate_py(doc_id: int) -> int:
    """pmod(doc_id, M) * A mod M mod 1000 — the shared keep gate. The
    first fold uses *positive* mod (pmod) so negative doc_ids land on the
    same non-negative residue in every engine (Python's `%` floors while
    Spark/DuckDB truncate toward zero — they only agree on non-negative
    operands). After the fold everything is non-negative, the product
    stays under 2^63, and the identical arithmetic runs overflow-free
    (and ANSI-safe) in Spark, DuckDB, and Python at any doc_id."""
    return (doc_id % MIX_M + MIX_M) % MIX_M * MIX_A % MIX_M % 1000


def domain_mix_sample(spark, sf_dir):
    """Deterministic per-language downsampling to a target mix.

    Keep gate: MINSTD multiplicative hash of doc_id mod 1000 against the
    language's permille rate — pure arithmetic, so any engine (and any
    retry) derives the identical sample with no RNG state. Rowwise filter
    -> zero shuffle before the rollup."""
    docs = engine_docs(spark, sf_dir).select("doc_id", "text", "lang", "source")
    gate = F.pmod(F.col("doc_id"), F.lit(MIX_M)) * F.lit(MIX_A) % F.lit(MIX_M) % F.lit(1000)
    rate = F.lit(MIX_DEFAULT_PERMILLE)
    for lang, pm in MIX_PERMILLE.items():
        rate = F.when(F.col("lang") == lang, F.lit(pm)).otherwise(rate)
    kept = docs.filter(gate < rate)
    return (kept.groupBy("source", "lang")
            .agg(F.count(F.lit(1)).alias("n_kept"),
                 F.sum(F.size(tokens(F.col("text")))).alias("tokens_kept"))
            .orderBy("source", "lang"))


# one source of truth for the rates: generated from MIX_PERMILLE
_MIX_RATE_SQL = "CASE " + " ".join(
    f"WHEN lang = '{lang}' THEN {pm}" for lang, pm in MIX_PERMILLE.items()
) + f" ELSE {MIX_DEFAULT_PERMILLE} END"

DOMAIN_MIX_SQL = f"""
SELECT source, lang, COUNT(*) AS n_kept,
       CAST(SUM(len({tokens_sql()})) AS BIGINT) AS tokens_kept
FROM documents
WHERE (doc_id % {MIX_M} + {MIX_M}) % {MIX_M} * {MIX_A} % {MIX_M} % 1000 < {_MIX_RATE_SQL}
GROUP BY source, lang ORDER BY source, lang
"""


# ---------------------------------------------------------------------------
# stratified sampling (deterministic per-stratum rate to a target cap)
# ---------------------------------------------------------------------------

STRAT_CAP = 120  # target docs per language stratum


def stratified_sample(spark, sf_dir):
    """Deterministic stratified downsampling: each language stratum is
    sampled at rate ceil-capped to hit ~STRAT_CAP docs, using the same
    MINSTD arithmetic gate as domain mixing so the sample is re-derivable
    bit-for-bit on any engine and any retry.

    Shapes for 100 TB: stratum counts are one map-side-combined groupBy
    (stratum cardinality rows on the driver side of the broadcast);
    the rate table broadcasts back; the gate itself is a rowwise filter —
    no shuffle of the corpus at any point."""
    docs = engine_docs(spark, sf_dir).select(
        "doc_id", "lang", "n_chars")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_total"))
    rates = counts.withColumn(
        "rate_permille",
        F.least(F.lit(1000).cast("long"),
                F.expr(f"({STRAT_CAP}L * 1000 + n_total - 1) div n_total")))
    gate = (F.pmod(F.col("doc_id"), F.lit(MIX_M)) * F.lit(MIX_A)
            % F.lit(MIX_M) % F.lit(1000))
    from pyspark.sql.functions import broadcast

    joined = docs.join(broadcast(rates), "lang")
    kept = joined.filter(gate < F.col("rate_permille"))
    return (kept.groupBy("lang")
            .agg(F.max("n_total").alias("n_total"),
                 F.max("rate_permille").alias("rate_permille"),
                 F.count(F.lit(1)).alias("n_sampled"),
                 F.sum("n_chars").alias("chars_sampled"))
            .orderBy("lang"))


STRATIFIED_SAMPLE_SQL = f"""
WITH rates AS (
  SELECT lang, COUNT(*) AS n_total,
         LEAST(1000, ({STRAT_CAP} * 1000 + COUNT(*) - 1) // COUNT(*))
           AS rate_permille
  FROM documents GROUP BY lang
)
SELECT d.lang, MAX(r.n_total) AS n_total,
       MAX(r.rate_permille) AS rate_permille,
       COUNT(*) AS n_sampled,
       CAST(SUM(d.n_chars) AS BIGINT) AS chars_sampled
FROM documents d JOIN rates r USING (lang)
WHERE (d.doc_id % {MIX_M} + {MIX_M}) % {MIX_M} * {MIX_A} % {MIX_M} % 1000
      < r.rate_permille
GROUP BY d.lang ORDER BY d.lang
"""


# ---------------------------------------------------------------------------
# exact per-group quantiles (discrete, rank-based)
# ---------------------------------------------------------------------------


def group_quantiles(spark, sf_dir):
    """Exact per-language n_chars quantiles (p25/p50/p75/p95), discrete
    percentile: the value at 1-indexed rank ceil(q*n) in (n_chars,
    doc_id) order. Integer rank arithmetic — (cnt*q + 99) div 100 — so
    both engines pick the identical row with no float boundary.

    Scale: one window sort PER GROUP; groups are languages (bounded
    cardinality), so the sort parallelizes across groups and the
    approximate path at extreme skew is percentile_approx over the same
    partitioning."""
    from pyspark.sql import Window

    docs = engine_docs(spark, sf_dir).select("doc_id", "lang", "n_chars")
    w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    wc = Window.partitionBy("lang")
    r = (docs.withColumn("rn", F.row_number().over(w))
             .withColumn("cnt", F.count(F.lit(1)).over(wc)))
    aggs = [F.max("cnt").alias("n_docs")]
    for q in (25, 50, 75, 95):
        rank = F.expr(f"(cnt * {q} + 99) div 100")
        aggs.append(F.max(F.when(F.col("rn") == rank,
                                 F.col("n_chars"))).alias(f"p{q}"))
    return r.groupBy("lang").agg(*aggs).orderBy("lang")


_Q_CASES = ", ".join(
    f"MAX(CASE WHEN rn = (cnt * {q} + 99) // 100 THEN n_chars END) AS p{q}"
    for q in (25, 50, 75, 95))

GROUP_QUANTILES_SQL = f"""
WITH r AS (
  SELECT lang, n_chars,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY n_chars, doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY lang) AS cnt
  FROM documents
)
SELECT lang, MAX(cnt) AS n_docs, {_Q_CASES}
FROM r GROUP BY lang ORDER BY lang
"""


REGISTRY = {
    "dedup_cluster_resolve": (dedup_cluster_resolve, CLUSTER_RESOLVE_SQL),
    "dedup_keep_best": (dedup_keep_best, DEDUP_KEEP_BEST_SQL),
    "decontamination": (decontamination, DECONTAMINATION_SQL),
    "sequence_packing": (sequence_packing, SEQUENCE_PACKING_SQL),
    "domain_mix_sample": (domain_mix_sample, DOMAIN_MIX_SQL),
    "stratified_sample": (stratified_sample, STRATIFIED_SAMPLE_SQL),
    "group_quantiles": (group_quantiles, GROUP_QUANTILES_SQL),
}
