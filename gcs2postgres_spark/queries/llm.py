"""LLM-data-pipeline queries (SURVEY.md §2.8): dedup (exact, MinHash-LSH,
SimHash, n-gram Jaccard, embedding-cosine), similarity search, text
analysis, multimodal columns.

Oracle policy: EVERY query here has an exact DuckDB oracle — including
the hash-sketch ops: MinHash-LSH's registered query certifies its
candidate set against the exact all-pairs Jaccard SQL, and SimHash uses
the portable md5-derived hash (portable_hash60) that DuckDB recomputes
bit-identically (both since commit 3dfaa04; see QUERIES.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gcs2postgres_spark.catalog import load_table
from gcs2postgres_spark.operators.caching import maybe_persist, widen_doc_scan
from gcs2postgres_spark.functions.text import (
    BPE_ISH_PATTERN,
    bpe_ish_token_count,
    fingerprint,
    lang_id_heuristic,
    quality_score_cols,
    token_count,
)
from gcs2postgres_spark.functions.vectors import cosine_similarity, l2_norm
from gcs2postgres_spark.operators.dedup import (
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    shingle_docs,
    simhash,
    simhash_near_pairs,
)
from gcs2postgres_spark.operators.similarity import (
    assign_ivf_cells,
    brute_force_cosine_topk,
    ivf_cosine_topk,
    ivf_query_probes,
    score_ivf_cells,
    srp_cosine_near_dup_pairs,
    srp_lsh_cosine_topk,
    train_ivf_quantizer,
)
from gcs2postgres_spark.queries.registry import register
from gcs2postgres_spark.session import tune_for_session


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    tune_for_session(spark)
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------

DEDUP_EXACT_ORACLE = """
SELECT text, CAST(min(doc_id) AS BIGINT) AS doc_id, count(*) AS n_copies
FROM documents
GROUP BY text
HAVING count(*) >= 1
ORDER BY doc_id
"""


@register("dedup_exact", oracle=DEDUP_EXACT_ORACLE)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact text dedup: keep min doc_id per distinct text + copy count
    (hash-groupBy; deterministic vs dropDuplicates' arbitrary pick)."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.groupBy("text")
        .agg(F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("n_copies"))
        .orderBy("doc_id")
    )


FINGERPRINT_ORACLE = """
SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
       CAST(min(doc_id) AS BIGINT) AS first_doc,
       count(*) AS n_docs
FROM documents
GROUP BY 1
ORDER BY first_doc
"""


@register("doc_fingerprint", oracle=FINGERPRINT_ORACLE)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalizing md5 fingerprint (document fingerprinting / exact-dup
    detection robust to case+whitespace)."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.select(fingerprint(F.col("text")).alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(F.min("doc_id").alias("first_doc"), F.count(F.lit(1)).alias("n_docs"))
        .orderBy("first_doc")
    )


NGRAM_JACCARD_ORACLE = """
WITH uniq AS (
  SELECT DISTINCT doc_id, unnest(string_split(lower(trim(text)), ' ')) AS tok
  FROM documents WHERE doc_id < 100
),
sizes AS (SELECT doc_id, count(*) AS n FROM uniq GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
  FROM uniq a JOIN uniq b ON a.tok = b.tok AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) AS jaccard
FROM inter
JOIN sizes sa ON id_a = sa.doc_id
JOIN sizes sb ON id_b = sb.doc_id
WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) > 0.5
ORDER BY id_a, id_b
"""


@register("ngram_jaccard_pairs", oracle=NGRAM_JACCARD_ORACLE)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact token-set Jaccard near-dup pairs (> 0.5) on a bounded id range —
    the exact form of what MinHash-LSH approximates; also the verify step
    of the LSH pipeline."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return (
        jaccard_pairs(d, "doc_id", "text", shingle_n=1)
        .filter(F.col("jaccard") > 0.5)
        .orderBy("id_a", "id_b")
    )


# Exact word-3-gram-shingle Jaccard over ALL pairs — the ground truth the
# LSH pipeline must reproduce. Valid as an equality oracle because the
# pipeline's final output is candidate pairs RE-VERIFIED with exact
# Jaccard: banding only risks *missing* pairs, and on this corpus every
# pair at jaccard >= 0.4 actually sits at >= 0.8 (measured: no pair in
# [0.2, 0.8)), where 8x4 banding recall is ~0.985+ per pair and the
# deterministic xxhash64 seeds catch all of them at every sf (verified
# empirically at sf0.001/0.01/0.1 — zero missed, zero extra).
MINHASH_LSH_ORACLE = """
WITH toks AS MATERIALIZED (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t FROM documents
), sh AS MATERIALIZED (
  SELECT doc_id, unnest(list_distinct(
    CASE WHEN len(t) >= 3
      THEN list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
      ELSE [array_to_string(t, ' ')] END)) AS shingle
  FROM toks
), sizes AS MATERIALIZED (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS MATERIALIZED (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) AS jaccard
FROM inter
JOIN sizes sa ON id_a = sa.doc_id
JOIN sizes sb ON id_b = sb.doc_id
WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) >= 0.4
ORDER BY id_a, id_b
"""


@register("dedup_minhash_lsh", oracle=MINHASH_LSH_ORACLE)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(32 perms) + LSH(8 bands × 4 rows) candidate pairs, verified
    with exact shingle Jaccard ≥ 0.4. Output: id_a, id_b, jaccard.

    Oracle-checkable because the output is the *verified* pair set: the
    jaccard values are exact set algebra (identical int operands → identical
    doubles on both engines), and LSH banding demonstrably catches every
    true pair on this corpus (see MINHASH_LSH_ORACLE note).

    The (doc, shingle) relation is computed once and cached when the
    corpus is large — the DAG reads it three times (signatures,
    intersection join, set sizes); without the persist each branch
    re-runs the explode+distinct shuffle. Size-conditional
    (operators.caching): at sf0.1 the cache build cost more than the
    re-runs it saved."""
    d = _t(spark, sf_dir, "documents")
    shingled = maybe_persist(shingle_docs(d, "doc_id", "text", shingle_n=3))
    # with_size + carry: the shingle count rides the banding pipeline, so
    # the verify step joins no standalone sizes branches — the r17
    # before-plan evaluated the shingler 6× (2 sizes branches each
    # re-shingled); carrying n through the band join cuts that to 4
    # (band-join sides, sh_a, sh_b) with zero extra shuffles
    sigs = minhash_signatures(
        d, "doc_id", "text", num_perm=32, shingle_n=3, shingled=shingled, with_size=True
    )
    cands = lsh_candidate_pairs(sigs, "doc_id", num_perm=32, bands=8, carry=("n",))
    verified = jaccard_pairs(
        d, "doc_id", "text", shingle_n=3, candidates=cands, shingled=shingled
    )
    return verified.filter(F.col("jaccard") >= 0.4).orderBy("id_a", "id_b")


def _simhash_oracle_sql(bits: int = 60) -> str:
    """DuckDB SQL computing the IDENTICAL portable simhash (md5-derived
    60-bit hash, see operators/dedup.py portable_hash60) and the exact
    hamming ≤ 3 pair set — generated per-lane so both engines evaluate
    the same +1/−1 lane sums and sign bits."""
    lanes = ",\n         ".join(
        f"sum(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS lane_{i}"
        for i in range(bits)
    )
    fp_terms = " + ".join(
        f"(CASE WHEN lane_{i} > 0 THEN (1::BIGINT << {i}) ELSE 0::BIGINT END)"
        for i in range(bits)
    )
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(list_distinct(string_split_regex(lower(trim(text)), '\\s+'))) AS tok
  FROM documents
), hashed AS (
  SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM toks
), lanes AS (
  SELECT doc_id,
         {lanes}
  FROM hashed GROUP BY doc_id
), fp AS (
  SELECT doc_id, {fp_terms} AS simhash FROM lanes
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
ORDER BY id_a, id_b
"""


@register("dedup_simhash", oracle=_simhash_oracle_sql())
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable 60-bit SimHash near-dup pairs with hamming ≤ 3 via a
    4×15-bit band join. Output: id_a, id_b, hamming.

    Exactly oracle-checkable by construction: the hash is md5-derived
    (portable_hash60) so DuckDB computes bit-identical fingerprints, and
    hamming ≤ 3 with 4 bands is pigeonhole-COMPLETE (≤3 differing bits
    can dirty at most 3 of 4 bands), so the banded join provably finds
    every qualifying pair — no approximation gap. The xxhash64 variant
    (faster, same plan) stays the default in operators/dedup.py."""
    d = _t(spark, sf_dir, "documents")
    fps = simhash(d, "doc_id", "text", bits=60, portable=True)
    return simhash_near_pairs(fps, "doc_id", max_hamming=3, bits=60, bands=4).orderBy(
        "id_a", "id_b"
    )


COSINE_NEAR_DUP_ORACLE = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 9) AS cos_sim
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) > 0.45
ORDER BY id_a, id_b
"""


@register("dedup_cosine_embeddings", oracle=COSINE_NEAR_DUP_ORACLE)
def dedup_cosine_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (cos > 0.45) over the FULL
    corpus via EXACT blocked-GEMM all-pairs
    (operators/similarity.blocked_cosine_pairs): provably complete, so
    the all-pairs oracle is matched by construction, no recall
    argument. This REPLACED the SRP-LSH path for this query after the
    r5b sf1 sweep measured it at 904 s on 20k vectors — at a
    near-chance threshold (true pairs sit at cos 0.45-0.60, collision
    p≈0.65) every (nbits, ntables) choice either floods buckets
    (600M candidates) or drops true pairs; blocked numpy GEMM does
    the same complete verify at BLAS speed (measured ~3 s). SRP-LSH
    (srp_cosine_near_dup_pairs) remains the scale path for HIGH
    thresholds, where its recall math actually wins."""
    from gcs2postgres_spark.operators.similarity import blocked_cosine_pairs

    e = _t(spark, sf_dir, "embeddings")
    return (
        blocked_cosine_pairs(e, threshold=0.45)
        .withColumn("cos_sim", F.round(F.col("cos_sim"), 9))
        .orderBy("id_a", "id_b")
    )


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------

COSINE_TOPK_ORACLE = """
WITH scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) AS cos_sim
  FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
  WHERE q.vec_id < 10
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rn
  FROM scored
)
SELECT query_id, neighbor_id, round(cos_sim, 9) AS cos_sim FROM ranked WHERE rn <= 5
ORDER BY query_id, cos_sim DESC, neighbor_id
"""


@register("similarity_cosine_topk", oracle=COSINE_TOPK_ORACLE)
def similarity_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact cosine top-5 for query vectors vec_id<10 against
    the full corpus — broadcast queries, corpus streams partition-parallel.
    cos_sim quantized to 9dp: BLAS dot vs DuckDB's accumulation differ in
    the last ulp; ranking happens on the raw values, rounding is output-only."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    return brute_force_cosine_topk(q, e, k=5).orderBy(
        "query_id", F.col("cos_sim").desc(), "neighbor_id"
    ).withColumn("cos_sim", F.round(F.col("cos_sim"), 9))


def _ann_recall_contract(
    spark: SparkSession, sf_dir: str, ann_topk, min_overlap: int, flag_name: str
) -> DataFrame:
    """ANN verification harness: run the approximate top-5 AND the exact
    brute-force top-5, emit per query (n_results, overlap>=min_overlap).
    The recall contract is what an external oracle can state about an
    approximate index — the exact baseline rides along only to make the
    assertion computable in-engine."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    ann = ann_topk(q, e).select("query_id", "neighbor_id")
    exact = brute_force_cosine_topk(q, e, k=5).select("query_id", "neighbor_id")
    n_res = ann.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_results"))
    hits = (
        ann.join(exact, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        n_res.join(hits, "query_id", "left")
        .select(
            "query_id",
            "n_results",
            (F.coalesce(F.col("n_hits"), F.lit(0)) >= min_overlap).alias(flag_name),
        )
        .orderBy("query_id")
    )


SRP_RECALL_ORACLE = """
SELECT vec_id AS query_id, CAST(5 AS BIGINT) AS n_results, TRUE AS recall_ge_0p8
FROM embeddings WHERE vec_id < 10 ORDER BY query_id
"""


@register("similarity_srp_lsh_topk", oracle=SRP_RECALL_ORACLE)
def similarity_srp_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRP-LSH approximate top-5 (24 tables × 4 bits, OR-amplified) — the
    hash-bucket ANN scale path. Output is the per-query recall contract
    (≥4 of the exact top-5 retrieved, deterministic hyperplanes), which
    the oracle can state; the neighbor lists themselves are approximate
    by design. 24 tables: this corpus is near-isotropic (true neighbors
    sit at noise-floor cosine), so OR-amplification needs headroom; on
    clustered real embeddings 8 tables suffice at the same recall."""
    return _ann_recall_contract(
        spark,
        sf_dir,
        lambda q, e: srp_lsh_cosine_topk(q, e, k=5, nbits=4, ntables=24),
        min_overlap=4,
        flag_name="recall_ge_0p8",
    )


IVF_RECALL_ORACLE = """
SELECT vec_id AS query_id, CAST(5 AS BIGINT) AS n_results, TRUE AS recall_ge_0p6
FROM embeddings WHERE vec_id < 10 ORDER BY query_id
"""


@register("similarity_ivf_topk", oracle=IVF_RECALL_ORACLE)
def similarity_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-5 (16-cell coarse k-means quantizer) — the
    partition-pruning ANN scale path. Output is the per-query recall
    contract (≥3 of the exact top-5). n_probe=12 here: the toy corpus is
    near-isotropic so neighbors spread across cells; on clustered real
    embeddings n_probe≈4 reaches the same recall while scanning ~25% of
    the corpus (the tests measure the recall/probe curve)."""
    return _ann_recall_contract(
        spark,
        sf_dir,
        lambda q, e: ivf_cosine_topk(q, e, k=5, n_centroids=16, n_probe=12),
        min_overlap=3,
        flag_name="recall_ge_0p6",
    )


IVF_PRUNED_ORACLE = """
SELECT vec_id AS query_id, CAST(5 AS BIGINT) AS n_results,
       TRUE AS scan_pruned, TRUE AS pruned_matches_inline
FROM embeddings WHERE vec_id < 3 ORDER BY query_id
"""


def _ivf_partitioned_path(spark: SparkSession, sf_dir: str, n_centroids: int, seed: int):
    """Idempotently materialize the cell-assigned corpus as parquet
    DIRECTORY-PARTITIONED BY CELL — the production IVF layout promised
    by ``assign_ivf_cells``: each coarse cell is its own partition
    directory, so a probe's cell filter becomes PartitionFilters and
    unprobed cells cost ZERO I/O (the ANN analogue of the z-order file
    pruning demo). Path is keyed on (sf_dir, source fingerprint,
    params) so regenerated testdata never reuses a stale index."""
    import hashlib
    import os
    import tempfile

    src = os.path.join(sf_dir, "embeddings.parquet")
    tag = hashlib.md5(
        f"{os.path.abspath(sf_dir)}|{n_centroids}|{seed}|"
        f"{os.path.getmtime(src)}:{os.path.getsize(src)}".encode()
    ).hexdigest()[:10]
    path = os.path.join(tempfile.gettempdir(), f"spark_graft_ivf_{tag}")
    base = _t(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("cid"), F.col("embedding").cast("array<double>").alias("vec")
    )
    cent = train_ivf_quantizer(base, n_centroids=n_centroids, seed=seed)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        assign_ivf_cells(base, cent).write.mode("overwrite").partitionBy("cell").parquet(path)
    return path, cent


@register("similarity_ivf_pruned_topk", oracle=IVF_PRUNED_ORACLE)
def similarity_ivf_pruned_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF probe over the CELL-PARTITIONED corpus layout: the corpus is
    written once partitioned by its coarse-quantizer cell, and each
    search reads back only the probed cells — the filter lands as
    PartitionFilters in the parquet scan (plan-pinned), so at 100 TB a
    4-of-16-probe search plans ~25% of the corpus and never opens the
    rest. Output certifies the layout, per query: exactly k results,
    ``scan_pruned`` (the probed-cell union is a strict subset of the
    cells — structural: 3 queries × 4 probes ≤ 12 < 16), and
    ``pruned_matches_inline`` (the pruned-scan search returns EXACTLY
    the rows the inline-assignment path computes — partition pruning
    loses nothing). Recall itself is certified by similarity_ivf_topk;
    this entry certifies the scale path's physical layout."""
    n_centroids, n_probe, k, seed = 16, 4, 5, 42
    path, cent = _ivf_partitioned_path(spark, sf_dir, n_centroids, seed)
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 3)

    triple = ivf_query_probes(q, cent, "vec_id", "embedding", n_probe)
    union_cells = sorted({int(c) for c in triple[2].flatten().tolist()})
    scan_pruned = len(union_cells) < n_centroids

    pruned_scan = spark.read.parquet(path).filter(F.col("cell").isin(union_cells))
    via_layout = score_ivf_cells(pruned_scan, q, cent, k=k, n_probe=n_probe)

    base = e.select(
        F.col("vec_id").alias("cid"), F.col("embedding").cast("array<double>").alias("vec")
    )
    via_inline = score_ivf_cells(assign_ivf_cells(base, cent), q, cent, k=k, n_probe=n_probe)

    a = via_layout.select("query_id", "neighbor_id", F.round("cos_sim", 9).alias("s"))
    b = via_inline.select("query_id", "neighbor_id", F.round("cos_sim", 9).alias("s"))
    mism = (
        a.join(b, ["query_id", "neighbor_id", "s"], "full")
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_joined"))
    )
    n_a = a.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_results"))
    n_b = b.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_inline"))
    return (
        n_a.join(n_b, "query_id", "full")
        .join(mism, "query_id", "full")
        .select(
            "query_id",
            F.coalesce("n_results", F.lit(0)).alias("n_results"),
            F.lit(scan_pruned).alias("scan_pruned"),
            # full join of the two row sets collapses to n rows iff the
            # sets are identical: any one-sided row inflates n_joined
            (
                (F.col("n_joined") == F.col("n_results"))
                & (F.col("n_results") == F.col("n_inline"))
            ).alias("pruned_matches_inline"),
        )
        .orderBy("query_id")
    )


EMBED_NORM_ORACLE = """
SELECT label,
       count(*) AS n,
       avg(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)))) AS avg_norm,
       CAST(min(len(embedding)) AS BIGINT) AS dim_min,
       CAST(max(len(embedding)) AS BIGINT) AS dim_max
FROM embeddings
GROUP BY label
ORDER BY label
"""


@register("embedding_norm_stats", oracle=EMBED_NORM_ORACLE)
def embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-column math battery: per-label L2-norm stats via higher-order
    functions (aggregate/transform) — the JVM-side vector-math pattern."""
    e = _t(spark, sf_dir, "embeddings")
    vec = F.col("embedding").cast("array<double>")
    return (
        e.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg(l2_norm(vec)).alias("avg_norm"),
            F.min(F.size("embedding")).cast("bigint").alias("dim_min"),
            F.max(F.size("embedding")).cast("bigint").alias("dim_max"),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------

TEXT_STATS_ORACLE = """
SELECT lang,
       count(*)                                              AS n_docs,
       CAST(sum(len(string_split(trim(text), ' '))) AS BIGINT) AS total_tokens,
       avg(CAST(n_chars AS DOUBLE))                          AS avg_chars,
       CAST(sum(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]'))) AS BIGINT)
                                                             AS total_bpe_tokens
FROM documents
GROUP BY lang
ORDER BY lang
"""


@register("text_token_stats", oracle=TEXT_STATS_ORACLE)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + BPE-ish regex lexer tokens,
    aggregated per language.

    The regex lexing is the per-doc-heavy stage, and it runs in the
    partial aggregate directly on the scan — widen the compact corpus
    scan first (guide §2.5; documents at sf1 scans as 2 partitions on a
    32-core box, serializing the regex work). Partitioning cannot
    change the grouped sums."""
    d = widen_doc_scan(_t(spark, sf_dir, "documents"), "doc_id")
    return (
        d.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(token_count(F.col("text"))).cast("bigint").alias("total_tokens"),
            F.avg(F.col("n_chars").cast("double")).alias("avg_chars"),
            F.sum(bpe_ish_token_count(F.col("text"))).cast("bigint").alias("total_bpe_tokens"),
        )
        .orderBy("lang")
    )


TEXT_QUALITY_ORACLE = """
SELECT doc_id,
       CAST(length(text) AS BIGINT)                          AS n_chars,
       CAST(len(string_split(trim(text), ' ')) AS BIGINT)    AS n_tokens,
       CAST(len(list_distinct(string_split(trim(text), ' '))) AS DOUBLE)
         / len(string_split(trim(text), ' '))                AS type_token_ratio,
       CAST(length(regexp_replace(text, '[a-z ]', '', 'g')) AS DOUBLE)
         / length(text)                                      AS non_alpha_ratio
FROM documents
WHERE doc_id < 200
ORDER BY doc_id
"""


@register("text_quality_score", oracle=TEXT_QUALITY_ORACLE)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality features (length, lexical diversity, non-alpha
    ratio) — the filter basis of a training-data quality gate."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    cols = quality_score_cols(F.col("text"))
    return d.select(
        "doc_id",
        cols["n_chars"].alias("n_chars"),
        cols["n_tokens"].alias("n_tokens"),
        cols["type_token_ratio"].alias("type_token_ratio"),
        cols["non_alpha_ratio"].alias("non_alpha_ratio"),
    ).orderBy("doc_id")


LANG_DIST_ORACLE = """
SELECT lang, count(*) AS n_docs, avg(CAST(n_chars AS DOUBLE)) AS avg_len
FROM documents
GROUP BY lang
ORDER BY n_docs DESC, lang
"""


@register("text_lang_distribution", oracle=LANG_DIST_ORACLE)
def text_lang_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language distribution: n-gram-heuristic language ID aggregated per language bucket."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.avg(F.col("n_chars").cast("double")).alias("avg_len"))
        .orderBy(F.col("n_docs").desc(), "lang")
    )


def _lang_id_oracle_sql() -> str:
    """DuckDB replica of functions/text.py lang_id_heuristic, generated
    from the same LANG_MARKERS lexicon: marker-hit counts per language,
    argmax with ties broken by language-code order, zero hits → 'und'."""
    from gcs2postgres_spark.functions.text import LANG_MARKERS

    langs = sorted(LANG_MARKERS)
    score_cols = ",\n         ".join(
        "("
        + " + ".join(f"list_contains(toks, '{m}')::INT" for m in LANG_MARKERS[lang])
        + f") AS s_{lang}"
        for lang in langs
    )
    best = "greatest(" + ", ".join(f"s_{lang}" for lang in langs) + ")"
    case = f"CASE WHEN {best} = 0 THEN 'und'\n" + "\n".join(
        f"              WHEN s_{lang} = {best} THEN '{lang}'" for lang in langs
    ) + "\n              ELSE 'und' END"
    return f"""
WITH t AS (
  SELECT lang, string_split_regex(lower(trim(text)), '\\s+') AS toks FROM documents
), s AS (
  SELECT lang,
         {score_cols}
  FROM t
)
SELECT {case} AS predicted,
       lang AS actual,
       count(*) AS n
FROM s
GROUP BY 1, 2
ORDER BY predicted, actual
"""


@register("text_lang_id", oracle=_lang_id_oracle_sql())
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language-ID heuristic vs the labeled lang column —
    outputs the confusion pairs (predicted, actual, n). The heuristic is
    deterministic marker-set arithmetic, so the oracle replays it in SQL
    from the same lexicon (argmax, ties → language-code order).

    Widened first: the split + 15 array_contains probes per doc are the
    heavy stage and otherwise run at the narrow corpus-scan width."""
    d = widen_doc_scan(_t(spark, sf_dir, "documents"), "doc_id")
    return (
        d.select(lang_id_heuristic(F.col("text")).alias("predicted"), F.col("lang").alias("actual"))
        .groupBy("predicted", "actual")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("predicted", "actual")
    )


# ---------------------------------------------------------------------------
# Multimodal columns
# ---------------------------------------------------------------------------

MULTIMODAL_ORACLE = """
SELECT d.doc_id,
       CAST(d.n_chars AS BIGINT)        AS n_chars,
       e.label,
       CAST(len(e.embedding) AS BIGINT) AS dim,
       CAST(octet_length(CAST(d.text AS BLOB)) AS BIGINT) AS payload_bytes
FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
WHERE d.doc_id < 300
ORDER BY d.doc_id
"""


@register("multimodal_join", oracle=MULTIMODAL_ORACLE)
def multimodal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal record assembly: join text + embedding modalities into one
    row (binary payload modeled as encoded text bytes — see
    operators/multimodal.py for the decode plumbing). Output flattened for
    oracle comparability; in-engine the same join carries
    struct(text, embedding, payload)."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    e = load_table(spark, sf_dir, "embeddings")
    return (
        d.join(e, d.doc_id == e.vec_id)
        .select(
            "doc_id",
            F.col("n_chars").cast("bigint").alias("n_chars"),
            "label",
            F.size("embedding").cast("bigint").alias("dim"),
            F.octet_length(F.encode(F.col("text"), "utf-8")).cast("bigint").alias("payload_bytes"),
        )
        .orderBy("doc_id")
    )


# SQL replay of the decode pipeline's aggregate: metadata is plain
# arithmetic over doc_id (attach_fake_media), payload is the utf-8 text
# bytes, and feature[0] = payload_bytes/1024.0 is exact in binary (len /
# 2^10), so the avg matches bit-for-bit; rounded anyway for safety.
MULTIMODAL_DECODE_ORACLE = """
SELECT CAST(((doc_id * 37 + 11) % 512 + 32) % 4 AS INT)    AS w_bucket,
       CAST(count(*) AS BIGINT)                             AS n_media,
       CAST(sum(octet_length(CAST(text AS BLOB))) AS BIGINT) AS total_bytes,
       round(avg(octet_length(CAST(text AS BLOB)) / 1024.0), 9) AS avg_kb_feature
FROM documents
WHERE doc_id < 500
GROUP BY 1
ORDER BY w_bucket
"""


@register("multimodal_decode_features", oracle=MULTIMODAL_DECODE_ORACLE)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full multimodal plumbing end-to-end: attach binary payload + typed
    metadata, Arrow-batched mapInPandas decode (deterministic fake codec —
    the PIL/ffmpeg seam, operators/multimodal.py), then aggregate decoded
    features per media dimension bucket. The fake codec's features are
    arithmetic over the payload bytes, so the whole pipeline — including
    the Python decode stage — is replayed by the SQL oracle."""
    from gcs2postgres_spark.operators.multimodal import attach_fake_media, decode_media

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    decoded = decode_media(attach_fake_media(d))
    return (
        decoded.groupBy((F.col("width") % 4).alias("w_bucket"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_media"),
            F.sum("payload_bytes").cast("bigint").alias("total_bytes"),
            F.round(F.avg(F.element_at("feature", 1)), 9).alias("avg_kb_feature"),
        )
        .orderBy("w_bucket")
    )


# DuckDB replica of the winnowing pipeline with the portable md5-derived
# hash: k-gram hashes → sliding-window minima → distinct fingerprints →
# document-frequency cap → inverted-index pair join. Every step is exact
# set algebra over identical hash values, so n_shared matches one-for-one.
WINNOW_ORACLE = """
WITH s AS (
  SELECT doc_id,
         translate(regexp_replace(text, '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g'),
                   'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                   'abcdefghijklmnopqrstuvwxyz') AS t
  FROM documents
), g AS (
  SELECT doc_id,
         list_transform(range(1, greatest(length(t) - 7, 1) + 1),
                        i -> ('0x' || substr(md5(substr(t, i, 8)), 1, 15))::BIGINT) AS grams
  FROM s
), m AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(len(grams) - 3, 1) + 1),
                                      j -> list_min(grams[j:least(j + 3, len(grams))]))) AS fps
  FROM g
), fp AS (
  SELECT doc_id, unnest(fps) AS fp FROM m
), rare AS (
  SELECT fp FROM fp GROUP BY fp HAVING count(*) <= 20
), fpr AS (
  SELECT f.doc_id, f.fp FROM fp f JOIN rare USING (fp)
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS n_shared
FROM fpr a JOIN fpr b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING count(*) >= 5
ORDER BY n_shared DESC, id_a, id_b
"""


@register("doc_winnow_fingerprints", oracle=WINNOW_ORACLE)
def doc_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (MOSS) rolling-window fingerprint near-dup candidates:
    k-gram hashes → sliding-window minima (zip_with fold) →
    stop-fingerprint pruning (document frequency cap) → inverted-index
    pair join. Pure JVM expressions end-to-end — no Python in the row
    path. The registered query uses the portable md5-derived hash
    (operators/dedup.py portable_hash60) so the DuckDB oracle computes
    bit-identical fingerprints and the exact same (id_a, id_b, n_shared)
    rows; the xxhash64 variant stays the production default."""
    from gcs2postgres_spark.operators.dedup import winnow_shared_pairs

    d = _t(spark, sf_dir, "documents")
    return winnow_shared_pairs(d, "doc_id", "text", min_shared=5, portable=True).orderBy(
        F.col("n_shared").desc(), "id_a", "id_b"
    )


def _kmeans_oracle(k: int, n_iters: int) -> str:
    """Unrolled Lloyd recurrence in DuckDB list SQL: c0 = the k
    smallest-id vectors; iteration i assigns by squared-L2 argmin (ties
    → lowest cluster) and recomputes element-wise-mean centroids. Same
    fixed unroll the Spark plan uses — integer cluster counts/id sums
    compare exactly, centroid_l2 is rounded on both sides."""
    sql = [
        f"""WITH emb AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec FROM embeddings
), c0 AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INT) AS cluster, vec AS centroid
  FROM (SELECT vec_id, vec FROM emb ORDER BY vec_id LIMIT {k})
)"""
    ]
    for it in range(1, n_iters + 1):
        sql.append(
            f""", a{it} AS (
  SELECT vec_id, vec, cluster FROM (
    SELECT e.vec_id, e.vec, c.cluster,
           row_number() OVER (PARTITION BY e.vec_id ORDER BY
             list_sum(list_transform(generate_series(1, len(e.vec)),
                                     i -> (e.vec[i] - c.centroid[i]) ^ 2)),
             c.cluster) AS rn
    FROM emb e CROSS JOIN c{it - 1} c
  ) WHERE rn = 1
), c{it} AS (
  SELECT cluster, list(m ORDER BY pos) AS centroid FROM (
    SELECT cluster, i AS pos, avg(vec[i]) AS m
    FROM a{it}, unnest(generate_series(1, len(vec))) AS u(i)
    GROUP BY cluster, i
  ) GROUP BY cluster
)"""
        )
    sql.append(
        f""", l2 AS (
  SELECT cluster, round(sqrt(list_sum(list_transform(centroid, x -> x * x))), 5)
           AS centroid_l2
  FROM c{n_iters}
)
SELECT cluster, count(*) AS n_vecs, CAST(sum(vec_id) AS BIGINT) AS sum_vec_id,
       min(centroid_l2) AS centroid_l2
FROM a{n_iters} JOIN l2 USING (cluster)
GROUP BY cluster ORDER BY cluster"""
    )
    return "".join(sql)


KMEANS_ORACLE = _kmeans_oracle(4, 2)


@register("embedding_kmeans_cluster", oracle=KMEANS_ORACLE)
def embedding_kmeans_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two full Lloyd iterations of k-means (k=4) over the embeddings
    table — corpus clustering for domain discovery / IVF training —
    as ONE declarative plan: broadcast k-row centroid table, map-side
    assignment argmin, (cluster, dim)-cell partial-agg recompute, no
    driver collect between iterations. Deterministic smallest-id init
    (no RNG), so the oracle replays the identical unrolled recurrence;
    integer cluster populations compare exactly — one flipped
    assignment fails the row hash."""
    tune_for_session(spark)
    from gcs2postgres_spark.operators.similarity import kmeans_lloyd

    emb = load_table(spark, sf_dir, "embeddings")
    return kmeans_lloyd(emb, k=4, n_iters=2)


def _pq_oracle(m: int, k: int, n_iters: int, n_queries: int, topk: int) -> str:
    """Unrolled PQ/ADC recurrence in DuckDB list SQL mirroring
    operators/similarity.pq_adc_topk exactly: per-subspace smallest-id
    codebook init + Lloyd rounds, argmin encoding, query LUT build, and
    the partial-distance sum — so the driver's hash compare certifies
    codebook training, encoding, AND the ADC ranking in one row set."""
    parts = [
        """WITH emb AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec FROM embeddings
), q AS (
  SELECT vec_id AS q_id, vec AS qvec FROM emb ORDER BY vec_id LIMIT %d
)"""
        % n_queries
    ]
    for s in range(m):
        # explicit floor, matching operators/similarity._bounds: L =
        # floor(dim/m), subspace s = [s*L+1, (s+1)*L] (plain integer
        # CAST would round-to-nearest in DuckDB and diverge when
        # dim % m != 0)
        ln = f"CAST(floor(len(vec) * 1.0 / {m}) AS INT)"
        lo = f"({s} * {ln} + 1)"
        parts.append(
            f""", sub{s} AS (
  SELECT vec_id, list_slice(vec, {lo}, {lo} + {ln} - 1) AS vec FROM emb
), c0_{s} AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INT) AS cluster, vec AS centroid
  FROM (SELECT vec_id, vec FROM sub{s} ORDER BY vec_id LIMIT {k})
)"""
        )
        for it in range(1, n_iters + 1):
            parts.append(
                f""", a{it}_{s} AS (
  SELECT vec_id, vec, cluster FROM (
    SELECT e.vec_id, e.vec, c.cluster,
           row_number() OVER (PARTITION BY e.vec_id ORDER BY
             list_sum(list_transform(generate_series(1, len(e.vec)),
                                     i -> (e.vec[i] - c.centroid[i]) ^ 2)),
             c.cluster) AS rn
    FROM sub{s} e CROSS JOIN c{it - 1}_{s} c
  ) WHERE rn = 1
), c{it}_{s} AS (
  SELECT cluster, list(m ORDER BY pos) AS centroid FROM (
    SELECT cluster, i AS pos, avg(vec[i]) AS m
    FROM a{it}_{s}, unnest(generate_series(1, len(vec))) AS u(i)
    GROUP BY cluster, i
  ) GROUP BY cluster
)"""
            )
        parts.append(
            f""", codes_{s} AS (
  SELECT vec_id, {s} AS s, cluster AS code FROM (
    SELECT e.vec_id, c.cluster,
           row_number() OVER (PARTITION BY e.vec_id ORDER BY
             list_sum(list_transform(generate_series(1, len(e.vec)),
                                     i -> (e.vec[i] - c.centroid[i]) ^ 2)),
             c.cluster) AS rn
    FROM sub{s} e CROSS JOIN c{n_iters}_{s} c
  ) WHERE rn = 1
), lut_{s} AS (
  SELECT q.q_id, {s} AS s, c.cluster AS code,
         list_sum(list_transform(generate_series(1, {ln.replace('vec', 'qvec')}),
           i -> (list_slice(qvec, {lo.replace('vec', 'qvec')},
                            {lo.replace('vec', 'qvec')} + {ln.replace('vec', 'qvec')} - 1)[i]
                 - c.centroid[i]) ^ 2)) AS pdist
  FROM q CROSS JOIN c{n_iters}_{s} c
)"""
        )
    codes_union = " UNION ALL ".join(f"SELECT * FROM codes_{s}" for s in range(m))
    lut_union = " UNION ALL ".join(f"SELECT * FROM lut_{s}" for s in range(m))
    parts.append(
        f""", codes AS ({codes_union}), lut AS ({lut_union}),
adc AS (
  SELECT l.q_id, c.vec_id, round(sum(l.pdist), 5) AS adc_dist
  FROM codes c JOIN lut l ON c.s = l.s AND c.code = l.code
  GROUP BY l.q_id, c.vec_id
)
SELECT q_id, vec_id, adc_dist, CAST(rank AS INT) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY adc_dist, vec_id) AS rank
  FROM adc
) WHERE rank <= {topk}
ORDER BY q_id, rank"""
    )
    return "".join(parts)


PQ_ORACLE = _pq_oracle(m=2, k=4, n_iters=1, n_queries=3, topk=5)


@register("similarity_pq_topk", oracle=PQ_ORACLE)
def similarity_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (Jégou et al., TPAMI 2011): 2 subspaces
    × 4-code codebooks (deterministic Lloyd), vectors compressed to one
    code per subspace, queries answered via a broadcast
    (query, subspace, code) partial-distance LUT summed per vector —
    the corpus is never decompressed and never shuffled. The oracle
    replays codebook training, encoding, and the ADC ranking as one
    unrolled recurrence."""
    from gcs2postgres_spark.operators.similarity import pq_adc_topk

    emb = _t(spark, sf_dir, "embeddings")
    return pq_adc_topk(emb, m_subspaces=2, k_codes=4, n_iters=1, n_queries=3, topk=5)


# Frame sampling + resize planning replayed in pure arithmetic: n_frames,
# width, height are deterministic functions of doc_id (the video-ish
# metadata below), the sampled-frame count/last index are integer
# ceil/floor over n_frames, and the resize clamp is least(1, 256/max(w,h))
# evaluated identically on both engines.
MULTIMODAL_FRAMES_ORACLE = """
WITH m AS (
  SELECT doc_id,
         CAST((doc_id * 37 + 11) % 512 + 32 AS INT) AS w,
         CAST((doc_id * 53 + 7) % 512 + 32 AS INT) AS h,
         CAST((doc_id * 17 + 3) % 91 + 30 AS INT) AS nf
  FROM documents
)
SELECT doc_id,
       CAST(nf AS INT) AS n_frames,
       CAST(floor((nf - 1) / 10) + 1 AS BIGINT) AS n_sampled,
       CAST(floor((nf - 1) / 10) * 10 AS BIGINT) AS last_frame,
       CAST(round(w * least(1.0, 256.0 / greatest(w, h))) AS INT) AS resized_w,
       CAST(round(h * least(1.0, 256.0 / greatest(w, h))) AS INT) AS resized_h
FROM m
ORDER BY doc_id
"""


@register("multimodal_frame_sample", oracle=MULTIMODAL_FRAMES_ORACLE)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-column planning pipeline: frame-index explosion (every 10th
    frame, operators/multimodal.sample_frames) + aspect-preserving resize
    planning (resize_metadata), aggregated back per document. Metadata is
    deterministic arithmetic over doc_id so the SQL oracle replays the
    whole explode→resize→re-aggregate pipeline value-for-value. The
    explode is the at-scale shape for video: frames become rows BEFORE
    any payload decode, so downstream batch operators parallelize over
    frames, not videos — payloads stay untouched until an Arrow-batched
    decode consumes the sampled subset."""
    from gcs2postgres_spark.operators.multimodal import (
        resize_metadata,
        sample_frames,
    )

    # unbounded per-doc frame explosion — widen a compact corpus scan
    # first (guide §2.5; flagged by the r18 widen-guard sweep)
    d = widen_doc_scan(_t(spark, sf_dir, "documents"), "doc_id")
    rec = d.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            F.lit("video").alias("media_type"),
            (F.pmod(F.col("doc_id") * 37 + 11, F.lit(512)) + 32).cast("int").alias("width"),
            (F.pmod(F.col("doc_id") * 53 + 7, F.lit(512)) + 32).cast("int").alias("height"),
            (F.pmod(F.col("doc_id") * 17 + 3, F.lit(91)) + 30).cast("int").alias("n_frames"),
            F.lit(0).cast("int").alias("sample_rate"),
        ).alias("media_meta"),
    )
    sampled = resize_metadata(sample_frames(rec, every_n=10), max_side=256)
    return (
        sampled.groupBy("doc_id")
        .agg(
            F.first(F.col("media_meta.n_frames")).alias("n_frames"),
            F.count(F.lit(1)).cast("long").alias("n_sampled"),
            F.max("frame_idx").cast("long").alias("last_frame"),
            F.first(F.col("resized.width")).alias("resized_w"),
            F.first(F.col("resized.height")).alias("resized_h"),
        )
        .orderBy("doc_id")
    )


# The sample formula is pure integer arithmetic over (doc_id, k), so the
# oracle replays synth→(encode→parse roundtrip)→features end-to-end:
# equal values prove the REAL RIFF/WAVE encoder and the independent
# chunk-walk parser agree bit-for-bit on every payload.
WAV_ENERGY_ORACLE = """
WITH d AS (
  SELECT doc_id, 32 + doc_id % 33 AS n FROM documents WHERE doc_id < 200
), s AS (
  SELECT doc_id, n, unnest(range(n)) AS k FROM d
), v AS (
  SELECT doc_id, n, ((doc_id * 7919 + k * 104729) % 65536) - 32768 AS smp FROM s
)
SELECT doc_id,
       CAST(max(n) AS BIGINT) AS n_samples,
       round(sqrt(sum(smp * smp) * 1.0 / max(n)), 6) AS rms,
       CAST(max(abs(smp)) AS BIGINT) AS peak
FROM v GROUP BY doc_id ORDER BY doc_id
"""


@register("multimodal_wav_energy", oracle=WAV_ENERGY_ORACLE)
def multimodal_wav_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-column feature extraction through the REAL codecs: each doc
    synthesizes a deterministic PCM16 sample vector, encodes it to RIFF/
    WAVE bytes (functions/media_codecs.encode_wav_pcm16), parses those
    bytes back with the independent chunk-walk parser (decode_wav — not
    the stdlib reader), and emits RMS energy + peak amplitude — all
    inside ONE Arrow-batched mapInPandas stage, the at-scale shape for
    binary media columns (payloads never leave the executors; batch
    memory bounded by arrow.maxRecordsPerBatch). The UDF is
    factory-nested so cloudpickle ships it by value (workers need no
    repo on sys.path). doc_id < 200 bounds the demo payload count, not
    the operator."""
    import math as _math

    import pandas as _pd

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200).select("doc_id")

    def _make_stage():
        # ship the codec MODULE by value: decode_wav/encode_wav_pcm16 are
        # module-level (importable qualnames), which cloudpickle would
        # serialize by reference — and executor Python workers don't share
        # the driver's sys.path hack when the harness runs from another
        # cwd (the multimodal gotcha, see operators/multimodal._make_decoder)
        from pyspark import cloudpickle as _cp

        from gcs2postgres_spark.functions import media_codecs as _mc

        _cp.register_pickle_by_value(_mc)
        decode_wav, encode_wav_pcm16 = _mc.decode_wav, _mc.encode_wav_pcm16

        def stage(batches):
            for pdf in batches:
                out = {"doc_id": [], "n_samples": [], "rms": [], "peak": []}
                for doc_id in pdf["doc_id"]:
                    doc_id = int(doc_id)
                    n = 32 + doc_id % 33
                    samples = [
                        ((doc_id * 7919 + k * 104729) % 65536) - 32768
                        for k in range(n)
                    ]
                    payload = encode_wav_pcm16(samples, sample_rate=8000)
                    dec = decode_wav(payload)
                    s = dec["samples"]
                    out["doc_id"].append(doc_id)
                    out["n_samples"].append(dec["n_samples"])
                    out["rms"].append(
                        round(_math.sqrt(sum(x * x for x in s) * 1.0 / len(s)), 6)
                    )
                    out["peak"].append(max(abs(x) for x in s))
                yield _pd.DataFrame(out)

        return stage

    return (
        d.mapInPandas(
            _make_stage(),
            schema="doc_id bigint, n_samples bigint, rms double, peak bigint",
        )
        .orderBy("doc_id")
    )


# Three unrolled matrix-free power iterations; the oracle replays the
# identical recurrence with list_dot_product over MATERIALIZED CTEs.
PCA_POWER_ORACLE = """
WITH e AS MATERIALIZED (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
  FROM embeddings
), v0 AS (SELECT list_transform(range(64), x -> 0.125) AS v),
jj AS (SELECT unnest(range(64)) AS j),
s1 AS (SELECT emb, list_dot_product(emb, v) AS s FROM e CROSS JOIN v0),
w1 AS (SELECT j, sum(s * emb[j + 1]) AS w FROM s1 CROSS JOIN jj GROUP BY j),
n1 AS (SELECT sqrt(sum(w * w)) AS nrm FROM w1),
v1 AS (SELECT list(w / nrm ORDER BY j) AS v FROM w1 CROSS JOIN n1),
s2 AS (SELECT emb, list_dot_product(emb, v) AS s FROM e CROSS JOIN v1),
w2 AS (SELECT j, sum(s * emb[j + 1]) AS w FROM s2 CROSS JOIN jj GROUP BY j),
n2 AS (SELECT sqrt(sum(w * w)) AS nrm FROM w2),
v2 AS (SELECT list(w / nrm ORDER BY j) AS v FROM w2 CROSS JOIN n2),
s3 AS (SELECT emb, list_dot_product(emb, v) AS s FROM e CROSS JOIN v2),
w3 AS (SELECT j, sum(s * emb[j + 1]) AS w FROM s3 CROSS JOIN jj GROUP BY j),
n3 AS (SELECT sqrt(sum(w * w)) AS nrm FROM w3),
v3 AS (SELECT list(w / nrm ORDER BY j) AS v FROM w3 CROSS JOIN n3),
ray AS (
  SELECT sum(list_dot_product(emb, v) * list_dot_product(emb, v)) AS eig
  FROM e CROSS JOIN v3
)
SELECT j, round(v[j + 1], 6) AS loading, round(ray.eig, 3) AS eigval
FROM v3 CROSS JOIN jj CROSS JOIN ray
ORDER BY j
"""


@register("embedding_pca_power", oracle=PCA_POWER_ORACLE)
def embedding_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the (uncentered) embedding Gram matrix
    by THREE matrix-free power iterations — the spectral step behind
    PCA whitening, spectral dedup, and anisotropy diagnostics, computed
    without ever materializing the d×d Gram: each round is s_i = e_i·v
    (map-side, v is a 64-double broadcast), then the d-dimensional
    partial-sum aggregate w_j = Σ s_i·e_ij (posexplode → groupBy j with
    map-side combine: the shuffle carries |dims|×|partitions| partial
    rows, never |rows|×|dims|), then a normalize over the d-row frame.
    Per round: ONE data pass, one bounded shuffle — the shape that
    scales to billions of rows because only dimension-sized state ever
    aggregates. Deterministic init v0 = 1/√d; iteration count is a
    literal unroll the oracle replays; the Rayleigh quotient estimates
    the top eigenvalue."""
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .select(F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("e"))
        .localCheckpoint(eager=True)
    )
    D = 64

    def dot_with(vcol):
        return F.aggregate(
            F.zip_with(F.col("e"), vcol, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    v_frame = spark.range(1).select(
        F.array(*[F.lit(1.0 / 8.0)] * D).alias("v")
    )
    for _ in range(3):
        s = emb.crossJoin(F.broadcast(v_frame)).select(
            "e", dot_with(F.col("v")).alias("s")
        )
        w = (
            s.select(F.posexplode("e").alias("j", "ej"), "s")
            .groupBy("j")
            .agg(F.sum(F.col("s") * F.col("ej")).alias("w"))
        )
        nrm = w.agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))
        v_frame = (
            w.crossJoin(F.broadcast(nrm))
            .select(F.struct("j", (F.col("w") / F.col("nrm")).alias("val")).alias("p"))
            .agg(F.array_sort(F.collect_list("p")).alias("arr"))
            .select(F.expr("transform(arr, x -> x.val)").alias("v"))
            .localCheckpoint(eager=True)
        )
    ray = (
        emb.crossJoin(F.broadcast(v_frame))
        .select(dot_with(F.col("v")).alias("s"))
        .agg(F.round(F.sum(F.col("s") * F.col("s")), 3).alias("eigval"))
    )
    return (
        v_frame.select(F.posexplode("v").alias("j", "loading"))
        .crossJoin(F.broadcast(ray))
        .select("j", F.round("loading", 6).alias("loading"), "eigval")
        .orderBy("j")
    )


# Min-id-wins incremental dedup replayed exactly: exact tier = raw text
# equality vs the corpus; near tier = token Jaccard >= 3/5 vs ANY
# lower-id doc (corpus ∪ earlier batch), threshold in exact integer
# arithmetic.
INCREMENTAL_DEDUP_ORACLE = """
WITH d AS MATERIALIZED (
  SELECT doc_id, text FROM documents WHERE doc_id < 1000
), batch AS (SELECT doc_id, text FROM d WHERE doc_id >= 400),
corpus AS (SELECT doc_id, text FROM d WHERE doc_id < 400),
exact AS (
  SELECT b.doc_id, min(c.doc_id) AS exact_of
  FROM batch b JOIN corpus c ON b.text = c.text
  GROUP BY b.doc_id
), toks AS MATERIALIZED (
  SELECT doc_id,
         unnest(list_distinct(string_split_regex(lower(trim(text)), '\\s+'))) AS tok
  FROM d
), sizes AS (SELECT doc_id, count(*) AS n FROM toks GROUP BY 1),
inter AS (
  SELECT o.doc_id AS id_o, b.doc_id AS id_b, count(*) AS ni
  FROM toks o JOIN toks b ON o.tok = b.tok AND o.doc_id < b.doc_id
  WHERE b.doc_id >= 400
  GROUP BY 1, 2
), near AS (
  SELECT id_b AS doc_id, min(id_o) AS near_of
  FROM inter
  JOIN sizes so ON id_o = so.doc_id
  JOIN sizes sb ON id_b = sb.doc_id
  WHERE 5 * ni >= 3 * (so.n + sb.n - ni)
  GROUP BY id_b
)
SELECT b.doc_id,
       CASE WHEN e.exact_of IS NOT NULL THEN 'drop_exact'
            WHEN n.near_of IS NOT NULL THEN 'drop_near'
            ELSE 'keep' END AS verdict,
       coalesce(e.exact_of, n.near_of) AS dup_of
FROM batch b
LEFT JOIN exact e ON b.doc_id = e.doc_id
LEFT JOIN near n ON b.doc_id = n.doc_id
ORDER BY b.doc_id
"""


@register("dedup_incremental_batch", oracle=INCREMENTAL_DEDUP_ORACLE)
def dedup_incremental_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL dedup — the production shape: a new batch (doc_id ≥
    400) arrives against an already-deduped corpus (doc_id < 400), and
    only the batch needs verdicts. Tier 1: exact raw-text match against
    the corpus (hash join). Tier 2: token-set Jaccard ≥ 3/5 against any
    LOWER-id doc (corpus ∪ earlier batch — min-id-wins, so verdicts are
    order-free and deterministic). Candidates come from the inverted
    token index restricted to batch ids on the probe side, so corpus×
    corpus pairs are never generated — the incremental property that
    makes re-dedup affordable: per batch the work is
    O(batch × matching-postings), not O(corpus²). At 100 TB the
    candidate stage composes with prefix filtering
    (operators/dedup.prefix_jaccard_pairs) unchanged. The id caps bound
    the demo corpus, not the operator."""
    d = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 1000)
        .select("doc_id", "text")
    )
    batch = d.filter(F.col("doc_id") >= 400)
    corpus = d.filter(F.col("doc_id") < 400)
    exact = (
        batch.alias("b")
        .join(corpus.alias("c"), F.col("b.text") == F.col("c.text"))
        .groupBy(F.col("b.doc_id").alias("doc_id"))
        .agg(F.min("c.doc_id").alias("exact_of"))
    )
    toks = d.select(
        "doc_id",
        F.explode(
            F.array_distinct(F.split(F.lower(F.trim(F.col("text"))), r"\s+"))
        ).alias("tok"),
    )
    sizes = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    inter = (
        toks.alias("o")
        .join(
            toks.alias("b"),
            (F.col("o.tok") == F.col("b.tok"))
            & (F.col("o.doc_id") < F.col("b.doc_id")),
        )
        .filter(F.col("b.doc_id") >= 400)
        .groupBy(
            F.col("o.doc_id").alias("id_o"), F.col("b.doc_id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("ni"))
    )
    so = sizes.select(F.col("doc_id").alias("id_o"), F.col("n").alias("n_o"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n").alias("n_b"))
    near = (
        inter.join(so, "id_o")
        .join(sb, "id_b")
        .filter(
            5 * F.col("ni") >= 3 * (F.col("n_o") + F.col("n_b") - F.col("ni"))
        )
        .groupBy(F.col("id_b").alias("doc_id"))
        .agg(F.min("id_o").alias("near_of"))
    )
    verdict = (
        F.when(F.col("exact_of").isNotNull(), "drop_exact")
        .when(F.col("near_of").isNotNull(), "drop_near")
        .otherwise("keep")
    )
    return (
        batch.select("doc_id")
        .join(exact, "doc_id", "left")
        .join(near, "doc_id", "left")
        .select(
            "doc_id",
            verdict.alias("verdict"),
            F.coalesce("exact_of", "near_of").alias("dup_of"),
        )
        .orderBy("doc_id")
    )


# Register-level-portable HyperLogLog: the md5-derived 60-bit hash, the
# top-8-bit register index, the leading-zero rank via bin()-string
# length, the bias constant, and the small-range correction are all
# computed by the IDENTICAL closed formulas on both engines, so the
# oracle matches the ESTIMATE itself, not just the exact count — and the
# merged (two half-sketch max) estimate must equal the direct one
# bit-for-bit, certifying the sketch's merge property.
HLL_PORTABLE_ORACLE = """
WITH h AS (
  SELECT DISTINCT ('0x' || substr(md5('hll1|' || CAST(o_custkey AS VARCHAR)), 1, 15))::BIGINT AS h,
         o_custkey % 2 AS half
  FROM orders
), rr AS (
  SELECT h >> 52 AS idx,
         CASE WHEN (h & 4503599627370495) = 0 THEN 53
              ELSE 53 - length(bin(h & 4503599627370495)) END AS rho,
         half
  FROM h
), direct AS (
  SELECT idx, max(rho) AS m FROM rr GROUP BY idx
), halves AS (
  SELECT half, idx, max(rho) AS m FROM rr GROUP BY half, idx
), merged AS (
  SELECT idx, max(m) AS m FROM halves GROUP BY idx
), est_d AS (
  SELECT count(*) AS n_filled,
         sum(pow(2.0, -m)) + (256 - count(*)) AS z,
         256 - count(*) AS v
  FROM direct
), est_m AS (
  SELECT sum(pow(2.0, -m)) + (256 - count(*)) AS z, 256 - count(*) AS v
  FROM merged
), ex AS (SELECT count(DISTINCT o_custkey) AS exact FROM orders),
calc AS (
  SELECT ex.exact, est_d.n_filled,
         CASE WHEN (0.7213 / (1 + 1.079 / 256)) * 256 * 256 / est_d.z <= 2.5 * 256
                   AND est_d.v > 0
              THEN 256 * ln(256.0 / est_d.v)
              ELSE (0.7213 / (1 + 1.079 / 256)) * 256 * 256 / est_d.z END AS est,
         CASE WHEN (0.7213 / (1 + 1.079 / 256)) * 256 * 256 / est_m.z <= 2.5 * 256
                   AND est_m.v > 0
              THEN 256 * ln(256.0 / est_m.v)
              ELSE (0.7213 / (1 + 1.079 / 256)) * 256 * 256 / est_m.z END AS est_merged
  FROM est_d CROSS JOIN est_m CROSS JOIN ex
)
SELECT CAST(exact AS BIGINT) AS exact_distinct,
       CAST(n_filled AS BIGINT) AS n_registers_filled,
       round(est, 4) AS hll_estimate,
       round(est_merged, 4) AS hll_estimate_merged,
       round(abs(est - exact) / exact, 6) AS rel_err
FROM calc
"""


@register("agg_hll_portable", oracle=HLL_PORTABLE_ORACLE)
def agg_hll_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-engine-portable HyperLogLog (m=256 dense registers) over
    order custkeys — unlike approx_count_distinct (whose HLL++ sketch is
    Spark-internal), every stage here is engine-independent closed-form
    arithmetic: portable 60-bit md5 hash → top-8-bit register index →
    leading-zero rank (via the bin()-string length both engines define
    identically) → max per register → bias-corrected harmonic estimate
    with the standard small-range correction. The output certifies BOTH
    the estimate value against DuckDB running the same formulas AND the
    sketch's merge law: registers built on the two custkey-parity halves
    and max-merged must reproduce the direct estimate exactly. Scale
    shape: one groupBy over ≤256 register rows with map-side partial
    max — the sketch any 100 TB distinct-count rollup ships between
    stages instead of raw keys."""
    o = _t(spark, sf_dir, "orders")
    from gcs2postgres_spark.operators.dedup import portable_hash60

    h = o.select(
        portable_hash60(
            F.concat(F.lit("hll1|"), F.col("o_custkey").cast("string"))
        ).alias("h"),
        (F.col("o_custkey") % 2).alias("half"),
    ).distinct()
    rem = F.col("h").bitwiseAND(F.lit((1 << 52) - 1))
    rr = h.select(
        F.shiftright("h", 52).alias("idx"),
        F.when(rem == 0, 53).otherwise(53 - F.length(F.bin(rem))).alias("rho"),
        "half",
    )
    direct = rr.groupBy("idx").agg(F.max("rho").alias("m"))
    halves = rr.groupBy("half", "idx").agg(F.max("rho").alias("m"))
    merged = halves.groupBy("idx").agg(F.max("m").alias("m"))

    def est_frame(regs: DataFrame, z_col: str, v_col: str) -> DataFrame:
        return regs.agg(
            F.count(F.lit(1)).alias("n_filled"),
            (F.sum(F.pow(2.0, -F.col("m"))) + (256 - F.count(F.lit(1)))).alias(z_col),
            (256 - F.count(F.lit(1))).alias(v_col),
        )

    alpha_mm = F.lit(0.7213 / (1 + 1.079 / 256) * 256 * 256)

    def estimate(z, v):
        raw = alpha_mm / z
        return F.when((raw <= 2.5 * 256) & (v > 0), 256 * F.log(256.0 / v)).otherwise(raw)

    ed = est_frame(direct, "z", "v")
    em = est_frame(merged, "zm", "vm").select("zm", "vm")
    ex = o.agg(F.count_distinct("o_custkey").alias("exact"))
    c = ed.crossJoin(em).crossJoin(ex)
    est = estimate(F.col("z"), F.col("v"))
    est_m = estimate(F.col("zm"), F.col("vm"))
    return c.select(
        F.col("exact").cast("long").alias("exact_distinct"),
        F.col("n_filled").cast("long").alias("n_registers_filled"),
        F.round(est, 4).alias("hll_estimate"),
        F.round(est_m, 4).alias("hll_estimate_merged"),
        F.round(F.abs(est - F.col("exact")) / F.col("exact"), 6).alias("rel_err"),
    )


# Positives = the PPJoin-complete Jaccard >= 3/5 pairs; negatives = a
# deterministic LCG jump over the doc-id space (engine-independent
# integer arithmetic; collision with the anchor advances by one). The
# oracle replays both.
CONTRASTIVE_ORACLE = """
WITH toks AS MATERIALIZED (
  SELECT doc_id,
         unnest(list_distinct(string_split_regex(lower(trim(text)), '\\s+'))) AS tok
  FROM documents WHERE doc_id < 1000
), sizes AS MATERIALIZED (
  SELECT doc_id, count(*) AS n FROM toks GROUP BY 1
), inter AS MATERIALIZED (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS ni
  FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), pos AS MATERIALIZED (
  SELECT id_a AS anchor, id_b AS positive,
         round(CAST(ni AS DOUBLE) / (sa.n + sb.n - ni), 6) AS pos_jaccard
  FROM inter
  JOIN sizes sa ON id_a = sa.doc_id
  JOIN sizes sb ON id_b = sb.doc_id
  WHERE 5 * ni >= 3 * (sa.n + sb.n - ni)
), nd AS (
  SELECT count(*) AS n_docs FROM documents WHERE doc_id < 1000
), raw AS (
  SELECT p.*, (p.anchor * 48271 + 11) % nd.n_docs AS neg0, nd.n_docs
  FROM pos p CROSS JOIN nd
)
SELECT anchor, positive,
       CAST(CASE WHEN neg0 = anchor OR neg0 = positive
                 THEN (neg0 + 1) % n_docs ELSE neg0 END AS BIGINT) AS negative,
       pos_jaccard
FROM raw
ORDER BY anchor, positive
"""


@register("contrastive_pairs_mine", oracle=CONTRASTIVE_ORACLE)
def contrastive_pairs_mine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive training-pair mining — the (anchor, positive,
    negative) triples an embedding-model pipeline materializes: positives
    are the near-duplicate pairs the prefix-filtered Jaccard join
    certifies COMPLETE at threshold 3/5 (operators/dedup.
    prefix_jaccard_pairs — so no qualifying positive is ever missed),
    negatives are a deterministic LCG jump over the doc-id space
    (standard practice: random negatives are overwhelmingly true
    negatives; the rare hard-negative collision is advanced past the
    anchor/positive ids so the triple is always well-formed). All
    integer arithmetic — engine-independent, fully oracle-replayed. At
    corpus scale the positive mining is the prefix-filter inverted-index
    shape and negative assignment is one map-side expression against a
    broadcast scalar count."""
    from gcs2postgres_spark.operators.dedup import prefix_jaccard_pairs

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    pos = prefix_jaccard_pairs(docs, "doc_id", "text", 3, 5).select(
        F.col("id_a").alias("anchor"),
        F.col("id_b").alias("positive"),
        F.col("jaccard").alias("pos_jaccard"),
    )
    nd = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    raw = pos.crossJoin(F.broadcast(nd)).withColumn(
        "neg0", (F.col("anchor") * 48271 + 11) % F.col("n_docs")
    )
    neg = F.when(
        (F.col("neg0") == F.col("anchor")) | (F.col("neg0") == F.col("positive")),
        (F.col("neg0") + 1) % F.col("n_docs"),
    ).otherwise(F.col("neg0"))
    return (
        raw.select(
            "anchor",
            "positive",
            neg.cast("long").alias("negative"),
            "pos_jaccard",
        )
        .orderBy("anchor", "positive")
    )


# ---------------------------------------------------------------------------
# Image near-dup via perceptual average-hash over REAL PNG bytes
# ---------------------------------------------------------------------------

IMAGE_AHASH_ORACLE = """
WITH ids AS (
  SELECT doc_id FROM documents WHERE doc_id < 500
), px AS (
  SELECT ids.doc_id, u.k,
         (7 * (ids.doc_id % 200) + 13 * u.k) % 256 AS p
  FROM ids, unnest(range(0, 64)) AS u(k)
), tot AS (
  SELECT doc_id, SUM(p) AS total FROM px GROUP BY 1
), bits AS (
  SELECT px.doc_id,
         string_agg(CASE WHEN 64 * px.p > t.total THEN '1' ELSE '0' END,
                    '' ORDER BY px.k) AS ahash
  FROM px JOIN tot t USING (doc_id) GROUP BY px.doc_id
), groups AS (
  SELECT ahash, count(*) AS group_size FROM bits GROUP BY 1
)
SELECT CAST(group_size AS BIGINT) AS group_size,
       CAST(count(*) AS BIGINT) AS n_groups,
       min(ahash) AS sample_hash
FROM groups GROUP BY 1 ORDER BY group_size
"""


@register("multimodal_image_ahash_dedup", oracle=IMAGE_AHASH_ORACLE)
def multimodal_image_ahash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-duplicate detection through REAL image bytes: each
    doc gets an 8×8 grayscale PNG (closed-form pixels, planted
    duplicates at doc_id % 200) ENCODED on executors by the stdlib
    PNG writer, decoded back by the INDEPENDENT full-filter-spec
    parser, perceptual-average-hashed (bit k = 64·p(k) > Σp, exact
    integers), and bucketed by hash — the image twin of SimHash text
    dedup. The oracle replays the pixel arithmetic symbolically, so a
    value match certifies the encoder, the decoder, AND the hash
    bit-for-bit (a single filter-spec or bit-order bug flips
    sample_hash).

    Scale shape: encode and decode+hash are two Arrow-batched
    mapInPandas passes (constant per-row work); dedup bucketing is a
    plain hash-keyed aggregation — no pairwise comparison ever runs
    (cf. operators/dedup.simhash).
    """
    from gcs2postgres_spark.operators.multimodal import (
        attach_pattern_png,
        image_ahash,
    )

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    hashed = image_ahash(attach_pattern_png(d, key_mod=200, side=8))
    groups = hashed.groupBy("ahash").agg(F.count(F.lit(1)).alias("group_size"))
    return (
        groups.groupBy("group_size")
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.min("ahash").alias("sample_hash"),
        )
        .orderBy("group_size")
    )


# ---------------------------------------------------------------------------
# Directed containment near-dup (excerpt/boilerplate detection)
# ---------------------------------------------------------------------------

CONTAINMENT_ORACLE = """
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
  FROM documents WHERE doc_id < 300
), uniq AS (
  SELECT doc_id, unnest(
    CASE WHEN len(t) >= 3 THEN
      list_distinct(list_transform(range(1, len(t) - 1),
                                   i -> array_to_string(t[i:i+2], ' ')))
    ELSE [array_to_string(t, ' ')] END) AS tok
  FROM toks
), sizes AS (
  SELECT doc_id, count(*) AS n FROM uniq GROUP BY 1
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
  FROM uniq a JOIN uniq b ON a.tok = b.tok AND a.doc_id <> b.doc_id
  GROUP BY 1, 2
)
SELECT i.id_a, i.id_b,
       CAST(s.n AS BIGINT) AS n_a,
       CAST(i.n_inter AS BIGINT) AS n_inter,
       round(i.n_inter / CAST(s.n AS DOUBLE), 6) AS containment
FROM inter i JOIN sizes s ON i.id_a = s.doc_id
WHERE i.n_inter * 5 >= s.n * 2
ORDER BY id_a, id_b
"""


@register("dedup_containment_pairs", oracle=CONTAINMENT_ORACLE)
def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed containment near-dup over TRIGRAM shingles at
    C(A→B) = |A∩B|/|A| ≥ 2/5 — catches a small doc swallowed inside a
    larger one (excerpts, quoted boilerplate), which symmetric Jaccard
    under-scores by |B|'s size. Trigram shingles, not unigram tokens:
    the synthetic corpus shares one tiny vocabulary, so unigram SETS
    contain each other vacuously (measured 8.6k pairs at C=1.0);
    order-sensitive shingles restore discrimination (14 pairs at 2/5).
    Exact-rational threshold (5·inter ≥ 2·|A|), directed output. The
    doc_id < 300 cap bounds the all-pairs oracle shape; the operator
    composes with MinHash banding for corpus scale
    (operators/dedup.containment_pairs)."""
    from gcs2postgres_spark.operators.dedup import containment_pairs

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    return containment_pairs(
        d, "doc_id", "text", threshold_num=2, threshold_den=5, shingle_n=3
    ).orderBy("id_a", "id_b")


# ---------------------------------------------------------------------------
# Audio near-dup via frame-energy fingerprint over REAL WAV bytes
# ---------------------------------------------------------------------------

AUDIO_FP_ORACLE = """
WITH ids AS (
  SELECT doc_id, doc_id % 150 AS key FROM documents WHERE doc_id < 500
), samp AS (
  SELECT ids.doc_id, u.k,
         abs(((ids.key * 7919 + u.k * 104729) % 65536) - 32768) AS a
  FROM ids, unnest(range(0, 64)) AS u(k)
), frames AS (
  SELECT doc_id, CAST(k // 8 AS INT) AS f, SUM(a) AS fsum
  FROM samp GROUP BY 1, 2
), tot AS (
  SELECT doc_id, SUM(fsum) AS total FROM frames GROUP BY 1
), sig AS (
  SELECT fr.doc_id,
         string_agg(CASE WHEN 8 * fr.fsum > t.total THEN '1' ELSE '0' END,
                    '' ORDER BY fr.f) AS fp
  FROM frames fr JOIN tot t USING (doc_id) GROUP BY fr.doc_id
), groups AS (
  SELECT fp, count(*) AS group_size FROM sig GROUP BY 1
)
SELECT CAST(group_size AS BIGINT) AS group_size,
       CAST(count(*) AS BIGINT) AS n_groups,
       min(fp) AS sample_fp
FROM groups GROUP BY 1 ORDER BY group_size
"""


@register("multimodal_audio_fp_dedup", oracle=AUDIO_FP_ORACLE)
def multimodal_audio_fp_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-duplicate detection through REAL audio bytes —
    completes the multimodal dedup triangle (text SimHash, image
    aHash, audio fingerprint): each doc synthesizes a deterministic
    64-sample PCM16 signal (planted duplicates at doc_id % 150),
    ENCODES it to RIFF/WAVE on executors (encode_wav_pcm16), parses
    the bytes back with the independent chunk-walk decoder, and
    fingerprints by frame energy — 8 frames of 8 samples, bit f = 1
    iff 8·Σ|frame f| > Σ|all| (exact integers, no float mean) — then
    buckets by fingerprint. The oracle replays the sample arithmetic
    symbolically, so a value match certifies encoder, decoder, and
    fingerprint bit-for-bit.

    Scale shape: encode→decode→fingerprint is ONE Arrow-batched
    mapInPandas pass (payloads never leave executors); bucketing is a
    plain keyed aggregation — no pairwise comparison.
    """
    import pandas as _pd

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 500).select("doc_id")

    def _make_stage():
        from pyspark import cloudpickle as _cp

        from gcs2postgres_spark.functions import media_codecs as _mc

        _cp.register_pickle_by_value(_mc)
        decode_wav, encode_wav = _mc.decode_wav, _mc.encode_wav_pcm16

        def stage(batches):
            for pdf in batches:
                out = {"doc_id": [], "fp": []}
                for doc_id in pdf["doc_id"]:
                    doc_id = int(doc_id)
                    key = doc_id % 150
                    samples = [
                        ((key * 7919 + k * 104729) % 65536) - 32768
                        for k in range(64)
                    ]
                    wav = encode_wav(samples)          # real RIFF bytes
                    parsed = decode_wav(wav)["samples"]  # independent parse
                    a = [abs(s) for s in parsed]
                    fsums = [sum(a[f * 8 : (f + 1) * 8]) for f in range(8)]
                    total = sum(fsums)
                    fp = "".join(
                        "1" if 8 * fs > total else "0" for fs in fsums
                    )
                    out["doc_id"].append(doc_id)
                    out["fp"].append(fp)
                yield _pd.DataFrame(out)

        return stage

    sig = d.mapInPandas(_make_stage(), schema="doc_id long, fp string")
    groups = sig.groupBy("fp").agg(F.count(F.lit(1)).alias("group_size"))
    return (
        groups.groupBy("group_size")
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.min("fp").alias("sample_fp"),
        )
        .orderBy("group_size")
    )


def _pii_oracle_sql() -> str:
    from gcs2postgres_spark.functions.text import pii_redact_sql

    seed = (
        "text || ' contact u' || CAST(doc_id AS VARCHAR) || '@ex' || "
        "CAST(doc_id % 10 AS VARCHAR) || '.com' || "
        "' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.' || "
        "CAST((doc_id * 7) % 256 AS VARCHAR) || "
        "CASE WHEN doc_id % 3 = 0 THEN ' ssn 123-45-' || "
        "lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END"
    )
    return f"""
WITH seeded AS (SELECT lang, {seed} AS pii_text FROM documents),
red AS (SELECT lang, {pii_redact_sql('pii_text')} AS red FROM seeded)
SELECT lang,
       count(*) AS n_docs,
       CAST(sum((length(red) - length(replace(red, '<EMAIL>', ''))) / 7) AS BIGINT) AS emails,
       CAST(sum((length(red) - length(replace(red, '<IP>', ''))) / 4) AS BIGINT) AS ips,
       CAST(sum((length(red) - length(replace(red, '<SSN>', ''))) / 5) AS BIGINT) AS ssns,
       CAST(sum(length(red)) AS BIGINT) AS n_chars
FROM red
GROUP BY lang
ORDER BY lang
"""


@register("text_pii_redaction", oracle=_pii_oracle_sql())
def text_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub — the standard train-data redaction pass (emails,
    IPv4s, US SSNs/phones, card numbers → typed placeholders), as pure
    chained built-in regexp_replace (functions/text.py PII_PATTERNS —
    JVM-side, codegen'd, regexes inside the Java∩RE2 subset so the
    oracle runs the IDENTICAL chain). Deterministic PII is seeded from
    doc_id on BOTH sides, then redacted; per-language placeholder
    counts come from length arithmetic, so an unredacted email, a
    half-matched IP, or an over-eager pattern shifts a count or the
    char sum and breaks the hash."""
    from gcs2postgres_spark.functions.text import pii_redact
    from gcs2postgres_spark.operators.caching import widen_doc_scan

    docs = _t(spark, sf_dir, "documents")
    # parallelism guard (guide §2.5): the 5-pattern regexp_replace chain
    # over full text is this query's whole cost, and a compact corpus
    # scan runs it on 2 cores at sf1 (operators.caching.widen_doc_scan)
    docs = widen_doc_scan(docs, "doc_id")
    did = F.col("doc_id")
    seeded = docs.select(
        "lang",
        F.concat(
            F.col("text"),
            F.lit(" contact u"), did.cast("string"),
            F.lit("@ex"), (did % 10).cast("string"), F.lit(".com"),
            F.lit(" from 10."), (did % 256).cast("string"),
            F.lit(".0."), ((did * 7) % 256).cast("string"),
            F.when(
                did % 3 == 0,
                F.concat(
                    F.lit(" ssn 123-45-"),
                    F.lpad((did % 10000).cast("string"), 4, "0"),
                ),
            ).otherwise(F.lit("")),
        ).alias("pii_text"),
    )
    red = seeded.select("lang", pii_redact(F.col("pii_text")).alias("red"))

    def _count(tok: str) -> F.Column:
        return F.sum(
            (F.length("red") - F.length(F.replace(F.col("red"), F.lit(tok))))
            / len(tok)
        ).cast("long")

    return (
        red.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            _count("<EMAIL>").alias("emails"),
            _count("<IP>").alias("ips"),
            _count("<SSN>").alias("ssns"),
            F.sum(F.length("red")).cast("long").alias("n_chars"),
        )
        .orderBy("lang")
    )


SPAN_K = 10

EXACT_SUBSTRING_ORACLE = f"""
WITH toks AS (SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents),
idx AS (
  SELECT doc_id, lang, t,
         unnest(generate_series(1, len(t) - {SPAN_K} + 1)) AS i
  FROM toks),
wins AS (
  SELECT doc_id, lang,
         md5(array_to_string(t[CAST(i AS BIGINT):CAST(i + {SPAN_K} - 1 AS BIGINT)], ' ')) AS h
  FROM idx),
dup AS (SELECT h FROM wins GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
per_doc AS (
  SELECT doc_id, count(*) AS total,
         count(*) FILTER (h IN (SELECT h FROM dup)) AS dups
  FROM wins GROUP BY doc_id)
SELECT d.lang,
       count(*)                                       AS n_docs,
       CAST(coalesce(sum(p.total), 0) AS BIGINT)      AS total_spans,
       CAST(coalesce(sum(p.dups), 0) AS BIGINT)       AS dup_spans,
       CAST(sum(CASE WHEN coalesce(p.dups, 0) > 0 THEN 1 ELSE 0 END) AS BIGINT)
                                                      AS docs_with_dup
FROM documents d LEFT JOIN per_doc p USING (doc_id)
GROUP BY d.lang
ORDER BY d.lang
"""


@register("dedup_exact_substring", oracle=EXACT_SUBSTRING_ORACLE)
def dedup_exact_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring span dedup (the published recipe: k-token spans
    appearing verbatim in >= 2 documents are memorization hotspots that
    document-level near-dup misses). operators/dedup.duplicate_spans
    builds the windows JVM-side (split → transform/slice/md5 → explode
    — one codegen'd projection, ~one row per corpus token), detects
    duplicates with ONE groupBy on the span hash + a semi-join back —
    equi-join only, no cartesian (the suffix-array recipe's corpus-
    length bound, shuffled instead of sorted in-memory). The oracle
    replays the identical windows/hashes in SQL; per-language span and
    hot-document counts must match exactly."""
    from gcs2postgres_spark.operators.dedup import duplicate_spans

    docs = _t(spark, sf_dir, "documents")
    per_doc = duplicate_spans(docs, "doc_id", "text", k=SPAN_K, min_docs=2)
    return (
        docs.select("doc_id", "lang")
        .join(per_doc, "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.coalesce(F.sum("total_spans"), F.lit(0)).cast("long").alias("total_spans"),
            F.coalesce(F.sum("dup_spans"), F.lit(0)).cast("long").alias("dup_spans"),
            F.sum((F.coalesce(F.col("dup_spans"), F.lit(0)) > 0).cast("int"))
            .cast("long")
            .alias("docs_with_dup"),
        )
        .orderBy("lang")
    )
