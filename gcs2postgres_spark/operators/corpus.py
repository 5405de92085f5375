"""Corpus-statistics operators for LLM training-data prep: TF-IDF
term ranking, fixed-window document chunking, bigram language-model
counts, and BPE first-merge pair candidates.

These are the corpus-level passes a pretraining pipeline runs between
cleaning/dedup and tokenization — salient-term extraction for mixing
decisions, chunking long documents to the model's context window,
n-gram statistics for quality/perplexity heuristics, and the pair
frequencies a BPE tokenizer trainer starts from. (The reference
delegates any such analytics to BigQuery SQL — src/db/db.go:59 — so
this tier is the engine-layer capability SURVEY §2.8 requires, not a
port.)

Determinism: every op is a pure function of the data — no RNG, no
engine-specific hashing — so each has an exact DuckDB oracle in
queries/corpus_q.py. Floating outputs are rounded (6 dp) and every
top-k is ranked with a total order (value desc, then lexicographic) so
cross-engine ULP noise cannot reorder the cut.

Scale shapes (the 100 TB question for each):
- tfidf_top_terms: two aggregations (term-per-doc, doc-freq) + one
  window top-k per doc — three shuffles, all on high-cardinality keys
  (doc_id, term), map-side partials on; the corpus size N comes from a
  1-row broadcast cross join, never a global window.
- chunk_windows: pure map-side explode (split → sequence → slice) —
  zero shuffles; output rows ≈ tokens/stride per doc.
- bigram_counts: map-side zip_with over shifted token arrays (the
  linear pattern — nothing recomputes the split per element), explode,
  one partial-agg shuffle on the bigram key.
- bpe_pair_counts: word-frequency agg first (classic BPE trainer
  shape: pairs are counted over the DISTINCT-word table weighted by
  frequency, so per-pair work is O(vocab), not O(corpus)), then a
  char-pair explode and one more agg.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gcs2postgres_spark.operators.caching import maybe_persist, widen_doc_scan

TOKEN_SPLIT = r"\s+"


def _toks(text_col: str):
    return F.split(F.lower(F.trim(F.col(text_col))), TOKEN_SPLIT)


def tfidf_top_terms(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Top-k TF-IDF terms per document.

    tf = cnt/doc_len, idf = ln(N/df) (df = docs containing the term),
    score rounded to 6 dp BEFORE ranking so the rank order
    (score desc, term asc) is a total order immune to cross-engine ULP
    differences. Returns (doc_id, rank, term, tfidf).

    Scale: groupBy (doc_id, term) and groupBy term both partial-agg;
    N is a broadcast 1-row cross join (a global window would serialize
    on one partition). The final per-doc top-k is a window over doc_id
    — high cardinality, no skew concern."""
    # parallelism guard (guide §2.5): compact corpus scans yield fewer
    # partitions than cores; widen before the tokenize+explode
    docs = widen_doc_scan(docs, id_col)
    tf = (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(_toks(text_col)).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        # read by BOTH the df branch and the scored join-back — without
        # the persist each branch re-tokenizes the corpus (same
        # double-scan as bigram_perplexity; measured there 10.1→7.2 s).
        # Size-conditional persist (operators.caching): at sf0.1 the
        # cache build cost more than the saved re-tokenize.
    )
    tf = maybe_persist(tf)
    from pyspark.sql import Window

    w_doc = Window.partitionBy("doc_id")
    n_docs = docs.select(F.count(F.lit(1)).alias("n_docs"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.withColumn("doc_len", F.sum("cnt").over(w_doc))
        .join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                (F.col("cnt") / F.col("doc_len"))
                * F.log(F.col("n_docs").cast("double") / F.col("df")),
                6,
            ),
        )
    )
    w_rank = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= k)
        .select("doc_id", F.col("rank").cast("long").alias("rank"), "term", "tfidf")
    )


def chunk_windows(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 32,
    stride: int = 24,
) -> DataFrame:
    """Fixed-size token windows with overlap (context-window chunking).

    A document with n tokens yields ceil((n-size)/stride)+1 chunks
    (minimum 1); chunk i covers tokens [i*stride, i*stride+size). The
    final chunk may be short — it is emitted, not padded. Returns
    (doc_id, chunk_idx, start_tok, n_chunk_toks, chunk_hash) where
    chunk_hash = md5 of the space-joined chunk tokens, the portable
    content id downstream packing/dedup joins on.

    Scale: zero shuffles — split, sequence-explode, and slice are all
    map-side; slice references the PRE-COMPUTED token array column
    (no per-chunk re-split; see the HOF-inlining hazard note in
    operators/training.py)."""
    if stride <= 0 or size <= 0 or stride > size:
        raise ValueError(f"need 0 < stride <= size, got size={size} stride={stride}")
    # parallelism guard (guide §2.5, r17): the per-chunk md5 over the
    # slice is the heavy stage and otherwise runs at the compact scan's
    # width; the widen repartition is the only shuffle in the plan
    docs = widen_doc_scan(docs, id_col)
    with_toks = docs.select(
        F.col(id_col).alias("doc_id"), _toks(text_col).alias("toks")
    ).withColumn("n", F.size("toks"))
    n_chunks = F.when(F.col("n") <= size, F.lit(1).cast("long")).otherwise(
        F.ceil((F.col("n") - size) / F.lit(float(stride))).cast("long") + 1
    )
    chunks = with_toks.select(
        "doc_id",
        "toks",
        F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias("chunk_idx"),
    ).withColumn("start_tok", F.col("chunk_idx") * stride)
    chunk_toks = F.slice(F.col("toks"), F.col("start_tok") + 1, F.lit(size))
    return chunks.select(
        "doc_id",
        "chunk_idx",
        "start_tok",
        F.size(chunk_toks).cast("long").alias("n_chunk_toks"),
        F.md5(F.array_join(chunk_toks, " ")).alias("chunk_hash"),
    )


def bigram_counts(
    docs: DataFrame,
    text_col: str = "text",
    top_n: int = 20,
) -> DataFrame:
    """Corpus bigram counts with conditional probability — the n-gram
    LM statistic used for perplexity-ish quality heuristics and
    contamination fingerprints. Returns the top_n bigrams as
    (w1, w2, cnt, cond_p) where cond_p = P(w2|w1) = cnt / count(w1 as
    first word), ranked (cnt desc, w1, w2) — a total order, so the
    top-n cut is deterministic.

    Scale: bigrams come from zip_with over the token array and its
    shift — linear, the array is materialized once per row — then one
    partial-agg shuffle on (w1, w2); the w1 marginal is a window over
    w1 (skew bounded by the stopword-iest token; acceptable because the
    bigram table is already aggregated, rows = distinct bigrams not
    corpus tokens)."""
    toks = F.col("toks")
    n = F.size(toks)
    pairs = F.zip_with(
        F.slice(toks, 1, n - 1),
        F.slice(toks, 2, n - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    bigrams = (
        widen_doc_scan(docs, text_col)
        .select(_toks(text_col).alias("toks"))
        .filter(n >= 2)
        .select(F.explode(pairs).alias("p"))
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    from pyspark.sql import Window

    w1_total = Window.partitionBy("w1")
    return (
        bigrams.withColumn("cond_p", F.round(F.col("cnt") / F.sum("cnt").over(w1_total), 6))
        .orderBy(F.desc("cnt"), F.asc("w1"), F.asc("w2"))
        .limit(top_n)
    )


SYM_L = "\x01"  # sentinel wrapping each BPE symbol: \x01<sym>\x02
SYM_R = "\x02"


def bpe_train_merges(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 3,
) -> DataFrame:
    """Iterative BPE merge training: run ``n_merges`` rounds of the
    classic algorithm — count adjacent symbol pairs over the
    frequency-weighted vocabulary, pick the most frequent pair (ties
    broken lexicographically), merge it greedily left-to-right in every
    word, repeat. Returns the learned merge table
    (step, lhs, rhs, merged, pair_count) — the artifact a tokenizer
    trainer persists.

    Representation: each word's segmentation is a string of
    sentinel-wrapped symbols (``\\x01sym\\x02…``), so a merge is ONE
    non-regex ``replace`` of ``\\x01a\\x02\\x01b\\x02`` with
    ``\\x01ab\\x02`` — and because string replace scans left-to-right
    without rescanning its own output, it implements exactly the
    greedy non-overlapping merge semantics of a BPE trainer ("aaa" +
    merge(a,a) → ("aa","a")). The same replace exists in every SQL
    engine, which is what makes the whole recurrence replayable by a
    static DuckDB oracle (queries/corpus_q.py unrolls the rounds as
    CTEs with scalar subqueries picking each round's best pair).
    Requires tokens free of the \\x01/\\x02 sentinels (true of any
    whitespace-tokenized text).

    Scale: the corpus collapses to its frequency-weighted vocabulary
    FIRST (one shuffle), and every round is vocab-sized work: a
    map-side pair explode, one partial-agg shuffle, and a 1-row
    ``collect`` of the argmax (the unavoidable sequential dependency of
    BPE — each merge depends on the last; trainers at any scale run
    this loop on aggregated pair counts, never the corpus). The vocab
    frame is cached across rounds."""
    wf = (
        widen_doc_scan(docs, text_col)
        .select(F.explode(_toks(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wcnt"))
        .filter(F.length("word") >= 2)
    )
    cur = wf.select(
        "wcnt",
        F.regexp_replace(F.col("word"), "(.)", f"{SYM_L}$1{SYM_R}").alias("seg"),
    ).cache()
    merges = []
    for step in range(1, n_merges + 1):
        syms = F.split(
            F.expr(f"substring(seg, 2, length(seg) - 2)"), F.lit(SYM_R + SYM_L)
        )
        n = F.size(syms)
        pairs = F.zip_with(
            F.slice(syms, 1, n - 1),
            F.slice(syms, 2, n - 1),
            lambda a, b: F.struct(a.alias("a"), b.alias("b")),
        )
        best = (
            cur.select("wcnt", F.explode(pairs).alias("p"))
            .groupBy("p.a", "p.b")
            .agg(F.sum("wcnt").cast("long").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()[0]
        )
        merges.append((step, best["a"], best["b"], best["a"] + best["b"], best["cnt"]))
        nxt = cur.select(
            "wcnt",
            F.replace(
                F.col("seg"),
                F.lit(f"{SYM_L}{best['a']}{SYM_R}{SYM_L}{best['b']}{SYM_R}"),
                F.lit(f"{SYM_L}{best['a']}{best['b']}{SYM_R}"),
            ).alias("seg"),
        ).cache()
        cur.unpersist()
        cur = nxt
    cur.unpersist()
    spark = docs.sparkSession
    return spark.createDataFrame(
        merges, "step long, lhs string, rhs string, merged string, pair_count long"
    )


def _bpe_apply_merges(seg: Column, merges: list[tuple[str, str]]) -> Column:
    """Chain of ``n_merges`` greedy left-to-right string replaces over a
    sentinel-segmented word — the ENCODE half of BPE. Applying the
    trained merges in rank order with a non-rescanning replace is
    exactly the trainer's own update rule, so encode(word) equals the
    segmentation the trainer would have produced for that word. Pure
    JVM expressions (whole-stage codegen), no UDF."""
    for a, b in merges:
        seg = F.replace(
            seg,
            F.lit(f"{SYM_L}{a}{SYM_R}{SYM_L}{b}{SYM_R}"),
            F.lit(f"{SYM_L}{a}{b}{SYM_R}"),
        )
    return seg


def _merge_list(merges) -> list[tuple[str, str]]:
    """(lhs, rhs) pairs in rank order from a bpe_train_merges frame (a
    bounded n_merges-row collect — the merge table IS driver metadata,
    like any tokenizer's vocab file) or a pre-built list."""
    if isinstance(merges, DataFrame):
        return [
            (r["lhs"], r["rhs"]) for r in merges.orderBy("step").collect()
        ]
    return [(a, b) for a, b in merges]


def bpe_encode_vocab(
    docs: DataFrame,
    merges,
    text_col: str = "text",
) -> DataFrame:
    """Encode each DISTINCT word once under a trained merge table — the
    standard tokenizer encoder cache (vocab-sized work, never
    corpus-sized): (word, wcnt, seg, n_tokens) where ``seg`` is the
    sentinel-segmented BPE tokenization and ``n_tokens`` its symbol
    count. Unlike training (which learns from length>=2 words), encode
    covers EVERY word — single-char words are one token."""
    vocab = (
        widen_doc_scan(docs, text_col)
        .select(F.explode(_toks(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wcnt"))
    )
    seg = _bpe_apply_merges(
        F.regexp_replace(F.col("word"), "(.)", f"{SYM_L}$1{SYM_R}"),
        _merge_list(merges),
    )
    return vocab.select(
        "word",
        "wcnt",
        seg.alias("seg"),
        (
            F.length(seg)
            - F.length(F.replace(seg, F.lit(SYM_L), F.lit("")))
        ).cast("long").alias("n_tokens"),
    )


def bpe_token_histogram(
    docs: DataFrame,
    merges,
    text_col: str = "text",
    top_n: int = 20,
) -> DataFrame:
    """Corpus token histogram under a TRAINED merge table: the top-N
    BPE tokens by frequency-weighted occurrence count — what a
    tokenizer-vocabulary audit reads. Explodes the encoded VOCABULARY
    (not the corpus), weighted by word counts: one vocab-sized explode
    + one aggregation."""
    enc = bpe_encode_vocab(docs, merges, text_col)
    syms = F.split(
        F.expr("substring(seg, 2, length(seg) - 2)"), F.lit(SYM_R + SYM_L)
    )
    return (
        enc.select("word", "wcnt", F.explode(syms).alias("token"))
        .groupBy("token")
        .agg(
            F.sum("wcnt").cast("long").alias("n_occurrences"),
            F.countDistinct("word").cast("long").alias("n_words"),
        )
        .orderBy(F.desc("n_occurrences"), F.asc("token"))
        .limit(top_n)
    )


def bpe_encode_docs(
    docs: DataFrame,
    merges,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokens-per-document under a TRAINED merge table — the statistic
    a training-data run materializes per document (sequence-length
    budgeting, packing, billing): (doc_id, n_words, n_tokens).

    Scale shape: each distinct word is encoded ONCE (bpe_encode_vocab);
    the corpus explode then equi-joins word -> n_tokens and re-
    aggregates by document. Both shuffles are on high-cardinality keys
    (word, doc id); the merge loop itself never touches corpus-sized
    data. No UDF anywhere."""
    # widen once: both the vocab build and the corpus explode below
    # tokenize the full corpus (guide §2.5 parallelism guard)
    docs = widen_doc_scan(docs, id_col)
    enc = bpe_encode_vocab(docs, merges, text_col).select("word", "n_tokens")
    words = docs.select(
        F.col(id_col), F.explode(_toks(text_col)).alias("word")
    )
    return (
        words.join(enc, "word")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
        )
    )


def bigram_perplexity(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document cross-entropy / perplexity under the corpus's own
    bigram LM — the n-gram quality gate a pretraining pipeline uses to
    flag documents whose word transitions look nothing like the corpus
    (boilerplate, OCR noise, wrong-language residue score high).

    The LM is the maximum-likelihood bigram model of the SAME corpus
    (P(w2|w1) = cnt(w1,w2)/cnt(w1,·)), so every document bigram has
    nonzero probability and no smoothing is needed — the statistic is an
    exact deterministic function of the data. Returns
    (doc_id, n_bigrams, cross_entropy, perplexity) with
    cross_entropy = avg(-ln P(w2|w1)) rounded 6 dp and
    perplexity = exp(cross_entropy) rounded 6 dp.

    Scale: doc-bigrams are a map-side zip_with+explode; the LM is two
    partial-agg shuffles over (w1,w2)/(w1) — vocabulary-sized, far
    smaller than the corpus; the join back is (w1,w2)-keyed with exactly
    one LM row per key, so AQE's skew split handles stopword-pair heat;
    the final per-doc agg partial-aggregates. No window over the raw
    token stream anywhere."""
    toks = F.col("toks")
    n = F.size(toks)
    pairs = F.zip_with(
        F.slice(toks, 1, n - 1),
        F.slice(toks, 2, n - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    doc_bigrams = (
        widen_doc_scan(docs, id_col)
        .select(F.col(id_col).alias("doc_id"), _toks(text_col).alias("toks"))
        .filter(n >= 2)
        .select("doc_id", F.explode(pairs).alias("p"))
        .select("doc_id", "p.w1", "p.w2")
        # both the LM branch and the join-back read this frame; their
        # exchanges differ (partial-agg vs raw) so Spark can't reuse —
        # without the persist the corpus is tokenized+exploded TWICE
        # (measured sf1: 10.1 -> 7.2 s). MEMORY_AND_DISK default spills
        # at scale like any cached intermediate. min_rows=0: the
        # counterbalanced sf0.1 A/B kept the persist ahead even at 5k
        # docs (1.38 s vs 1.56 s).
    )
    doc_bigrams = maybe_persist(doc_bigrams, min_rows=0)
    lm = doc_bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cnt"))
    w1_tot = lm.groupBy("w1").agg(F.sum("cnt").alias("w1_cnt"))
    lm_p = lm.join(w1_tot, "w1").select(
        "w1", "w2", (F.col("cnt") / F.col("w1_cnt")).alias("cond_p")
    )
    return (
        doc_bigrams.join(lm_p, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg(-F.log(F.col("cond_p"))), 6).alias("cross_entropy"),
            F.round(F.exp(F.avg(-F.log(F.col("cond_p")))), 6).alias("perplexity"),
        )
    )


def bpe_pair_counts(
    docs: DataFrame,
    text_col: str = "text",
    top_n: int = 20,
) -> DataFrame:
    """BPE first-merge candidates: adjacent character-pair frequencies
    over the corpus, weighted by word frequency — exactly the statistic
    a BPE tokenizer trainer computes for its first merge (counting over
    the distinct-word table times frequency, the standard trainer
    optimization). Returns top_n rows (pair, n_occurrences, n_words)
    ranked (n_occurrences desc, pair asc).

    Scale: the word-frequency agg collapses the corpus to its
    vocabulary FIRST (one shuffle on word, partial-agg), so the
    char-pair explode is O(vocab × word_len), not O(corpus); the final
    agg shuffles the pair table only."""
    wf = (
        widen_doc_scan(docs, text_col)
        .select(F.explode(_toks(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wcnt"))
        .filter(F.length("word") >= 2)
    )
    pairs = wf.select(
        "word",
        "wcnt",
        # word is a plain attribute, so inlining it into the lambda is
        # free — the quadratic HOF hazard is re-evaluating an EXPENSIVE
        # outer expression per element, not referencing a column
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("word") - 1),
                lambda i: F.col("word").substr(i, F.lit(2)),
            )
        ).alias("pair"),
    )
    return (
        pairs.groupBy("pair")
        .agg(
            F.sum("wcnt").cast("long").alias("n_occurrences"),
            F.count_distinct(F.col("word")).cast("long").alias("n_words"),
        )
        .orderBy(F.desc("n_occurrences"), F.asc("pair"))
        .limit(top_n)
    )


def bm25_search(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    topk: int = 10,
) -> DataFrame:
    """Okapi BM25 ranked retrieval over a document table — the lexical
    half of every retrieval pipeline (RAG, eval-set decontamination,
    corpus search; Robertson & Zaragoza, "The Probabilistic Relevance
    Framework: BM25 and Beyond", 2009).

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)),
    idf(t) = ln((N−df+0.5)/(df+0.5) + 1)   (the +1 'plus' variant —
    never negative for common terms).

    Plan shape: one tokenize pass feeds doc lengths, per-(doc, term)
    tf for the query terms, and per-term df — the query-term filter
    prunes the tf branch BEFORE its aggregation, so the heavy groupBy
    only sees |Q| terms' postings. N/avgdl (one row) and the df table
    (|Q| rows) broadcast-join back; no driver collect, no UDF. At
    100 TB this is exactly an inverted-index probe: shuffle volume is
    the postings of the queried terms, not the corpus.
    """
    toks = widen_doc_scan(docs, id_col).select(
        F.col(id_col),
        F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        ).alias("tok"),
    )
    dl = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    q = [t.lower() for t in query_terms]
    tf = (
        toks.filter(F.col("tok").isin(q))
        .groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_t = tf.groupBy("tok").agg(F.countDistinct(id_col).alias("df"))
    scored = (
        tf.join(F.broadcast(df_t), "tok")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1),
        )
        .withColumn(
            "contrib",
            F.col("idf")
            * F.col("tf")
            * (k1 + 1)
            / (
                F.col("tf")
                + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
            ),
        )
        .groupBy(id_col)
        .agg(F.round(F.sum("contrib"), 6).alias("bm25"))
    )
    from pyspark.sql import Window

    # global top-k FIRST (TakeOrderedAndProject: per-partition heaps, no
    # single-partition sort of the full score table), THEN rank the tiny
    # k-row result — a bare row_number over all scores would funnel the
    # corpus through one partition
    cut = scored.orderBy(F.desc("bm25"), F.col(id_col)).limit(topk)
    w = Window.orderBy(F.desc("bm25"), F.col(id_col))
    return (
        cut.withColumn("rank", F.row_number().over(w))
        .select(id_col, "bm25", "rank")
        .orderBy("rank")
    )


def bigram_pmi(docs: DataFrame, text_col: str = "text", min_count: int = 5, top_n: int = 20) -> DataFrame:
    """Pointwise mutual information over corpus bigrams:
    PMI(w1,w2) = ln(cnt·N / (c1·c2)) with N = total bigrams, c1/c2 the
    first-/second-position marginals — the collocation detector behind
    phrase mining and tokenizer-merge heuristics. ``min_count`` floors
    the count so rare-pair noise (PMI's known failure mode) can't win.

    Scale: one bigram partial-agg shuffle; marginals are two windowed
    sums over the ALREADY-aggregated bigram table (rows = distinct
    bigrams); N is a broadcast scalar. Rank (pmi desc, w1, w2) is a
    total order on rounded values."""
    toks = F.col("toks")
    n = F.size(toks)
    pairs = F.zip_with(
        F.slice(toks, 1, n - 1),
        F.slice(toks, 2, n - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    bigrams = (
        widen_doc_scan(docs, text_col)
        .select(_toks(text_col).alias("toks"))
        .filter(n >= 2)
        .select(F.explode(pairs).alias("p"))
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    from pyspark.sql import Window

    c1 = F.sum("cnt").over(Window.partitionBy("w1"))
    c2 = F.sum("cnt").over(Window.partitionBy("w2"))
    total = bigrams.agg(F.sum("cnt").alias("n_total"))
    scored = (
        bigrams.withColumn("c1", c1)
        .withColumn("c2", c2)
        .crossJoin(F.broadcast(total))
        .filter(F.col("cnt") >= min_count)
        .select(
            "w1",
            "w2",
            "cnt",
            F.round(
                F.log(
                    F.col("cnt")
                    * F.col("n_total")
                    / (F.col("c1") * F.col("c2"))
                ),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.desc("pmi"), "w1", "w2").limit(top_n)
