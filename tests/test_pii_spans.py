"""PII redaction + exact-substring span dedup: edge cases the oracled
registry queries (text_pii_redaction, dedup_exact_substring) don't pin.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gcs2postgres_spark.functions.text import PII_PATTERNS, pii_redact, pii_redact_sql
from gcs2postgres_spark.operators.dedup import duplicate_spans


def _redact_one(spark, s: str) -> str:
    return (
        spark.createDataFrame([(s,)], "t string")
        .select(pii_redact(F.col("t")).alias("r"))
        .collect()[0]["r"]
    )


def test_pii_redact_each_pattern(spark):
    assert _redact_one(spark, "mail a.b+c@x.co now") == "mail <EMAIL> now"
    assert _redact_one(spark, "host 192.168.0.1 up") == "host <IP> up"
    assert _redact_one(spark, "ssn 123-45-6789.") == "ssn <SSN>."
    assert _redact_one(spark, "call 415-555-0123!") == "call <PHONE>!"
    assert (
        _redact_one(spark, "card 4111 1111 1111 1111 ok") == "card <CARD> ok"
    )


def test_pii_redact_ordering_and_overlap(spark):
    # SSN shape must not be half-eaten by the looser phone pattern
    assert _redact_one(spark, "123-45-6789") == "<SSN>"
    # an email's host dots must not leave a stray IP match behind
    assert _redact_one(spark, "u@10.2.3.4mail.com x") == "<EMAIL> x"
    # clean text is untouched
    assert _redact_one(spark, "no pii here 12 3.4") == "no pii here 12 3.4"


def test_pii_sql_twin_matches_spark(spark):
    """The DuckDB chain (pii_redact_sql) and the Spark chain must agree
    byte-for-byte on a corpus hitting every pattern — the regexes live
    in the Java∩RE2 subset precisely for this."""
    import duckdb

    samples = [
        "a.b@x.co and 10.0.0.1 and 123-45-6789 and 415-555-0123",
        "cards 4111-1111-1111-1111 or 4111 1111 1111 1111",
        "plain text, no personal data 1.2 three",
        "edge: x@y.io. trailing dot and 255.255.255.255",
    ]
    got_spark = [
        r["r"]
        for r in spark.createDataFrame([(s,) for s in samples], "t string")
        .select(pii_redact(F.col("t")).alias("r"))
        .collect()
    ]
    con = duckdb.connect()
    got_duck = [
        con.execute(f"SELECT {pii_redact_sql('?::VARCHAR')}", [s]).fetchone()[0]
        for s in samples
    ]
    assert got_spark == got_duck
    assert len(PII_PATTERNS) == 5


def test_duplicate_spans_basics(spark):
    common = " ".join(f"w{i}" for i in range(10))  # one shared 10-token span
    docs = spark.createDataFrame(
        [
            (1, common + " tail1 tail2"),
            (2, "head " + common),
            (3, "totally different words " + " ".join(f"x{i}" for i in range(10))),
            (4, "short doc"),  # < k tokens: 0/0, still present
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: (r["total_spans"], r["dup_spans"])
        for r in duplicate_spans(docs, "doc_id", "text", k=10).collect()
    }
    assert rows[4] == (0, 0)
    assert rows[3][1] == 0
    # doc1: 12 tokens -> 3 windows; exactly the aligned common window dups
    assert rows[1] == (3, 1)
    assert rows[2] == (2, 1)


def test_duplicate_spans_within_doc_repeat_not_flagged(spark):
    """min_docs=2 counts DISTINCT documents: a span repeated inside ONE
    document is not a cross-document duplicate."""
    span = " ".join(f"r{i}" for i in range(10))
    docs = spark.createDataFrame(
        [(1, span + " mid " + span)], "doc_id long, text string"
    )
    row = duplicate_spans(docs, "doc_id", "text", k=10).collect()[0]
    assert row["dup_spans"] == 0 and row["total_spans"] == 12


def test_duplicate_spans_plan_no_cartesian(spark):
    from gcs2postgres_spark.plans.inspect import formatted_plan

    docs = spark.createDataFrame(
        [(1, "a b c d e f g h i j k"), (2, "b c d e f g h i j k l")],
        "doc_id long, text string",
    )
    plan = formatted_plan(duplicate_spans(docs, "doc_id", "text", k=10))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
