"""Corpus retrieval: exact-integer TF-IDF top-k.

The curation use cases are targeted data selection (DSIR-style
importance sampling seeds, "find documents about X" audits) and
benchmark-leak triage beyond exact n-gram hits. Scoring is kept in
EXACT integer arithmetic so the DuckDB oracle can replay every rank:

    idf_w(term)  = (1_000_000 * (N + 1)) DIV (df + 1)     (floored)
    score(q, d)  = sum over query terms of tf(d, term) * idf_w(term)

BM25's saturating tf and length normalization swap in behind the same
(query_id, doc_id, score) contract — they need floats (log idf,
rational tf curve), which is exactly why the checkable ladder here is
plain TF-IDF; the divergence is documented, not hidden.

Scale shape: the QUERY-TERM filter comes first — tokens are pruned to
the (tiny, broadcast) union of query terms BEFORE the tf aggregation,
so the only wide shuffle is over matched (doc, term) pairs, not the
full posting list; df/idf live on the bounded matched-term table; the
final top-k is a per-query window over scored docs. At 100 TB the
token explode is the scan-bound stage and everything after it is
proportional to matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

IDF_SCALE = 1_000_000


def tfidf_topk(
    docs: DataFrame,
    queries: list[tuple[int, str]],
    k: int = 5,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score each (query, doc) pair by integer TF-IDF over whitespace-
    lowercased tokens and keep the top ``k`` docs per query (total
    order: score desc, doc_id asc). N is the full corpus size; df
    counts distinct docs containing the term. Returns (query_id,
    doc_id, score, rnk)."""
    spark = docs.sparkSession
    n_docs = docs.count()  # one scalar of driver state
    q_terms = [
        (qid, t)
        for qid, qtext in queries
        for t in sorted(set(qtext.lower().split()))
    ]
    qdf = F.broadcast(
        spark.createDataFrame(q_terms, "query_id long, term string")
    )
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.lower(F.coalesce(F.col(text), F.lit(""))), r"\s+")).alias(
            "term"
        ),
    ).join(qdf.select("term").distinct(), "term")  # prune BEFORE the tf shuffle
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    idf = (
        tf.groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"))
        .select(
            "term",
            # BIGINT literal up front: 1e6 * (N+1) overflows int32 at
            # 5k docs under ANSI (caught by the sf0.1 probe — the
            # sf0.01 gate fits in int32 and cannot see this)
            F.expr(
                f"(CAST({IDF_SCALE} AS BIGINT) * ({n_docs} + 1)) div (df + 1)"
            ).alias("idf_w"),
        )
    )
    scored = (
        tf.join(F.broadcast(idf), "term")
        .join(qdf, "term")
        .groupBy("query_id", "doc_id")
        .agg(F.sum(F.expr("tf * idf_w")).cast("long").alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "doc_id", "score", "rnk")
    )
