"""Embedding similarity search (north-star EXT; SURVEY.md section 2.10 L3).

Two tiers, as a real pipeline would deploy them:

- **Brute-force cosine top-k** — exact baseline. For a *small query
  set* against a huge corpus this is a broadcast join (query side
  broadcast, corpus streamed, no shuffle of the corpus) followed by a
  per-query top-k window. Linear in corpus size; the right choice
  whenever queries are few.
- **LSH-bucketed ANN** (random hyperplane signatures) — the scale path
  for all-pairs / many-query workloads: cosine-similar vectors collide
  in signature buckets, so candidate generation is an equi-join on
  (table, band signature). Probes multiple hash tables for recall.

The dot product stays in codegen via ``F.zip_with`` + ``F.aggregate``
(no Python). 64-dim testdata vectors make per-row cost trivial; at
1e9+ rows the corpus scan dominates and both paths stream it once.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, v: acc + v * v)
    )


def cosine(a, b):
    """Cosine similarity of two array<numeric> columns (codegen only)."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Returns (query_id, vec_id, cosine, rank). The query side is
    broadcast — the corpus is never shuffled, only scanned. Ties broken
    by corpus id for determinism.
    """
    query_id_col = query_id_col or id_col
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    c = corpus.select(F.col(id_col), F.col(vec_col).alias("__cv"))
    scored = c.join(F.broadcast(q), F.col(id_col) != F.col("query_id")).select(
        "query_id",
        id_col,
        cosine(F.col("__cv"), F.col("__qv")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic unit-normal hyperplanes for signed random projection."""
    rng = random.Random(seed)
    planes = []
    for _ in range(n_planes):
        v = [rng.gauss(0.0, 1.0) for _ in range(dim)]
        n = math.sqrt(sum(x * x for x in v)) or 1.0
        planes.append([x / n for x in v])
    return planes


def lsh_signatures(
    df: DataFrame,
    dim: int,
    vec_col: str = "embedding",
    n_tables: int = 4,
    bits_per_table: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Add ``__sig_t`` columns: per-table sign-bit signatures (long).

    Hyperplanes ship to executors as literal arrays (tiny: tables *
    bits * dim doubles) — effectively a broadcast, no shuffle.
    """
    planes = random_hyperplanes(dim, n_tables * bits_per_table, seed)
    out = df
    for t in range(n_tables):
        sig = F.lit(0).cast("long")
        for b in range(bits_per_table):
            p = planes[t * bits_per_table + b]
            plane_arr = F.array(*[F.lit(x) for x in p])
            sig = sig + F.when(_dot(F.col(vec_col), plane_arr) >= 0, F.lit(1 << b)).otherwise(0)
        out = out.withColumn(f"__sig_{t}", sig)
    return out


def ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_tables: int = 4,
    bits_per_table: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates = corpus rows sharing any hash
    table signature with the query, then exact cosine rank among
    candidates. All joins are equi-joins on (table, signature)."""
    csig = lsh_signatures(corpus, dim, vec_col, n_tables, bits_per_table, seed)
    qsig = lsh_signatures(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")),
        dim,
        "__qv",
        n_tables,
        bits_per_table,
        seed,
    )
    c_buckets = csig.select(
        id_col,
        vec_col,
        F.explode(
            F.array(*[F.struct(F.lit(t).alias("t"), F.col(f"__sig_{t}").alias("s")) for t in range(n_tables)])
        ).alias("bucket"),
    )
    q_buckets = qsig.select(
        "query_id",
        "__qv",
        F.explode(
            F.array(*[F.struct(F.lit(t).alias("t"), F.col(f"__sig_{t}").alias("s")) for t in range(n_tables)])
        ).alias("bucket"),
    )
    cand = (
        c_buckets.join(F.broadcast(q_buckets), "bucket")
        .filter(F.col(id_col) != F.col("query_id"))
        .select("query_id", id_col, vec_col, "__qv")
        .distinct()
    )
    scored = cand.select(
        "query_id", id_col, cosine(F.col(vec_col), F.col("__qv")).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def embedding_near_dup_pairs(
    df: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_tables: int = 6,
    bits_per_table: int = 10,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a < b, cosine >= threshold)
    via LSH bucketing — the embedding analogue of MinHash dedup."""
    sig = lsh_signatures(df, dim, vec_col, n_tables, bits_per_table, seed)
    buckets = sig.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        F.explode(
            F.array(*[F.struct(F.lit(t).alias("t"), F.col(f"__sig_{t}").alias("s")) for t in range(n_tables)])
        ).alias("bucket"),
    )
    l, r = buckets.alias("L"), buckets.alias("R")
    cand = (
        l.join(r, (F.col("L.bucket") == F.col("R.bucket")) & (F.col("L.id") < F.col("R.id")))
        .select(
            F.col("L.id").alias("a"),
            F.col("R.id").alias("b"),
            F.col("L.v").alias("va"),
            F.col("R.v").alias("vb"),
        )
        .distinct()
    )
    return (
        cand.select("a", "b", cosine(F.col("va"), F.col("vb")).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )
