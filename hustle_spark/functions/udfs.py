"""User-code surface: scalar Pandas UDF, grouped UDAF, table UDTF
(SURVEY.md section 2.9 U2-U4).

The reference's only user-code hook was ``insert(preprocess=fn)`` — a
per-row Python callback at ingest (public repo: ``hustle/__init__.py``).
This module is the EXT generalization, following the engine rule that
Python user code always crosses the JVM boundary in Arrow batches
(``pandas_udf`` / ``applyInPandas``), never row-at-a-time.

Determinism note for UDAFs: inside ``applyInPandas`` the group's row
order depends on the shuffle. Any float reduction over the group must
therefore be order-normalized — the regression example below reduces to
*exact integer sums* (Python bigints), so the result is bit-identical
regardless of row order, partitioning, or engine.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


@F.pandas_udf(T.IntegerType())
def bpe_ish_token_count_udf(texts: pd.Series) -> pd.Series:
    """U2 scalar Pandas UDF (Arrow-vectorized): BPE-ish token count.
    Mirrors functions.text.bpe_ish_token_count exactly, so the built-in
    expression serves as its oracle."""
    import re

    pat = re.compile(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]")
    # NULL text yields NULL — the built-in expression's behavior; a
    # fillna('')->0 here would break the stated oracle relationship on
    # null-containing data
    return texts.map(lambda t: None if pd.isna(t) else len(pat.findall(t)))


REGRESSION_SCHEMA = "user_id long, n long, slope double"


def _slope_exact(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-group OLS slope of value-cents vs epoch-seconds using exact
    Python-int sums (order-invariant)."""
    uid = pdf["user_id"].iloc[0]
    # NULL ts/value arrive as NaN in float64 columns; int(NaN) raises
    # and kills the whole query — a null pair simply isn't a sample
    clean = pdf[["x", "y"]].dropna()
    xs = [int(v) for v in clean["x"]]
    ys = [int(v) for v in clean["y"]]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    denom = n * sxx - sx * sx
    slope = float(n * sxy - sx * sy) / float(denom) if denom else float("nan")
    return pd.DataFrame({"user_id": [uid], "n": [n], "slope": [slope]})


def regression_slope_by_user(events: DataFrame) -> DataFrame:
    """U3 UDAF via applyInPandas: per-user slope of value over time.

    The heavy lifting (epoch + cents extraction) stays JVM-side; the
    Python side sees two integer columns per group.
    """
    prepped = events.select(
        "user_id",
        F.floor(F.col("ts").cast("double")).cast("long").alias("x"),
        F.round(F.col("value") * 100).cast("long").alias("y"),
    )
    return prepped.groupBy("user_id").applyInPandas(_slope_exact, REGRESSION_SCHEMA)


def explode_shingles_udtf(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """U4 table function: one row per word n-gram shingle.

    Implemented as mapInPandas (batch iterator -> expanded batches),
    the Arrow-native UDTF shape; output cardinality is data-dependent,
    which scalar UDFs cannot express.
    """
    out_schema = f"{id_col} long, shingle string"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, shingles = [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                toks = ("" if t is None else str(t)).split()
                if len(toks) < n:
                    grams = [" ".join(toks)]
                else:
                    grams = [" ".join(toks[j:j + n]) for j in range(len(toks) - n + 1)]
                ids.extend([i] * len(grams))
                shingles.extend(grams)
            yield pd.DataFrame({id_col: ids, "shingle": shingles})

    return df.select(id_col, text_col).mapInPandas(gen, out_schema)
