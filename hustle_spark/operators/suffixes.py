"""Distributed suffix array + LCP + repeated-substring groups.

The CHARACTER-level half of ExactSubstr (Lee et al., "Deduplicating
Training Data Makes Language Models Better", ACL 2022, build a byte
suffix array of the whole corpus and cut repeats >= 50 bytes):
``operators.dedup.repeated_span_removal`` covers token-window repeats
at one fixed width; this module finds EXACT repeated substrings of any
length >= a threshold, with their suffix-array interval, occurrence
and document counts — the sub-span repeats a fixed window width
cannot see.

Spark-first construction — prefix doubling (Manber–Myers), the suffix
array algorithm whose inner loop IS a distributed sort:

- one row per (doc, pos) suffix; suffixes never cross document
  boundaries (equivalently: corpus concatenation with per-document
  unique sentinels, the Lee et al. layout),
- round 0 ranks every suffix by its first ``prefix_cap`` characters
  directly (one global dense rank over the carried prefix — skipping
  log2(prefix_cap) doubling rounds),
- round k sorts (rank[pos], rank[pos + h]) pairs and re-ranks,
  doubling h, until every rank is distinct or h covers the longest
  document — O(log max_doc_len) rounds, each one doc-partitioned
  window (lead) plus one range-partitioned global dense rank,
- global dense rank never funnels through a single partition: range
  repartition -> per-partition dense_rank -> closed-form offsets from
  the <= shuffle_partitions per-partition distinct counts (a bounded
  driver collect, same class as connected_components' convergence
  check).

LCP between rank-adjacent suffixes is computed from the carried
``prefix_cap``-character prefixes (codegen zip_with; exact up to the
cap, reported as min(true LCP, cap)) — the bounded-LCP contract that
avoids Kasai's sequential pass and per-level rank matrices.

Carried-bytes-per-position accounting (the r9 width cut): the prefix
rides exactly TWO stages — the one SA range sort (where it is the
sort key) and the LCP self-join — at ~(24 + prefix_cap) bytes/row;
every stage after the LCP projection (the frozen member frame, the
member dense rank, the boundary running sum, the group/mark
aggregations) carries only (id, pos, rank, lcp_prev) scalars,
~24 bytes/row — a ~2-3x shuffle/spill cut at cap 24-40 on the
corpus-sized scans, and the group sample text is re-derived at the
end from a broadcast join of the (few) groups against one docs scan.
Lee et al. pay 8 bytes/byte for the in-memory SA; one scalar row per
character position is the same honest cost, distributed.

Scale shape: every wide operation is an equi-join or a range sort on
scalar keys; per-round frames are localCheckpoint'ed (the
connected_components lineage idiom) so plans stay flat across rounds.
Within-doc windows mean one task sees one document's positions —
shard pathologically long documents upstream (the module treats a
document as the parallelism atom, exactly like the token-window
passes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..util import global_dense_rank as _global_dense_rank
from ..util import global_running_sum as _running_sum


def suffix_positions(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    prefix_cap: int = 64,
) -> DataFrame:
    """One row per suffix: (id, pos, __prefix) where pos is 0-based and
    __prefix carries the first ``prefix_cap`` characters of the suffix
    (computed map-side while the document text is in hand — the only
    place text is touched). NULL and empty documents contribute no
    suffixes (nothing to repeat). The prefix is the module's working
    payload: ranking round 0, capped LCP, and the reported sample text
    all come from it."""
    from ..util import spread_input

    t = F.coalesce(F.col(text), F.lit(""))
    return (
        spread_input(df, df.sparkSession)
        .select(F.col(id_col), t.alias("__t"))
        .filter(F.length("__t") > 0)
        .select(
            id_col,
            F.explode(F.sequence(F.lit(0), F.length("__t") - 1)).alias(
                "__pos"
            ),
            F.col("__t"),
        )
        .select(
            id_col,
            F.col("__pos").cast("int").alias("pos"),
            F.expr(f"substring(__t, __pos + 1, {int(prefix_cap)})").alias(
                "__prefix"
            ),
        )
    )


def suffix_array(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    prefix_cap: int = 64,
    max_rounds: int = 32,
) -> DataFrame:
    """Corpus-wide suffix array: (id, pos, __prefix, rank) with rank a
    0-based GLOBAL lexicographic index over every suffix of every
    document, ties between byte-identical suffixes broken by
    (id, pos) — exactly ``ORDER BY suffix, id, pos`` in an oracle
    engine. A suffix that is a proper prefix of another sorts first
    (the unique-sentinel convention: absent continuation ranks below
    every real rank).

    Prefix doubling with a ``prefix_cap``-character head start; rounds
    end when all ranks are distinct (checked per round — the
    iterative-algorithm class, like connected_components) or h covers
    the longest document. Each round: lead(rank, h) inside the doc
    partition, one global dense rank on the (rank, next-rank) pair,
    and a localCheckpoint to keep the plan flat."""
    base = suffix_positions(df, text=text, id_col=id_col, prefix_cap=prefix_cap)
    stats = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.max(F.length("__prefix")).alias("maxp"),
    ).collect()[0]
    n = stats["n"]
    cur = _global_dense_rank(base, ["__prefix"], "rank")
    if n == 0:
        return cur
    max_len_row = (
        df.select(F.max(F.length(F.coalesce(F.col(text), F.lit("")))).alias("m"))
        .collect()[0]
    )
    max_len = max_len_row["m"] or 0
    h = int(prefix_cap)
    w_doc = Window.partitionBy(id_col).orderBy("pos")
    for _ in range(max_rounds):
        distinct = cur.agg(F.max("rank").alias("mx")).collect()[0]["mx"]
        if distinct == n - 1 or h >= max_len:
            break
        paired = cur.withColumn(
            "__r2", F.coalesce(F.lead("rank", h).over(w_doc), F.lit(-1))
        )
        cur = _global_dense_rank(
            paired, ["rank", "__r2"], "__nr"
        ).drop("rank", "__r2").withColumnRenamed("__nr", "rank")
        h *= 2
    # final total order: byte-equal suffixes tie on rank; break by
    # (id, pos) so rank becomes a unique 0-based index, matching the
    # oracle's ORDER BY suffix, id, pos
    return (
        _global_dense_rank(cur, ["rank", id_col, "pos"], "__u")
        .drop("rank")
        .withColumnRenamed("__u", "rank")
    )


def suffix_array_capped(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    prefix_cap: int = 64,
) -> DataFrame:
    """CAP-ORDER suffix array: rank orders by (__prefix, id, pos) —
    ONE global range sort, no doubling rounds. For every consumer
    whose logic is bounded by ``prefix_cap`` this is EQUIVALENT to the
    full-suffix order, by this argument (the r8 measured win — the
    doubling loop was 6 full-corpus sort+checkpoint rounds at sf0.1
    that contribute nothing to cap-bounded consumers):

    - A suffix shorter than the cap IS its own prefix, so a prefix
      that is a proper prefix of another names a class of exactly-
      equal strings; lexicographic order therefore keeps every
      cap-prefix tie class CONTIGUOUS in the full-suffix order too,
      and the classes appear in the same (prefix-string) order.
    - The two orders thus differ only by a permutation WITHIN tie
      classes. Capped LCP between rank-adjacent suffixes is a class-
      level constant (equal prefixes inside a class; the boundary
      pair's LCP depends only on the two classes' prefixes), so
      member sets, island runs, group intervals, their start indices
      (= MIN(rank)), counts, repeat lengths, and removal marks are
      all identical under either order.

    Consumers that need the TRUE full-suffix order beyond the cap
    (none in this module's public surface) use ``suffix_array``."""
    from pyspark import StorageLevel

    base = suffix_positions(df, text=text, id_col=id_col, prefix_cap=prefix_cap)
    # DISK_ONLY: one row per character with the carried prefix is the
    # module's one corpus-sized frame — in memory it crowds out the 32
    # concurrent sort buffers (the r8 sf1 OOM in the 8g local heap)
    return _global_dense_rank(
        base, ["__prefix", id_col, "pos"], "rank",
        checkpoint_storage=StorageLevel.DISK_ONLY,
    )


def _capped_lcp(a, b):
    """Common-prefix length of two (already cap-bounded) strings in
    pure codegen: zip the character arrays, find the first mismatch.
    zip_with pads the shorter side with NULL, and NULL != ch yields
    NULL (not false), so the first FALSE is always a genuine mismatch
    and a fully-matching shorter string falls through to min(len)."""
    za = F.split(a, "(?!^)")
    zb = F.split(b, "(?!^)")
    eq = F.zip_with(za, zb, lambda x, y: x == y)
    first_false = F.array_position(eq, F.lit(False))
    return F.when(
        first_false > 0, (first_false - 1).cast("int")
    ).otherwise(F.least(F.length(a), F.length(b)).cast("int"))


def lcp_adjacent(sa: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Adds ``lcp_prev``: the capped LCP between each suffix and its
    rank-predecessor (NULL for rank 0). Rank-adjacency is a plain
    self-equi-join on rank (ranks are unique integers), not a global
    window — the shuffle is on a scalar key."""
    prev = sa.select(
        (F.col("rank") + 1).alias("rank"), F.col("__prefix").alias("__pprefix")
    )
    return sa.join(prev, "rank", "left").withColumn(
        "lcp_prev",
        F.when(
            F.col("__pprefix").isNotNull(),
            _capped_lcp(F.col("__prefix"), F.col("__pprefix")),
        ),
    ).drop("__pprefix")


def repeated_substring_groups(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    min_len: int = 20,
    min_docs: int = 2,
    prefix_cap: int = 64,
) -> DataFrame:
    """Right-maximal repeated substrings of length >= ``min_len``
    characters, straight off the suffix array: every maximal run of
    rank-consecutive suffixes whose adjacent capped LCPs all reach
    ``min_len`` is one GROUP — the occurrences of a shared substring of
    length >= min_len (the suffix-array interval of that substring).
    Groups are filtered to those spanning >= ``min_docs`` distinct
    documents (cross-document repeats; set min_docs=1 to include
    within-document self-repeats).

    Returns one row per group:
      group_id     — rank of the group's first suffix (stable),
      n_occ        — number of occurrences (suffixes in the interval),
      n_docs       — distinct documents touched,
      repeat_len   — min(true shared length, prefix_cap): the minimum
                     adjacent LCP over the interval, saturating at the
                     cap (a group whose repeat_len == prefix_cap may
                     share arbitrarily more),
      sample       — the shared substring itself, to repeat_len chars.

    The group key for a run of consecutive ranks is rank - (index of
    the member among members ordered by rank) — the islands trick, with
    the member index supplied by the same range-partitioned global
    dense rank the SA construction uses (member ranks are unique, so
    dense rank == row index). Runs additionally SPLIT where the
    adjacent LCP dips below min_len even though both sides stay
    members of other runs — membership alone is not edge-transitivity.

    Scale shape: members (positions inside repeated regions) are the
    only rows past the LCP stage; everything after is group-keyed
    aggregation. Lee et al. cut every repeat the SA surfaces — this
    group table is exactly the audit/cut list that pass consumes."""
    runs = _repeat_runs(df, text, id_col, min_len, prefix_cap)
    groups = (
        runs.groupBy("__g")
        .agg(
            F.min("rank").alias("group_id"),
            F.count(F.lit(1)).alias("n_occ"),
            F.count_distinct(F.col(id_col)).alias("n_docs"),
            # min over the interval's INTERNAL edges = shared length;
            # the boundary row's lcp_prev belongs to the previous group
            F.min(F.when(F.col("__b") == 0, F.col("lcp_prev"))).alias(
                "repeat_len"
            ),
            # first member by rank (ranks are unique, so min(struct)
            # picks the group_id row); carry its (id, pos) so the
            # sample text can be re-derived from the docs table below
            # instead of hauling the prefix through the group shuffle
            F.min(
                F.struct(
                    F.col("rank").alias("r"),
                    F.col(id_col).alias("i"),
                    F.col("pos").alias("p"),
                )
            ).alias("__first"),
        )
        .filter(F.col("n_docs") >= min_docs)
        .select(
            "group_id",
            "n_occ",
            "n_docs",
            F.col("repeat_len").cast("int").alias("repeat_len"),
            F.col("__first.i").alias("__fid"),
            F.col("__first.p").alias("__fpos"),
        )
    )
    # sample re-derivation: groups are FEW (bounded by true repeats),
    # so broadcast them against one docs scan — substring(text,
    # pos+1, repeat_len) of the first member is byte-identical to the
    # prefix slice the group shuffle used to carry
    docs = df.select(
        F.col(id_col).alias("__fid"),
        F.coalesce(F.col(text), F.lit("")).alias("__ftext"),
    )
    return (
        F.broadcast(groups)
        .join(docs, "__fid")
        .select(
            "group_id",
            "n_occ",
            "n_docs",
            "repeat_len",
            F.expr("substring(__ftext, __fpos + 1, repeat_len)").alias(
                "sample"
            ),
        )
    )


def _repeat_runs(
    df: DataFrame,
    text: str,
    id_col: str,
    min_len: int,
    prefix_cap: int,
) -> DataFrame:
    """Per-member run frame shared by groups and removal: suffixes
    inside some repeated region (an adjacent capped LCP >= min_len on
    either side), each carrying its island key ``__g`` (split on rank
    gaps and sub-threshold edges — membership alone is not
    edge-transitivity), boundary flag ``__b``, rank, lcp_prev, and
    (id, pos) — scalars only; the carried prefix is dropped at the
    LCP stage (see the width-cut note below)."""
    # cap-order SA (suffix_array_capped): equivalent to the full order
    # for everything downstream — see its docstring — at ONE global
    # sort instead of the doubling loop (measured 27.6 s -> the sort's
    # few seconds for the removal row at sf0.1). checkpoint: sa feeds
    # lcp_adjacent's self-join and lcped feeds its own reverse join —
    # without truncation each action would replay the pipeline per
    # branch
    from pyspark import StorageLevel

    sa = suffix_array_capped(
        df, text=text, id_col=id_col, prefix_cap=prefix_cap
    )
    # WIDTH CUT (r9): the carried prefix is needed by exactly two
    # stages — the SA range sort (it IS the sort key) and the LCP
    # self-join. Everything downstream operates on scalars, so the
    # prefix is dropped HERE, before the checkpoint: the frozen frame,
    # the member filter, the member dense rank, and the boundary
    # running sum all carry (id, pos, rank, lcp_prev) ≈ 24 bytes per
    # position instead of + prefix_cap chars — a ~2-3x shuffle/spill
    # cut on the two corpus-sized range scans below (group sample text
    # is re-derived from the docs table at the end, where groups are
    # few — repeated_substring_groups).
    lcped = (
        lcp_adjacent(sa, id_col=id_col)
        .select(id_col, "pos", "rank", "lcp_prev")
        .localCheckpoint(eager=True, storageLevel=StorageLevel.DISK_ONLY)
    )
    # a suffix is a member iff it shares >= min_len with a rank
    # neighbor on either side; lcp_next via the reverse join
    nxt = lcped.select(
        (F.col("rank") - 1).alias("rank"), F.col("lcp_prev").alias("lcp_next")
    )
    marked = lcped.join(nxt, "rank", "left")
    members = marked.filter(
        (F.col("lcp_prev") >= min_len) | (F.col("lcp_next") >= min_len)
    )
    # islands: consecutive ranks with a qualifying SHARED edge stay in
    # one group; split on rank gaps (automatic: a gapped rank has a
    # sub-threshold or absent lcp_prev edge) and on sub-threshold edges
    # DISK_ONLY here too: members are ~7% of positions on a natural
    # corpus but CORPUS-SIZED on repeat-heavy ones (the 10x replica
    # study's injected corpus) — the honest assumption for a dedup op
    idx = _global_dense_rank(
        members, ["rank"], "__mi",
        checkpoint_storage=StorageLevel.DISK_ONLY,
    )
    boundary = (
        F.col("lcp_prev").isNull() | (F.col("lcp_prev") < min_len)
    ).cast("bigint")
    flagged = idx.withColumn("__b", boundary)
    # group seed = running count of boundaries up to each member, a
    # prefix sum over the member index — same range-partition scan
    return _running_sum(
        flagged, "__mi", "__b", "__g",
        checkpoint_storage=StorageLevel.DISK_ONLY,
    )


def repeated_substring_removal(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    min_len: int = 20,
    min_docs: int = 2,
    prefix_cap: int = 64,
) -> DataFrame:
    """Character-exact ExactSubstr CUT (Lee et al. ACL 2022): every
    character covered by a substring of length >= ``min_len`` that
    repeats across >= ``min_docs`` distinct documents is removed from
    ALL of them — the char-level complement of
    ``dedup.repeated_span_removal``'s token windows, with exact repeat
    boundaries from the suffix array instead of window-width rounding.
    Set min_docs=1 to also cut within-document self-repeats.

    Coverage is cap-independent: every suffix position inside a long
    repeat is its own member, and each member marks only
    [pos, pos + min_len) — the union of those windows tiles the whole
    repeat exactly, so ``prefix_cap`` only needs to be >= min_len for
    DETECTION, never for cut length.

    Returns (id_col, text, n_chars, n_removed): surviving text with
    the removed intervals' characters deleted (gap concatenation — no
    whitespace normalization; character offsets are the contract
    here), original char count, chars removed. Documents with nothing
    flagged pass through verbatim; NULL text folds to ''.

    Scale shape: members are the only rows past the LCP stage; marks
    collapse per document (bounded by the doc's own length), merge
    into disjoint intervals via the same codegen fold as the token
    pass, and the rebuild is size(intervals)+1 substring copies."""
    runs = _repeat_runs(df, text, id_col, min_len, prefix_cap)
    qual = (
        runs.groupBy("__g")
        .agg(F.count_distinct(F.col(id_col)).alias("__nd"))
        .filter(F.col("__nd") >= min_docs)
        .select("__g")
    )
    marks = (
        runs.join(qual, "__g", "left_semi")
        .select(F.col(id_col), F.col("pos").alias("__lo"))
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_list("__lo")).alias("__starts"))
    )
    base = df.select(
        F.col(id_col), F.coalesce(F.col(text), F.lit("")).alias("__t")
    )
    withs = base.join(marks, id_col, "left").select(
        id_col,
        "__t",
        F.coalesce("__starts", F.array().cast("array<int>")).alias("__starts"),
    )
    nch = F.length("__t")
    hi_of = lambda s: F.least(s + min_len - 1, nch - 1)  # noqa: E731
    # same merge fold as the token pass: sorted starts collapse into
    # sorted, disjoint, gap-separated [lo, hi] intervals
    intervals = F.aggregate(
        F.col("__starts"),
        F.array().cast("array<struct<lo:int,hi:int>>"),
        lambda acc, s: F.when(
            F.try_element_at(acc, F.lit(-1)).isNotNull()
            & (s <= F.try_element_at(acc, F.lit(-1))["hi"] + 1),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(
                    F.struct(
                        F.try_element_at(acc, F.lit(-1))["lo"].alias("lo"),
                        F.greatest(
                            F.try_element_at(acc, F.lit(-1))["hi"], hi_of(s)
                        ).alias("hi"),
                    )
                ),
            ),
        ).otherwise(
            F.concat(
                acc,
                F.array(
                    F.struct(
                        s.cast("int").alias("lo"), hi_of(s).cast("int").alias("hi")
                    )
                ),
            )
        ),
    )
    with_iv = withs.select(id_col, "__t", intervals.alias("__iv"))

    def gap_piece(j):
        prev_hi = F.when(
            j > 0, F.try_element_at(F.col("__iv"), j)["hi"]
        ).otherwise(F.lit(-1))
        next_lo = F.coalesce(
            F.try_element_at(F.col("__iv"), j + 1)["lo"], F.length("__t")
        )
        return F.col("__t").substr(
            prev_hi + 2, F.greatest(F.lit(0), next_lo - prev_hi - 1)
        )

    kept = F.array_join(
        F.transform(F.sequence(F.lit(0), F.size(F.col("__iv"))), gap_piece),
        "",
    )
    n_removed = F.aggregate(
        F.col("__iv"),
        F.lit(0),
        lambda acc, iv: acc + iv["hi"] - iv["lo"] + 1,
    )
    return with_iv.select(
        id_col,
        kept.alias(text),
        F.length("__t").cast("bigint").alias("n_chars"),
        F.coalesce(n_removed, F.lit(0)).cast("bigint").alias("n_removed"),
    )
