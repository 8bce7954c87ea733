"""Property-based differential testing (beyond the reference's fixed
inline asserts): random predicate trees evaluated by the DSL vs DuckDB."""

from hypothesis import given, settings, strategies as st

import hustle_spark as h

NUM_COLS = ["o_totalprice", "o_custkey"]
OPS = ["lt", "le", "gt", "ge", "eq", "ne"]


def leaf_to_dsl(t, leaf):
    col, op, val = leaf
    c = t[col]
    return {
        "lt": c < val, "le": c <= val, "gt": c > val,
        "ge": c >= val, "eq": c == val, "ne": c != val,
    }[op]


def leaf_to_sql(leaf):
    col, op, val = leaf
    sym = {"lt": "<", "le": "<=", "gt": ">", "ge": ">=", "eq": "=", "ne": "!="}[op]
    return f"{col} {sym} {val!r}"


leaves = st.tuples(
    st.sampled_from(NUM_COLS),
    st.sampled_from(OPS),
    st.integers(min_value=0, max_value=500000),
)
trees = st.lists(leaves, min_size=1, max_size=3)
combos = st.lists(st.sampled_from(["and", "or"]), min_size=2, max_size=2)


@settings(max_examples=12, deadline=None)
@given(tree=trees, ops=combos)
def test_random_predicates_match_duckdb(tree, ops, spark, catalog, duck):
    t = catalog.table("orders")
    expr = leaf_to_dsl(t, tree[0])
    sql = leaf_to_sql(tree[0])
    for i, leaf in enumerate(tree[1:]):
        op = ops[i % len(ops)]
        if op == "and":
            expr = expr & leaf_to_dsl(t, leaf)
            sql = f"({sql}) AND {leaf_to_sql(leaf)}"
        else:
            expr = expr | leaf_to_dsl(t, leaf)
            sql = f"({sql}) OR {leaf_to_sql(leaf)}"
    got = h.select(t.o_orderkey, where=expr).count()
    exp = duck.execute(f"SELECT COUNT(*) FROM orders WHERE {sql}").fetchone()[0]
    assert got == exp, f"predicate {sql}: spark={got} duck={exp}"


AGG_FNS = ["sum", "min", "max", "count"]
GROUP_COLS = ["o_orderstatus", "o_orderpriority"]


@settings(max_examples=10, deadline=None)
@given(
    group=st.sampled_from(GROUP_COLS),
    fn=st.sampled_from(AGG_FNS),
    cutoff=st.integers(min_value=0, max_value=400000),
)
def test_random_aggregates_match_duckdb(group, fn, cutoff, spark, catalog, duck):
    t = catalog.table("orders")
    hfn = {"sum": h.h_sum, "min": h.h_min, "max": h.h_max}.get(fn)
    agg = h.h_count().alias("v") if fn == "count" else hfn(t.o_totalprice).alias("v")
    df = h.select(t[group], agg, where=t.o_totalprice > float(cutoff))
    got = {r[0]: (round(r[1], 4) if isinstance(r[1], float) else r[1]) for r in df.collect()}
    sql_fn = "COUNT(*)" if fn == "count" else f"{fn.upper()}(o_totalprice)"
    exp = {
        r[0]: (round(r[1], 4) if isinstance(r[1], float) else r[1])
        for r in duck.execute(
            f"SELECT {group}, {sql_fn} FROM orders WHERE o_totalprice > {cutoff} GROUP BY 1"
        ).fetchall()
    }
    assert got == exp


# ---- text-function properties: Spark implementation vs a pure-Python
# reference on random strings (cheap one-row frames, broad input space)

import hashlib
import math
import re

import numpy as np

# ASCII space only: Spark trim / Java \s (and DuckDB RE2 \s) do NOT
# treat U+00A0 etc. as whitespace, while Python's str.strip and re \s
# do — hypothesis found that divergence immediately. Engine-vs-engine
# agreement on Unicode spaces is covered by the DuckDB oracle; this
# reference deliberately stays in the engines' common ASCII semantics.
text_strat = st.text(
    alphabet=st.characters(
        whitelist_categories=("Lu", "Ll", "Nd"), whitelist_characters=".-@_ "
    ),
    min_size=0, max_size=120,
)


@settings(max_examples=15, deadline=None)
@given(s=text_strat)
def test_fingerprint_matches_python_reference(s, spark):
    from pyspark.sql import functions as F
    from hustle_spark.functions import text as TX

    got = (
        spark.createDataFrame([(s,)], "t string")
        .select(TX.fingerprint(F.col("t"), 16).alias("fp"))
        .collect()[0].fp
    )
    norm = re.sub(r"\s+", " ", s.strip().lower())
    exp = hashlib.md5(norm.encode("utf-8")).hexdigest()[:16]
    assert got == exp


@settings(max_examples=15, deadline=None)
@given(s=text_strat)
def test_pii_redact_leaves_no_matches(s, spark):
    from pyspark.sql import functions as F
    from hustle_spark.functions import text as TX

    # inject one of each PII kind at a random-ish position (prefix)
    loaded = f"{s} a.b-c_9@mail-host.example.org 555-867-5309 078-05-1120 {s}"
    row = (
        spark.createDataFrame([(loaded,)], "t string")
        .select(
            TX.pii_redact(F.col("t")).alias("red"),
            sum(TX.pii_counts(TX.pii_redact(F.col("t"))).values()).alias("resid"),
        )
        .collect()[0]
    )
    assert row.resid == 0
    for pat in TX.PII_PATTERNS.values():
        assert not re.search(pat, row.red)


@settings(max_examples=15, deadline=None)
@given(ids=st.lists(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=8, unique=True))
def test_split_assign_matches_python_reference(ids, spark):
    from pyspark.sql import functions as F
    from hustle_spark.functions import text as TX

    rows = spark.createDataFrame([(i,) for i in ids], "doc_id long").select(
        "doc_id", TX.split_assign("doc_id").alias("split")
    ).collect()

    def ref(i):
        p = hashlib.md5(f"{i}:split".encode()).hexdigest()[:2]
        return "test" if p < "1a" else ("val" if p < "34" else "train")

    assert {r.doc_id: r.split for r in rows} == {i: ref(i) for i in ids}


@settings(max_examples=12, deadline=None)
@given(
    n_toks=st.integers(min_value=0, max_value=600),
    chunk=st.integers(min_value=2, max_value=64),
    stride=st.integers(min_value=1, max_value=64),
)
def test_chunk_documents_matches_python_reference(n_toks, chunk, stride, spark):
    from pyspark.sql import functions as F  # noqa: F401
    from hustle_spark.functions import text as TX

    toks = [f"w{i}" for i in range(n_toks)]
    doc = " ".join(toks)
    df = spark.createDataFrame([(1, doc)], "doc_id long, text string")
    rows = (
        TX.chunk_documents(df, chunk=chunk, stride=stride)
        .orderBy("chunk_idx")
        .collect()
    )
    # python reference: chunks cover [s*stride, s*stride+chunk)
    ref_toks = doc.split(" ") if doc else [""]  # split('') == [''] in Spark
    n = len(ref_toks)
    extra = max(n - chunk, 0)
    n_chunks = 1 + (extra + stride - 1) // stride
    assert len(rows) == n_chunks
    for r in rows:
        s = r.chunk_idx * stride
        piece = ref_toks[s : s + chunk]
        assert r.chunk_tokens == len(piece)
        exp = hashlib.md5(" ".join(piece).encode()).hexdigest()[:16]
        assert r.chunk_fp == exp
    # every token is covered by at least one chunk when stride <= chunk
    if stride <= chunk:
        covered = set()
        for r in rows:
            s = r.chunk_idx * stride
            covered.update(range(s, min(s + chunk, n)))
        assert covered == set(range(n))


@settings(max_examples=12, deadline=None)
@given(
    vec=st.lists(
        st.floats(min_value=-1e3, max_value=1e3, allow_nan=False, width=32),
        min_size=1, max_size=32,
    )
)
def test_quantize_int8_error_bound(vec, spark):
    from pyspark.sql import functions as F  # noqa: F401
    from hustle_spark.operators.similarity import quantize_int8

    df = spark.createDataFrame([(1, vec)], "vec_id long, embedding array<float>")
    row = quantize_int8(df).collect()[0]
    maxabs = max(abs(float(np.float32(x))) for x in vec)
    scale = maxabs / 127.0
    assert row.q8_scale == scale
    assert len(row.q8) == len(vec)
    for q, x in zip(row.q8, vec):
        xd = float(np.float32(x))
        assert -128 <= q <= 127 or maxabs == 0
        # floor quantization: error within one LSB (= scale)
        if maxabs > 0:
            assert abs(q * scale - xd) <= scale * (1 + 1e-9)
            assert q == math.floor(xd * 127.0 / maxabs)
        else:
            assert q == 0


@given(
    ch=st.integers(1, 8),
    sr=st.sampled_from([8000, 16000, 22050, 44100, 48000, 96000]),
    bits=st.sampled_from([8, 16, 24, 32]),
    frames=st.integers(0, 10**8),
)
@settings(max_examples=200, deadline=None)
def test_wav_header_synth_parse_roundtrip(ch, sr, bits, frames):
    """parse_wav_header inverts a canonical PCM header for ANY valid
    parameter combination — the pure-Python mirror of what
    synthesize_wav_payloads builds in codegen."""
    import struct

    from hustle_spark.operators.multimodal import parse_wav_header

    ba = ch * bits // 8
    ds = frames * ba
    payload = (
        b"RIFF" + struct.pack("<I", (ds + 36) & 0xFFFFFFFF) + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, ch, sr, sr * ba, ba, bits)
        + b"data" + struct.pack("<I", ds & 0xFFFFFFFF)
    )
    assert parse_wav_header(payload) == (ch, sr, bits, (ds & 0xFFFFFFFF) // ba)


@given(data=st.binary(min_size=0, max_size=64))
@settings(max_examples=300, deadline=None)
def test_wav_header_never_crashes_on_junk(data):
    from hustle_spark.operators.multimodal import parse_wav_header

    r = parse_wav_header(data)
    assert r is None or (isinstance(r, tuple) and len(r) == 4)


@given(w=st.integers(1, 65535), h=st.integers(1, 65535),
       fmt=st.sampled_from(["png", "jpeg", "gif"]))
@settings(max_examples=150, deadline=None)
def test_image_header_synth_parse_roundtrip(w, h, fmt):
    """parse_image_header inverts hand-built PNG/JPEG/GIF headers for
    any dimensions — property twin of the example-based tests."""
    from hustle_spark.operators.multimodal import parse_image_header

    if fmt == "png":
        payload = (
            b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\x0dIHDR"
            + w.to_bytes(4, "big") + h.to_bytes(4, "big")
            + b"\x08\x02\x00\x00\x00" + b"\x00" * 4
        )
    elif fmt == "jpeg":
        payload = (
            b"\xff\xd8\xff\xc0" + (17).to_bytes(2, "big") + b"\x08"
            + h.to_bytes(2, "big") + w.to_bytes(2, "big")
            + b"\x03\x01\x11\x00\x02\x11\x00\x03\x11\x00"
        )
    else:
        payload = b"GIF89a" + w.to_bytes(2, "little") + h.to_bytes(2, "little")
    assert parse_image_header(payload) == (fmt, w, h)


@given(ts=st.sampled_from([600, 1000, 30000, 90000]),
       dur=st.integers(0, 2**32 - 1), version=st.sampled_from([0, 1]))
@settings(max_examples=150, deadline=None)
def test_mp4_mvhd_parse_roundtrip(ts, dur, version):
    from hustle_spark.operators.multimodal import parse_mp4_header

    ftyp = bytes.fromhex("00000014" "66747970" "69736F6D" "00000000" "69736F6D")
    tail = bytes.fromhex(
        "00010000" "0100" "0000" "0000000000000000"
        "000100000000000000000000" "000000000001000000000000"
        "000000000000000040000000"
        "000000000000000000000000" "000000000000000000000000"
        "00000002"
    )
    if version == 0:
        body = b"\x00\x00\x00\x00" * 3 + ts.to_bytes(4, "big") + dur.to_bytes(4, "big")
    else:  # v1: 64-bit ctime/mtime/duration
        body = b"\x01\x00\x00\x00" + b"\x00" * 16 + ts.to_bytes(4, "big") + dur.to_bytes(8, "big")
    mvhd = (len(body) + len(tail) + 8).to_bytes(4, "big") + b"mvhd" + body + tail
    moov = (len(mvhd) + 8).to_bytes(4, "big") + b"moov" + mvhd
    assert parse_mp4_header(ftyp + moov) == (ts, dur)


@given(data=st.binary(min_size=0, max_size=200))
@settings(max_examples=300, deadline=None)
def test_mp4_parse_never_crashes_on_junk(data):
    from hustle_spark.operators.multimodal import parse_mp4_header

    r = parse_mp4_header(data)
    assert r is None or (isinstance(r, tuple) and len(r) == 2)


def test_bpe_apply_merge_property(spark):
    """Property: the Spark greedy merge fold equals the pure-Python
    greedy left-to-right merge on random token sequences drawn from a
    tiny alphabet (maximizing overlap cases like 'a a a')."""
    from hypothesis import given, settings, strategies as st
    from pyspark.sql import functions as F

    from hustle_spark.functions.text import bpe_apply_merge

    tok = st.sampled_from(["a", "b", "c"])

    @settings(max_examples=20, deadline=None)
    @given(
        seqs=st.lists(st.lists(tok, min_size=1, max_size=12), min_size=1, max_size=6),
        pair=st.tuples(tok, tok),
    )
    def check(seqs, pair):
        a, b = pair
        joined = a + "_" + b

        def py_merge(tl):
            acc = []
            for t in tl:
                if acc and acc[-1] == a and t == b:
                    acc[-1] = joined
                else:
                    acc.append(t)
            return acc

        df = spark.createDataFrame(
            [(i, s) for i, s in enumerate(seqs)], "i long, toks array<string>"
        )
        got = {
            r.i: list(r.m)
            for r in df.select(
                "i", bpe_apply_merge(F.col("toks"), a, b, joined).alias("m")
            ).collect()
        }
        for i, s in enumerate(seqs):
            assert got[i] == py_merge(s), (s, a, b, got[i])

    check()


def test_padding_waste_invariants_property(spark):
    """Properties on random corpora: every doc lands in exactly one
    bucket; buckets are contiguous, ordered length ranges (bucket i's
    max <= bucket i+1's min); waste is exactly max*count - sum; and
    equal-length docs never split across buckets."""
    from hypothesis import given, settings, strategies as st

    from hustle_spark.functions.text import padding_waste_by_bucket

    @settings(max_examples=15, deadline=None)
    @given(
        lengths=st.lists(st.integers(1, 40), min_size=1, max_size=60),
        n_buckets=st.sampled_from([1, 2, 4, 8]),
    )
    def check(lengths, n_buckets):
        df = spark.createDataFrame(
            [(i, " ".join(["w"] * n)) for i, n in enumerate(lengths)],
            "doc_id long, text string",
        )
        rows = sorted(
            padding_waste_by_bucket(df, n_buckets=n_buckets).collect(),
            key=lambda r: r.bucket,
        )
        assert sum(r.n_docs for r in rows) == len(lengths)
        for r in rows:
            assert r.pad_waste == r.max_tokens * r.n_docs - r.sum_tokens
            assert r.min_tokens <= r.max_tokens
        for lo, hi in zip(rows, rows[1:]):
            assert lo.max_tokens < hi.min_tokens  # contiguous, disjoint ranges

    check()


def test_unicode_repair_cascade_counts_original_only(spark):
    """ADVICE r9 #1 regression: text 'â€' + ldquo-artifact. In the old
    artifact-list order the ldquo repair emitted U+201C, completing the
    en-dash artifact, and the chain fired TWICE while the oracle counts
    ONE occurrence in the original text. The cascade-safe chain order
    (en-dash before ldquo, proven by the import-time assertion) makes
    the count exactly count-on-original; the manufactured artifact is
    deliberately left in the text — identically in both engines."""
    from hustle_spark.functions import text as TX

    loaded = "â€" + "â€œ" + " tail"
    out = TX.unicode_repair(
        spark.createDataFrame([(1, loaded)], "doc_id long, text string")
    ).collect()[0]
    assert out.n_mojibake_fixed == 1  # was 2 under the cascading order
    # the repair manufactures the en-dash artifact and leaves it
    assert out.text == "â€“ tail"
    ref = loaded
    for a, f in TX.MOJIBAKE_REPAIRS:
        ref = ref.replace(a, f)
    assert out.text == ref  # list order == Spark's stage-split order


@settings(max_examples=15, deadline=None)
@given(s=text_strat, picks=st.lists(st.integers(0, 14), max_size=4))
def test_unicode_repair_matches_python_reference(s, picks, spark):
    """unicode_repair vs an independent pure-Python replay: inject a
    random selection of mojibake artifacts plus a U+FFFD and a C0
    control into random text; the repaired string and the strip
    counts must match the reference exactly, and re-detection must
    find no replacement chars or controls."""
    import re as _re

    from pyspark.sql import functions as F  # noqa: F401
    from hustle_spark.functions import text as TX

    arts = [TX.MOJIBAKE_ARTIFACTS[i] for i in picks]
    loaded = s + "".join(arts) + "\ufffd mid \x03 tail"
    out = TX.unicode_repair(
        spark.createDataFrame([(1, loaded)], "doc_id long, text string")
    ).collect()[0]

    # pure-Python reference: the same chain order
    ref = loaded
    for a, fixed in TX.MOJIBAKE_REPAIRS:
        ref = ref.replace(a, fixed)
    n_repl = ref.count("\ufffd")
    ref = ref.replace("\ufffd", "")
    n_ctrl = len(_re.findall(r"[\x00-\x08\x0b\x0c\x0e-\x1f]", ref))
    ref = _re.sub(r"[\x00-\x08\x0b\x0c\x0e-\x1f]", "", ref)

    assert out.text == ref
    assert out.n_replacement_stripped == n_repl
    assert out.n_control_stripped == n_ctrl
    # fix count = occurrences in the ORIGINAL text (no artifact
    # overlaps another and no repair output can form part of a later
    # artifact, so count-on-original == sequential-chain replacements)
    assert out.n_mojibake_fixed == sum(
        loaded.count(a) for a, _ in TX.MOJIBAKE_REPAIRS
    )
    # re-detection on the repaired text: no replacement chars, no
    # controls (mojibake can legitimately survive if hypothesis built
    # an artifact by CONCATENATION across the random text boundary —
    # the operator and reference agree on the string either way)
    det = TX.unicode_hygiene_stats(
        spark.createDataFrame([(1, ref)], "doc_id long, text string")
    ).collect()[0]
    assert det.n_replacement == 0 and det.n_control == 0
