"""Unit tests for the Gopher quality/repetition rules and corpus-level
line dedup — hand-built micro-cases with closed-form expectations,
independent of the DuckDB differential (tests/test_candidates.py)."""

from pyspark.sql import functions as F

from hustle_spark.functions import text as TX
from hustle_spark.operators import dedup as DD


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


class TestGopherQuality:
    def test_rules_on_handbuilt_docs(self, spark):
        # doc 77: 77%7=0, 77%5=2, 77%11=0 -> dirty adds ' # #' + ' …'
        # base: 60 alphabetic 4-char words incl. two stopwords.
        words = ["word"] * 58 + ["the", "data"]
        rows = [(77, " ".join(words))]
        out = TX.gopher_quality_stats(_docs(spark, rows)).collect()[0]
        assert out.n_words == 63  # 60 + 2 '#' + 1 '…'
        # word chars: 58*4 + 3 + 4 + 2*1 + 1 = 242
        assert out.mean_wlen_micro == 242 * 1000000 // 63
        assert out.n_stop_distinct == 2
        # symbols: 2 '#' + 1 '…' = 3; 10*3 <= 63 passes
        assert out.symbol_ratio_micro == 3 * 1000000 // 63
        # alpha words: 60 of 63 -> 5*60 >= 4*63 passes
        assert out.frac_alpha_micro == 60 * 1000000 // 63
        assert bool(out.passes) is True

    def test_short_doc_fails_word_count(self, spark):
        rows = [(1, "the a value data tiny")]
        out = TX.gopher_quality_stats(_docs(spark, rows)).collect()[0]
        assert out.n_words < 50 and bool(out.passes) is False

    def test_stopword_rule_fails_without_two(self, spark):
        rows = [(1, " ".join(["word"] * 60))]
        out = TX.gopher_quality_stats(_docs(spark, rows)).collect()[0]
        assert out.n_stop_distinct == 0 and bool(out.passes) is False


class TestGopherRepetition:
    def test_doubled_block_is_fully_duplicated(self, spark):
        # doc 10: 10%5==0 -> r=2; 10%3=1 -> 4-token lines.
        # 8 distinct tokens -> 2 base lines, every line duplicated at r=2.
        rows = [(10, "aa bb cc dd ee ff gg hh")]
        out = TX.gopher_repetition_stats(_docs(spark, rows)).collect()[0]
        assert out.n_blocks == 2
        assert out.n_lines == 4
        assert out.dup_line_frac_micro == 1000000
        assert out.dup_line_char_frac_micro == 1000000
        assert bool(out.is_repetitive) is True

    def test_distinct_single_block_not_flagged(self, spark):
        # doc 1: r=1, 4-token lines, all lines/grams distinct.
        rows = [(1, "aa bb cc dd ee ff gg hh ii jj kk ll")]
        out = TX.gopher_repetition_stats(_docs(spark, rows)).collect()[0]
        assert out.n_blocks == 1
        assert out.n_lines == 3
        assert out.dup_line_frac_micro == 0
        assert out.dup5_char_frac_micro == 0
        assert bool(out.is_repetitive) is False

    def test_top3_coverage_closed_form(self, spark):
        # doc 1: "x y z" repeated 4x -> top 3-gram "x y z" (5 chars)
        # occurs 4 times among 10 grams; text chars = 23.
        rows = [(1, "x y z x y z x y z x y z")]
        out = TX.gopher_repetition_stats(_docs(spark, rows)).collect()[0]
        assert out.top3_char_cov_micro == 4 * 5 * 1000000 // 23
        assert bool(out.is_repetitive) is True  # 20/23 > 18%


class TestLineDedupKeepFirst:
    def test_keep_first_across_docs(self, spark):
        # 3-token lines; doc 2 repeats doc 1's first line verbatim.
        rows = [
            (1, "aa bb cc dd ee ff"),
            (2, "aa bb cc gg hh ii"),
        ]
        out = {
            r.doc_id: r
            for r in DD.line_dedup_keep_first(_docs(spark, rows)).collect()
        }
        assert out[1].n_lines == 2 and out[1].n_kept == 2
        assert out[2].n_lines == 2 and out[2].n_kept == 1
        assert out[2].kept_chars == len("gg hh ii")

    def test_within_doc_duplicate_dropped(self, spark):
        rows = [(1, "aa bb cc aa bb cc dd ee ff")]
        out = DD.line_dedup_keep_first(_docs(spark, rows)).collect()[0]
        assert out.n_lines == 3 and out.n_kept == 2

    def test_digest_matches_reassembled_text(self, spark):
        rows = [(1, "aa bb cc dd ee ff"), (2, "aa bb cc gg hh ii")]
        out = {
            r.doc_id: r
            for r in DD.line_dedup_keep_first(_docs(spark, rows)).collect()
        }
        expect = (
            spark.range(1)
            .select(
                F.md5(F.lit("aa bb cc dd ee ff")).alias("a"),
                F.md5(F.lit("gg hh ii")).alias("b"),
            )
            .collect()[0]
        )
        assert out[1].kept_md5 == expect.a
        assert out[2].kept_md5 == expect.b

    def test_all_lines_dropped_yields_empty_digest(self, spark):
        rows = [(1, "aa bb cc"), (2, "aa bb cc")]
        out = {
            r.doc_id: r
            for r in DD.line_dedup_keep_first(_docs(spark, rows)).collect()
        }
        assert out[2].n_kept == 0 and out[2].kept_chars == 0
        empty_md5 = (
            spark.range(1).select(F.md5(F.lit("")).alias("h")).collect()[0].h
        )
        assert out[2].kept_md5 == empty_md5


class TestQualityClassifier:
    @staticmethod
    def _ref_margin(text):
        """Pure-Python replay of the hash + weight model."""
        import hashlib

        toks = text.split()
        feats = list(toks) + [
            " ".join(toks[i : i + 2]) for i in range(len(toks) - 1)
        ]
        if len(toks) < 2:
            feats = list(toks) + [" ".join(toks)]
        ws = []
        for f in feats:
            b = int(hashlib.md5(f.encode()).hexdigest()[:3], 16) % 4096
            ws.append((b * 2654435761) % 1001 - 500)
        return len(feats), sum(1 for w in ws if w > 0), sum(ws)

    def test_matches_pure_python_model(self, spark):
        rows = [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "table scan merge table scan merge"),
            (3, "one"),
        ]
        out = {
            r.doc_id: r
            for r in TX.quality_classifier_scores(_docs(spark, rows)).collect()
        }
        for doc_id, text in rows:
            n, npos, margin = self._ref_margin(text)
            got = out[doc_id]
            assert (got.n_feats, got.n_pos_feats, got.margin) == (
                n,
                npos,
                margin,
            ), doc_id
            assert bool(got.quality_ok) is (margin > 0)


class TestImageAHash:
    def test_ahash_matches_pure_python_model(self, spark):
        """Replay the generative BMP pixel model in pure Python and
        check the decoded aHash bit-for-bit for a handful of ids."""
        from hustle_spark.operators import multimodal as M

        d = spark.createDataFrame(
            [(i,) for i in range(12)], "doc_id bigint"
        )
        media = M.synthesize_bmp_payloads(d, "doc_id")
        got = {r.media_id: r for r in M.decode_image_ahash(media).collect()}
        for mid in range(12):
            w, h = (mid % 4 + 1) * 4, mid % 6 + 1
            vals = []
            for j in range(8):
                y = j * h // 8
                for i in range(8):
                    x = i * w // 8
                    b = (mid + x + y) % 256
                    g = (mid * 3 + x * 7) % 256
                    r = (mid * 5 + y * 11) % 256
                    vals.append((b + g + r) // 3)
            t = sum(vals)
            bits = "".join("1" if 64 * v > t else "0" for v in vals)
            row = got[mid]
            assert (row.width, row.height) == (w, h)
            assert row.ahash_bits == bits, mid
            assert row.n_set_bits == bits.count("1")
            assert bool(row.ok) is True

    def test_ahash_garbage_payload_not_ok(self, spark):
        from hustle_spark.operators import multimodal as M

        media = spark.createDataFrame(
            [(1, bytearray(b"not an image"), "x", None)],
            "media_id long, payload binary, media_type string, meta string",
        )
        row = M.decode_image_ahash(media).collect()[0]
        assert bool(row.ok) is False and row.ahash_bits == ""


class TestNullText:
    def test_all_new_helpers_handle_null_text(self, spark):
        rows = [(7, None), (8, "aa bb cc dd ee")]
        d = _docs(spark, rows)
        q = {r.doc_id: r for r in TX.gopher_quality_stats(d).collect()}
        assert q[7].n_words >= 1 and bool(q[7].passes) is False
        rep = {r.doc_id: r for r in TX.gopher_repetition_stats(d).collect()}
        assert rep[7].dup5_char_frac_micro == 0
        led = {r.doc_id: r for r in DD.line_dedup_keep_first(d).collect()}
        assert led[7].n_lines == 1  # '' folds to one empty line
        cls = {
            r.doc_id: r for r in TX.quality_classifier_scores(d).collect()
        }
        assert cls[7].n_feats >= 1 and cls[8].n_feats == 9


def test_quality_classifier_weight_swap_seam(spark):
    """r10: the weight-swap seam quality_classifier_scores documents,
    exercised end-to-end (the PSL swap-path precedent). Fed the
    closed-form stand-in's OWN (bucket, weight) table, the
    table-driven variant must be bit-identical to the inline path —
    proving a trained fastText/regression export changes SCORES only,
    never the hashing/pooling machinery. A uniformly +1-shifted table
    must then move every margin by exactly n_feats (the model is
    linear in the weights) with feature counts untouched."""
    from hustle_spark.functions import text as TX

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "table scan merge table scan merge table scan"),
        (3, "single"),
        (4, None),
        (5, ""),
        (6, "a b c d e f g h i j k l m n o p q r s t"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    inline = sorted(
        tuple(r) for r in TX.quality_classifier_scores(df).collect()
    )
    table = [(b, (b * 2654435761) % 1001 - 500) for b in range(4096)]
    wdf = spark.createDataFrame(table, "bucket int, weight long")
    swapped = sorted(
        tuple(r)
        for r in TX.quality_classifier_scores_weighted(df, wdf).collect()
    )
    assert swapped == inline  # bit-identical under the stand-in's table

    shifted = spark.createDataFrame(
        [(b, w + 1) for b, w in table], "bucket int, weight long"
    )
    sh = {
        r.doc_id: r
        for r in TX.quality_classifier_scores_weighted(df, shifted).collect()
    }
    for doc_id, n_feats, _npos, margin, _ok in inline:
        assert sh[doc_id].n_feats == n_feats          # machinery untouched
        assert sh[doc_id].margin == margin + n_feats  # linear in weights


def test_unicode_repair_table_swap_seam(spark):
    """r10: unicode_repair's repair-table swap seam, exercised. A
    fuller table (the default + the ellipsis artifact ftfy's complete
    cp1252 map carries) must repair strictly more while leaving every
    default-artifact repair byte-identical; a table violating the
    chain contracts (a cascade) must fail loudly at plan build."""
    import pytest as _pytest

    from hustle_spark.functions import text as TX

    ell = "â€¦"  # 'â€¦' = U+2026 mis-decoded
    fuller = (ell, "…")
    assert fuller not in TX.MOJIBAKE_REPAIRS
    table = (fuller,) + TX.MOJIBAKE_REPAIRS  # 3-char leads: stage order ok

    df = spark.createDataFrame(
        [(1, "wait" + ell + " cafÃ© end")],
        "doc_id long, text string",
    )
    base = TX.unicode_repair(df).collect()[0]
    swapped = TX.unicode_repair(df, repairs=table).collect()[0]
    # default: only the e-acute artifact repairs; ellipsis survives
    assert base.n_mojibake_fixed == 1 and ell in base.text
    # fuller table: both repair — strictly more, nothing else moves
    assert swapped.n_mojibake_fixed == 2
    assert swapped.text == "wait… café end"
    # a cascading table fails loudly: a fix char inside a later artifact
    bad = (("â€œ", "“"),  # ldquo BEFORE endash
           ("â€“", "–"))
    with _pytest.raises(AssertionError, match="cascade"):
        TX.unicode_repair(df, repairs=bad)


def test_bpe_merges_txt_loader_roundtrip(spark, tmp_path):
    """VERDICT r11 directive #5: the merges.txt seam made executable.
    A corpus-LEARNED merge list exported to the public merges.txt
    format and loaded back must encode the gate corpus IDENTICALLY to
    the inline list (loaded ≡ inline — the PSL-swap precedent);
    malformed lines fail loudly."""
    import pytest

    from hustle_spark.functions import text as TX

    rows = [
        (1, "low lower lowest low low lower"),
        (2, "new newer newest new new newer"),
        (3, None),
        (4, "low new low new low new"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    learned, _ = TX.bpe_learn_merges(df, n_merges=3)
    inline_pairs = [(a, b) for _r, a, b, _c, _t in learned]

    p = tmp_path / "merges.txt"
    TX.dump_bpe_merges(learned, p)
    loaded = TX.load_bpe_merges(p)
    assert loaded == inline_pairs  # format fidelity

    enc_inline = sorted(
        (r.doc_id, tuple(r.bpe_tokens))
        for r in TX.bpe_encode(df, inline_pairs).collect()
    )
    enc_loaded = sorted(
        (r.doc_id, tuple(r.bpe_tokens))
        for r in TX.bpe_encode(df, loaded).collect()
    )
    assert enc_loaded == enc_inline  # swap ≡ inline on the corpus

    # first-line #version header / blanks tolerated; malformed fatal
    assert TX.load_bpe_merges(
        ["#version: 0.2", "", "a b"]
    ) == [("a", "b")]
    with pytest.raises(ValueError, match="line 2"):
        TX.load_bpe_merges(["#version: 0.2", "a b c"])
    with pytest.raises(ValueError, match="contains a space"):
        TX.dump_bpe_merges([("a b", "c")])
    with pytest.raises(ValueError, match="empty"):
        TX.dump_bpe_merges([("a", "")])
    # '#' is a legitimate merge TOKEN (code corpora), not a comment:
    # only the first-line '#version' header is skipped, and the
    # dump/load inverse holds for '#'-bearing pairs (review finding
    # r12: the old any-line '#' skip silently dropped these)
    hash_pairs = [("#", "#"), ("#_#", "include"), ("a", "b")]
    assert TX.load_bpe_merges(
        TX.dump_bpe_merges(hash_pairs).splitlines()
    ) == hash_pairs
    # ADVICE r12: common tokenizer tooling tolerates a leading blank
    # line or a UTF-8 BOM before the header — the header is skipped on
    # the first NON-BLANK line, not raw line 1; single-header
    # strictness otherwise (a second '#version' line is a malformed
    # merge, fatal)
    assert TX.load_bpe_merges(["", "#version: 0.2", "a b"]) == [("a", "b")]
    assert TX.load_bpe_merges(
        ["\ufeff#version: 0.2", "a b"]
    ) == [("a", "b")]
    # single-header strictness: only the FIRST content line can be a
    # header; a second '#version: 0.2' is two space-separated tokens
    # and parses as a (bogus) merge pair rather than being skipped
    assert TX.load_bpe_merges(
        ["#version: 0.2", "#version: 0.2", "a b"]
    ) == [("#version:", "0.2"), ("a", "b")]
    # a '#'-token merge on the first content line is NOT a header
    assert TX.load_bpe_merges(["", "# #", "a b"]) == [("#", "#"), ("a", "b")]


def test_classifier_weights_loader_swap_equals_inline(spark, tmp_path):
    """VERDICT r11 directive #5: the trained-weights FILE seam. The
    closed-form stand-in's table exported to TSV and loaded back must
    drive quality_classifier_scores_weighted bit-identically to the
    inline path; duplicate / out-of-range buckets fail at load."""
    import pytest

    from hustle_spark.functions import text as TX

    df = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "table scan merge"), (3, None)],
        "doc_id long, text string",
    )
    table = [(b, (b * 2654435761) % 1001 - 500) for b in range(4096)]
    p = tmp_path / "weights.tsv"
    p.write_text(
        "# trained export\n"
        + "\n".join(f"{b}\t{w}" for b, w in table) + "\n"
    )
    wdf = TX.load_classifier_weights(spark, p)
    assert wdf.count() == 4096
    inline = sorted(
        tuple(r) for r in TX.quality_classifier_scores(df).collect()
    )
    swapped = sorted(
        tuple(r)
        for r in TX.quality_classifier_scores_weighted(df, wdf).collect()
    )
    assert swapped == inline  # file-loaded ≡ inline

    dup = tmp_path / "dup.tsv"
    dup.write_text("7\t1\n7\t2\n")
    with pytest.raises(ValueError, match="duplicate bucket"):
        TX.load_classifier_weights(spark, dup)
    oob = tmp_path / "oob.tsv"
    oob.write_text("4096\t1\n")
    with pytest.raises(ValueError, match="out of range"):
        TX.load_classifier_weights(spark, oob)
    # a row that fails the integer cast — header line, float bucket —
    # must FAIL the load, never be silently dropped (review finding
    # r12: the old isNotNull filter swallowed them before validation)
    hdr = tmp_path / "hdr.tsv"
    hdr.write_text("bucket\tweight\n7\t1\n")
    with pytest.raises(ValueError, match="unparseable"):
        TX.load_classifier_weights(spark, hdr)
    flt = tmp_path / "flt.tsv"
    flt.write_text("12.0\t5\n")
    with pytest.raises(ValueError, match="unparseable"):
        TX.load_classifier_weights(spark, flt)


def test_lang_profiles_loader_swap_equals_inline(spark, tmp_path):
    """VERDICT r12 directive #6: the fastText/CLD3 profile FILE seam.
    A corpus-fit trigram profile exported to TSV (and parquet) and
    loaded back must drive lang_id_trigram IDENTICALLY to the inline
    frame on every doc; malformed / ambiguous exports fail at load."""
    import pytest

    from hustle_spark.functions import text as TX

    train = spark.createDataFrame(
        [
            ("en", "the value of the table and the data"),
            ("en", "the quick brown fox and the lazy dog"),
            ("fr", "le chat et la table des valeurs une fois"),
            ("fr", "les données et le calcul des tables"),
        ],
        "lang string, text string",
    )
    profiles = TX.lang_profiles_trigram(train, top_k=16)

    docs = spark.createDataFrame(
        [
            (1, "the table of data and the value"),
            (2, "le calcul des tables et la valeur"),
            (3, "zz"),  # too short for any trigram -> 'und'
            (4, None),
        ],
        "doc_id long, text string",
    )
    inline = sorted(
        (r.doc_id, r.guess)
        for r in TX.lang_id_trigram(docs, profiles).collect()
    )
    assert ("3", "und") not in inline  # sanity: typed ids
    assert dict(inline)[3] == "und"

    p = tmp_path / "profiles.tsv"
    TX.dump_lang_profiles(profiles, p)
    loaded = TX.load_lang_profiles(spark, p)
    swapped = sorted(
        (r.doc_id, r.guess)
        for r in TX.lang_id_trigram(docs, loaded).collect()
    )
    assert swapped == inline  # file-loaded ≡ inline

    # parquet flavor of the same export
    pq = str(tmp_path / "profiles.parquet")
    profiles.write.mode("overwrite").parquet(pq)
    swapped_pq = sorted(
        (r.doc_id, r.guess)
        for r in TX.lang_id_trigram(
            docs, TX.load_lang_profiles(spark, pq)
        ).collect()
    )
    assert swapped_pq == inline

    # loader strictness: duplicate feature, non-positive weight,
    # non-integer weight (header line), NULL field
    dup = tmp_path / "dup.tsv"
    dup.write_text("en\tthe\t5\nen\tthe\t3\n")
    with pytest.raises(ValueError, match="duplicate"):
        TX.load_lang_profiles(spark, dup)
    neg = tmp_path / "neg.tsv"
    neg.write_text("en\tthe\t0\n")
    with pytest.raises(ValueError, match="non-positive"):
        TX.load_lang_profiles(spark, neg)
    hdr = tmp_path / "hdr.tsv"
    hdr.write_text("lang\ttri\tweight\nen\tthe\t5\n")
    with pytest.raises(ValueError, match="unparseable"):
        TX.load_lang_profiles(spark, hdr)
    # dump refuses a tab-bearing trigram (not representable)
    bad = spark.createDataFrame(
        [("en", "a\tb", 5)], "lang string, tri string, weight bigint"
    )
    with pytest.raises(ValueError, match="tab"):
        TX.dump_lang_profiles(bad)


def test_dsir_weights_seam_loaded_equals_inline(spark, tmp_path):
    """The DSIR trained-weights FILE seam (the executable-seam
    program continued): dsir_fit_weights -> TSV ->
    load_classifier_weights(n_buckets=1024) -> dsir_score_with_weights
    must reproduce dsir_importance's one-shot output bit-for-bit on
    the raw pool (loaded ≡ inline), on both a micro corpus and the
    gate corpus."""
    from hustle_spark.functions import text as TX

    def check(df, is_target, tag):
        inline = sorted(
            tuple(r) for r in TX.dsir_importance(df, is_target, k=5).collect()
        )
        wt = TX.dsir_fit_weights(df, is_target)
        p = tmp_path / f"dsir_{tag}.tsv"
        rows = wt.collect()
        p.write_text(
            "# dsir export\n"
            + "\n".join(f"{r['bucket']}\t{r['weight']}" for r in rows)
            + "\n"
        )
        loaded = TX.load_classifier_weights(spark, p, n_buckets=1024)
        swapped = sorted(
            tuple(r)
            for r in TX.dsir_score_with_weights(
                df.filter(~is_target), loaded, k=5
            ).collect()
        )
        assert swapped == inline, tag

    micro = spark.createDataFrame(
        [
            (1, True, "the table of values and data"),
            (2, True, "the data in the table"),
            (10, False, "the table of the data"),
            (11, False, "le chat mange le poisson"),
            (12, False, "unrelated words entirely here"),
            (13, False, None),
        ],
        "doc_id bigint, tgt boolean, text string",
    )
    check(micro, F.col("tgt"), "micro")

    gate = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    check(gate, F.col("lang") == "en", "gate")


def test_lang_profiles_quote_backslash_trigrams_roundtrip(spark, tmp_path):
    """ADVICE r13 (medium): trigrams are arbitrary 3-char substrings
    of lower(text) and can carry '"' or '\\'. The old spark.read.csv
    load path applied default quote/escape processing and silently
    mis-parsed them — this reproduces the pre-fix corruption shapes
    and pins the manual-parse round-trip exactly."""
    from hustle_spark.functions import text as TX

    profiles = spark.createDataFrame(
        [
            ("en", '"ab', 9),   # quote-leading: old reader ate the quote
            ("en", 'a"b', 8),   # embedded quote
            ("en", "a\\b", 7),  # backslash: old reader treated as escape
            ("en", '\\"x', 6),  # escape-then-quote combo
            ("fr", '"""', 5),   # all-quotes trigram
            ("fr", "###", 4),   # '#' inside a FIELD is data, not comment
            ("fr", "the", 3),   # plain control row
        ],
        "lang string, tri string, weight bigint",
    )
    p = tmp_path / "hostile.tsv"
    TX.dump_lang_profiles(profiles, p)
    loaded = sorted(
        tuple(r) for r in TX.load_lang_profiles(spark, p).collect()
    )
    assert loaded == sorted(tuple(r) for r in profiles.collect())

    # parquet branch: NULL weight must raise the descriptive error,
    # not a bare int(None) TypeError (ADVICE r13 low)
    import pytest

    pq = str(tmp_path / "nullwt.parquet")
    spark.createDataFrame(
        [("en", "the", None)], "lang string, tri string, weight bigint"
    ).write.mode("overwrite").parquet(pq)
    with pytest.raises(ValueError, match="NULL field"):
        TX.load_lang_profiles(spark, pq)

    # dump refuses a line-structural lang field (tab / '#'-leading)
    with pytest.raises(ValueError, match="lang"):
        TX.dump_lang_profiles(
            spark.createDataFrame(
                [("e\tn", "the", 5)],
                "lang string, tri string, weight bigint",
            )
        )
    with pytest.raises(ValueError, match="lang"):
        TX.dump_lang_profiles(
            spark.createDataFrame(
                [("#en", "the", 5)],
                "lang string, tri string, weight bigint",
            )
        )


def test_hf_tokenizer_pair_loaded_equals_inline(spark, tmp_path):
    """VERDICT r13 directive #7a: the vocab.json + merges.txt
    two-file tokenizer seam. A derived (vocab, merges) pair
    round-tripped through both files must encode AND id-map a corpus
    identically to the inline pair; inconsistent pairs fail at load
    or at dump, never silently."""
    import json

    import pytest

    from hustle_spark.functions import text as TX

    merges = [("aa", "bb"), ("aa_bb", "cc")]
    vocab = TX.hf_vocab_from_merges(merges)
    # deterministic GPT-2-style assignment: specials, base symbols in
    # first-appearance order, products in merge order
    assert vocab == {
        "<unk>": 0, "aa": 1, "bb": 2, "cc": 3, "aa_bb": 4,
        "aa_bb_cc": 5,
    }

    vp, mp = tmp_path / "vocab.json", tmp_path / "merges.txt"
    TX.dump_hf_tokenizer(vocab, merges, vp, mp)
    lv, lm = TX.load_hf_tokenizer(vp, mp)
    assert lv == vocab and lm == merges

    # loaded ≡ inline on a micro corpus, through encode + id-map
    docs = spark.createDataFrame(
        [(1, "aa bb cc dd"), (2, "aa bb"), (3, None)],
        "doc_id bigint, text string",
    )

    def encode_ids(v, m):
        enc = TX.bpe_encode(docs, merges=m)
        rows = enc.select("doc_id", "bpe_tokens").collect()
        return {
            r.doc_id: [v.get(t, -1) for t in r.bpe_tokens] for r in rows
        }

    assert encode_ids(lv, lm) == encode_ids(vocab, merges)
    # both merges chained: 'aa bb cc' -> aa_bb_cc (id 5); 'dd' -> -1
    assert encode_ids(lv, lm)[1] == [5, -1]

    # strictness: duplicate id, gapped ids on dump, missing product,
    # missing operand, bad JSON, empty token
    dup = tmp_path / "dup.json"
    dup.write_text('{"a": 1, "b": 1}')
    with pytest.raises(ValueError, match="duplicate vocab id"):
        TX.load_hf_tokenizer(dup, mp)
    with pytest.raises(ValueError, match="0..len-1"):
        TX.dump_hf_tokenizer({"a": 0, "b": 2}, [], vp, mp)
    with pytest.raises(ValueError, match="no vocab id"):
        TX.dump_hf_tokenizer({"a": 0}, [("a", "a")], vp, mp)
    nomrg = tmp_path / "nomrg.json"
    nomrg.write_text('{"aa": 0}')
    with pytest.raises(ValueError, match="no vocab id"):
        TX.load_hf_tokenizer(nomrg, mp)
    badj = tmp_path / "bad.json"
    badj.write_text("{not json")
    with pytest.raises(ValueError, match="not valid JSON"):
        TX.load_hf_tokenizer(badj, mp)
    emptyt = tmp_path / "empty.json"
    emptyt.write_text(json.dumps({"": 0}))
    with pytest.raises(ValueError, match="empty or non-string"):
        TX.load_hf_tokenizer(emptyt, mp)
    # bool ids are not integer ids (Python bool subclasses int)
    boolid = tmp_path / "bool.json"
    boolid.write_text('{"a": true}')
    with pytest.raises(ValueError, match="non-negative integer"):
        TX.load_hf_tokenizer(boolid, mp)


def test_dsir_score_with_weights_partial_table_total_frame(spark):
    """ADVICE r13 (low): a weight table that covers only SOME buckets
    (the advertised partial-export case) must still emit a TOTAL
    frame — a doc whose features all miss the table appears with
    score 0 and its full pool-side n_feats, not silently vanish."""
    from hustle_spark.functions import text as TX

    pool = spark.createDataFrame(
        [(1, "aa bb"), (2, "zz yy"), (3, None)],
        "doc_id bigint, text string",
    )
    # an empty weight table: NO bucket matches, every doc must survive
    empty = spark.createDataFrame([], "bucket int, weight bigint")
    out = {
        r.doc_id: r
        for r in TX.dsir_score_with_weights(pool, empty, k=2).collect()
    }
    assert set(out) == {1, 2, 3}
    assert all(r.score == 0 for r in out.values())
    # n_feats counted from the pool side: 2 unigrams + 1 bigram = 3
    assert out[1].n_feats == 3 and out[2].n_feats == 3
    # NULL text -> [''] -> one unigram + one degenerate bigram window
    # (the repo's split('')->[''] convention, same as dsir_importance)
    assert out[3].n_feats == 2
    # rank/selected still total and deterministic (score ties -> id)
    assert sorted(r.rnk for r in out.values()) == [0, 1, 2]
    assert sum(1 for r in out.values() if r.selected) == 2


class TestSoftDedupWeights:
    def test_weights_closed_form(self, spark):
        """Two exact copies share a cluster: size 2, weight 500000
        each, the min-id copy canonical; singletons carry the full
        1e6. Whitespace-normalization folds doc 4 into doc 1's
        cluster (the fingerprint contract)."""
        rows = [
            (1, "aa bb cc"),
            (2, "aa bb cc"),
            (3, "dd ee ff"),
            (4, "  AA   bb Cc "),  # normalizes to doc 1's content
        ]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        out = {
            r.doc_id: r
            for r in DD.soft_dedup_weights(df).collect()
        }
        assert out[1].cluster_size == 3 and out[1].weight_u == 333333
        assert out[2].cluster_size == 3 and out[2].weight_u == 333333
        assert out[4].cluster_size == 3
        assert out[3].cluster_size == 1 and out[3].weight_u == 1000000
        assert bool(out[1].is_canonical) is True
        assert bool(out[2].is_canonical) is False
        assert bool(out[4].is_canonical) is False
        assert bool(out[3].is_canonical) is True
        # cluster weight mass ~1e6 regardless of depth (the SoftDedup
        # conservation property, up to integer floor)
        assert 3 * out[1].weight_u <= 1000000 < 3 * (out[1].weight_u + 1)

    def test_fuzzy_weights_from_pairs_closed_form(self, spark):
        """A pair chain (1,2),(2,3) closes transitively into one
        3-cluster (min-label id, weight 333333 each, min-id
        canonical); unpaired doc 4 is a singleton at full weight.
        The primitive accepts ANY (a, b) pair frame."""
        docs = spark.createDataFrame(
            [(i,) for i in (1, 2, 3, 4)], "doc_id bigint"
        )
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3)], "a bigint, b bigint"
        )
        out = {
            r.doc_id: r
            for r in DD.soft_weights_from_pairs(docs, pairs).collect()
        }
        assert all(out[i].cluster_id == 1 for i in (1, 2, 3))
        assert all(out[i].cluster_size == 3 for i in (1, 2, 3))
        assert all(out[i].weight_u == 333333 for i in (1, 2, 3))
        assert bool(out[1].is_canonical) is True
        assert bool(out[2].is_canonical) is False
        assert out[4].cluster_id == 4 and out[4].cluster_size == 1
        assert out[4].weight_u == 1000000
        assert bool(out[4].is_canonical) is True

    def test_weights_from_pairs_matches_union_find_property(self, spark):
        """Property (hypothesis): on ANY random pair graph, the Spark
        transitive closure + weighting agrees with a pure-Python
        union-find reference on every cluster id (min member), size,
        weight, and canonical flag. One Spark run per drawn graph is
        expensive, so the strategy draws a batch of graphs and the
        test unions them under disjoint id ranges into ONE job."""
        from hypothesis import given, settings, strategies as st

        @settings(max_examples=1, deadline=None)
        @given(
            graphs=st.lists(
                st.tuples(
                    st.integers(2, 12),  # n ids in this graph
                    st.lists(
                        st.tuples(st.integers(0, 11), st.integers(0, 11)),
                        max_size=14,
                    ),
                ),
                min_size=6,
                max_size=6,
            )
        )
        def check(graphs):
            docs_rows, pair_rows, expect = [], [], {}
            base = 0
            for n, raw_edges in graphs:
                ids = list(range(base, base + n))
                edges = [
                    (base + a % n, base + b % n)
                    for a, b in raw_edges
                    if a % n != b % n
                ]
                # pure-Python union-find reference
                parent = {i: i for i in ids}

                def find(x):
                    while parent[x] != x:
                        parent[x] = parent[parent[x]]
                        x = parent[x]
                    return x

                for a, b in edges:
                    ra, rb = find(a), find(b)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
                members = {}
                for i in ids:
                    members.setdefault(find(i), []).append(i)
                for root, mem in members.items():
                    lab = min(mem)
                    for i in mem:
                        expect[i] = (
                            lab, len(mem), 1000000 // len(mem), i == lab
                        )
                docs_rows += [(i,) for i in ids]
                pair_rows += edges
                base += n
            docs = spark.createDataFrame(docs_rows, "doc_id bigint")
            pairs = spark.createDataFrame(
                pair_rows or [(0, 0)], "a bigint, b bigint"
            )
            if not pair_rows:
                pairs = pairs.limit(0)
            got = {
                r.doc_id: (
                    r.cluster_id, r.cluster_size, r.weight_u,
                    bool(r.is_canonical),
                )
                for r in DD.soft_weights_from_pairs(docs, pairs).collect()
            }
            assert got == expect

        check()

    def test_fp_len_coarsens_clusters(self, spark):
        """fp_len=1 can only produce 16 clusters — every doc lands in
        one, and weights still sum to ~1e6 per cluster."""
        df = spark.createDataFrame(
            [(i, f"text number {i}") for i in range(64)],
            "doc_id bigint, text string",
        )
        out = DD.soft_dedup_weights(df, fp_len=1).collect()
        assert len(out) == 64
        assert len({r.fp for r in out}) <= 16
        for r in out:
            assert r.weight_u == 1000000 // r.cluster_size


class TestMooreLewisSelection:
    def test_selects_indomain_like_docs(self, spark):
        """Docs phrased in the in-domain model's bigrams must rank
        ahead of general-phrased docs; sub-2-token docs are unscored
        with NULL delta and selected=false."""
        rows = [
            (1, "en", "the table holds the value"),
            (2, "en", "the value of the table"),
            (3, "fr", "le chat mange le poisson"),
            (4, "fr", "le poisson du chat"),
            # test docs: 10 = in-domain phrasing, 11 = general phrasing
            (10, "xx", "the table of the value"),
            (11, "xx", "le chat du poisson"),
            (12, "xx", "one"),
        ]
        df = spark.createDataFrame(
            rows, "doc_id bigint, lang string, text string"
        )
        out = {
            r.doc_id: r
            for r in TX.moore_lewis_scores(
                df,
                F.col("lang") == "en",
                F.col("lang") == "fr",
                top_n=4,
            ).collect()
        }
        assert len(out) == 7
        assert out[10].delta_e6 < out[11].delta_e6
        assert out[12].delta_e6 is None
        assert bool(out[12].selected) is False
        # the 4 smallest deltas are selected — doc 10 must be among
        # them and doc 11 must not out-rank any en-phrased doc
        selected = {d for d, r in out.items() if r.selected}
        assert len(selected) == 4
        assert 10 in selected and 12 not in selected

    def test_delta_matches_pure_python_model(self, spark):
        """Replay the two add-one bigram models in pure Python for one
        doc and check the integer fold bit-for-bit."""
        import math

        rows = [
            (1, "in", "a b a b"),
            (2, "gen", "c d c d"),
            (10, "xx", "a b c"),
        ]
        df = spark.createDataFrame(
            rows, "doc_id bigint, lang string, text string"
        )
        out = {
            r.doc_id: r
            for r in TX.moore_lewis_scores(
                df, F.col("lang") == "in", F.col("lang") == "gen", top_n=1
            ).collect()
        }

        def nll(c12, pc, V):
            return math.floor(-math.log10((c12 + 1) / (pc + V)) * 1000000)

        # in-domain model: bigrams of "a b a b" -> {'a b':2, 'b a':1},
        # pc: a->2, b->1; V=2. general: {'c d':2, 'd c':1}, pc c->2,
        # d->1, V=2. doc 10 bigrams: 'a b', 'b c'.
        sum_in = nll(2, 2, 2) + nll(0, 1, 2)
        sum_gen = nll(0, 0, 2) + nll(0, 0, 2)
        got = out[10]
        assert got.n_bigrams == 2
        assert got.sum_nll_in_e6 == sum_in
        assert got.sum_nll_gen_e6 == sum_gen
        assert got.delta_e6 == sum_in // 2 - sum_gen // 2
