"""Source-connector wrappers (sources/readers.py): declared-schema
semantics — coercion, undeclared-field dropping, empty-export column
reconstruction, binaryFile glob pruning."""

from pyspark.sql import types as T

from hustle_spark.sources.readers import (
    read_binary_files,
    read_csv,
    read_json_events,
    read_parquet_table,
)


def test_read_json_events_drops_undeclared_and_coerces(spark, tmp_path):
    p = tmp_path / "ev.jsonl"
    p.write_text(
        '{"event_id": 1, "value": 2.5, "extra": "dropped"}\n'
        '{"event_id": 2, "value": 3}\n'          # int -> double widening
        '{"event_id": 3, "value": "oops"}\n'     # type mismatch -> null field
        "not json at all\n"                       # malformed -> null row
    )
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    out = read_json_events(spark, str(p), schema)
    assert out.columns == ["event_id", "value"]  # 'extra' dropped
    rows = {r.event_id: r.value for r in out.collect()}
    assert rows[1] == 2.5 and rows[2] == 3.0
    # permissive semantics: a mismatched FIELD nulls (row survives), a
    # malformed LINE null-fills the whole row
    assert rows[3] is None and None in rows


def test_read_csv_declared_schema(spark, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("id;amount\n1;10.5\n2;20\n")
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("amount", T.DoubleType()),
        ]
    )
    out = read_csv(spark, str(p), schema, header=True, delimiter=";")
    assert sorted(map(tuple, out.collect())) == [(1, 10.5), (2, 20.0)]


def test_read_binary_files_glob_prunes(spark, tmp_path):
    (tmp_path / "a.bin").write_bytes(b"\x01\x02\x03")
    (tmp_path / "b.txt").write_text("nope")
    out = read_binary_files(spark, str(tmp_path), glob="*.bin")
    rows = out.collect()
    assert len(rows) == 1
    assert bytes(rows[0].content) == b"\x01\x02\x03"
    assert rows[0].length == 3


def test_read_parquet_table_roundtrip(spark, tmp_path):
    df = spark.range(5).selectExpr("id", "id * 2 as v")
    path = str(tmp_path / "t.parquet")
    df.write.parquet(path)
    back = read_parquet_table(spark, path)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_warc_parser_edges(spark):
    """WARC parser robustness: truncation yields the parseable prefix,
    garbage yields nothing (surfaced as ok=False, never a crash),
    non-HTTP payloads pass through whole with status 0."""
    from hustle_spark.sources.warc import (
        parse_warc_records,
        records_from_payloads,
        synthesize_warc_payloads,
    )

    df = spark.range(7, 8).selectExpr("id as source_id")
    full = bytes(synthesize_warc_payloads(df, "source_id").collect()[0].payload)
    n_full = len(parse_warc_records(full))
    assert n_full == 7 % 3 + 1
    # truncate mid-payload: earlier complete records survive
    assert len(parse_warc_records(full[:-40])) == n_full - 1
    assert parse_warc_records(b"") == []
    assert parse_warc_records(b"not a warc") == []
    assert parse_warc_records(b"WARC/1.0\r\nContent-Length: oops\r\n\r\n") == []

    # a metadata (non-HTTP) record round-trips whole with status 0
    meta = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 11\r\n\r\n"
        b"hello warc\n\r\n\r\n"
    )
    m = spark.createDataFrame([(1, bytearray(meta)), (2, bytearray(b"junk"))],
                              "source_id long, payload binary")
    rows = {r.source_id: r for r in records_from_payloads(m).collect()}
    assert rows[1].ok and rows[1].warc_type == "warcinfo"
    assert rows[1].http_status == 0 and rows[1].body == "hello warc\n"
    assert rows[2].ok is False  # unparseable file surfaced, not dropped


def test_read_warc_from_disk(spark, tmp_path):
    """read_warc: binaryFile listing + glob pruning + record explode
    over real files on disk."""
    from hustle_spark.sources.warc import read_warc, synthesize_warc_payloads

    df = spark.range(0, 4).selectExpr("id as source_id")
    for r in synthesize_warc_payloads(df, "source_id").collect():
        (tmp_path / f"part{r.source_id}.warc").write_bytes(bytes(r.payload))
    (tmp_path / "ignore.txt").write_text("not warc")
    out = read_warc(spark, str(tmp_path))
    assert out.count() == sum(i % 3 + 1 for i in range(4))
    assert out.filter("ok = false").count() == 0


def test_warc_framing_is_length_driven():
    """Content-Length framing, not delimiter scanning: a body
    containing CRLFCRLF must not split a record, and multi-byte UTF-8
    bodies frame by OCTET count."""
    from hustle_spark.sources.warc import _http_split, parse_warc_records

    body = b"HTTP/1.1 200 OK\r\nX: y\r\n\r\n<p>a\r\n\r\nb</p>"
    rec = (
        b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: "
        + str(len(body)).encode() + b"\r\n\r\n" + body + b"\r\n\r\n"
    )
    rs = parse_warc_records(rec + rec)
    assert len(rs) == 2
    st, b2 = _http_split(rs[0][1])
    assert st == 200 and b2 == b"<p>a\r\n\r\nb</p>"

    h2 = b"HTTP/1.1 200 OK\r\n\r\n" + "héllo wörld".encode()
    rec2 = (
        b"WARC/1.0\r\nContent-Length: " + str(len(h2)).encode()
        + b"\r\n\r\n" + h2 + b"\r\n\r\n"
    )
    rs2 = parse_warc_records(rec2 + rec)
    assert len(rs2) == 2
    assert _http_split(rs2[0][1])[1].decode() == "héllo wörld"


def test_warc_gzip_members():
    """Multi-member gzip WARC (the Common Crawl wire layout): member
    iteration, non-record-aligned boundaries, truncated/corrupt
    members, and plain-passthrough equivalence."""
    import gzip

    from hustle_spark.sources.warc import _gunzip_members, parse_warc_records

    body = b"HTTP/1.1 200 OK\r\n\r\nhello gzip world"
    rec = (
        b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: "
        + str(len(body)).encode() + b"\r\n\r\n" + body + b"\r\n\r\n"
    )
    plain = rec * 3
    ref = parse_warc_records(plain)
    assert len(ref) == 3

    # one member per record (the real CC layout)
    aligned = b"".join(gzip.compress(rec, mtime=0) for _ in range(3))
    assert parse_warc_records(aligned) == ref

    # members split mid-record (boundaries need not align)
    chunks = [plain[i : i + 37] for i in range(0, len(plain), 37)]
    skewed = b"".join(gzip.compress(c, mtime=0) for c in chunks)
    assert parse_warc_records(skewed) == ref

    # truncated final member: its decompressible prefix, then
    # whole-record truncation -> first two records survive
    cut = aligned[: len(aligned) - 8]
    got = parse_warc_records(cut)
    assert ref[:2] == got[:2] and len(got) >= 2

    # corrupt middle member: parse stops at the corruption point
    m = gzip.compress(rec, mtime=0)
    corrupt = m + b"\x1f\x8b" + b"\x00" * 20 + m
    assert parse_warc_records(corrupt) == ref[:1]

    # raw gunzip on garbage after a full member stops cleanly
    assert _gunzip_members(m + b"trailing junk") == rec


def test_warc_gzip_payloads_roundtrip(spark):
    """gzip_payloads -> records_from_payloads is lossless and
    flag-selective: compressed rows parse identically to plain rows,
    and the flag column is consumed."""
    from hustle_spark.sources.warc import (
        gzip_payloads,
        records_from_payloads,
        synthesize_warc_payloads,
    )
    from pyspark.sql import functions as F

    df = spark.range(0, 6).selectExpr("id as source_id")
    media = synthesize_warc_payloads(df, "source_id")
    mixed = gzip_payloads(
        media.withColumn("__gz", F.col("source_id") % 2 == 1),
        flag_col="__gz",
        member_bytes=100,
    )
    assert mixed.columns == ["source_id", "payload"]
    # odd ids really are gzip on the wire, even ids untouched
    for r in mixed.collect():
        is_gz = bytes(r.payload)[:2] == b"\x1f\x8b"
        assert is_gz == (r.source_id % 2 == 1)
    plain_recs = sorted(
        map(tuple, records_from_payloads(media).collect())
    )
    mixed_recs = sorted(
        map(tuple, records_from_payloads(mixed).collect())
    )
    assert plain_recs == mixed_recs


def test_read_warc_gz_from_disk(spark, tmp_path):
    """A directory mixing .warc and .warc.gz files reads as one
    records frame under the default glob."""
    import gzip

    from hustle_spark.sources.warc import read_warc, synthesize_warc_payloads

    df = spark.range(0, 4).selectExpr("id as source_id")
    for r in synthesize_warc_payloads(df, "source_id").collect():
        raw = bytes(r.payload)
        if r.source_id % 2:
            (tmp_path / f"part{r.source_id}.warc.gz").write_bytes(
                gzip.compress(raw, mtime=0)
            )
        else:
            (tmp_path / f"part{r.source_id}.warc").write_bytes(raw)
    (tmp_path / "ignore.txt").write_text("not warc")
    out = read_warc(spark, str(tmp_path))
    assert out.count() == sum(i % 3 + 1 for i in range(4))
    assert out.filter("ok = false").count() == 0


def test_html_block_extraction_rules(spark):
    """Layout-aware extraction (html_blocks/html_main_text): the
    WSDM'10 rule core keeps long low-link-density blocks and drops
    navigation (pure links), short blocks, and link-heavy 'related'
    chrome; script/style/comment content never leaks; entities decode;
    NULL and empty pages degrade to NULL/zero rows."""
    from pyspark.sql import functions as F

    from hustle_spark.sources.warc import html_blocks, html_main_text

    html = (
        '<html><head><title>T page</title><style>.x{color:red}</style>'
        '</head><body>'
        '<div class="nav"><a href="/">Home</a> <a href="/a">About us</a>'
        '</div>'
        '<p>this is the real main content &amp; body of the page here</p>'
        '<p>too short</p>'
        '<p>see <a href="/x">one two three four five six</a> also here</p>'
        '<script>var x=1;</script><!-- boilerplate --></body></html>'
    )
    df = spark.createDataFrame(
        [(1, html), (2, None), (3, "")], "doc_id long, html string"
    )
    out = {
        r.doc_id: (r.text, r.n_blocks, r.n_kept, r.n_words)
        for r in df.select(
            "doc_id", html_main_text(F.col("html")).alias("e")
        ).select("doc_id", "e.*").collect()
    }
    # only the 11-word 0-link paragraph survives; '&amp;' decoded
    assert out[1] == (
        "this is the real main content & body of the page here", 5, 1, 28
    )
    assert out[2] == (None, None, None, None)
    assert out[3] == ("", 0, 0, 0)
    # per-block features: the nav div is 3 words / 3 link words
    blocks = (
        df.filter("doc_id = 1")
        .select(F.explode(html_blocks(F.col("html"))).alias("b"))
        .select("b.*")
        .collect()
    )
    nav = [b for b in blocks if b.text.startswith("Home")][0]
    assert (nav.n_words, nav.n_link_words) == (3, 3)
    linky = [b for b in blocks if b.text.startswith("see")][0]
    assert (linky.n_words, linky.n_link_words) == (9, 6)
    # thresholds are parameters: loosening both keeps the linky block
    loose = df.filter("doc_id = 1").select(
        html_main_text(F.col("html"), min_words=2,
                       max_link_density=1.0).alias("e")
    ).collect()[0].e
    assert loose.n_kept == 5 and "Home" in loose.text


# --- WebDataset tar shards (sources/tarball.py, r10-cont) ---------------


def test_tar_parses_python_tarfile_output(spark):
    """Our walker must accept archives Python's tarfile writes in
    USTAR format — interop with the real world, not just our synth."""
    import io
    import tarfile

    from hustle_spark.sources.tarball import parse_tar_members

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for name, data in [("3.txt", b"hello tar"), ("3.cls", b"en"),
                           ("4.txt", b""), ("4.cls", b"fr")]:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    got = parse_tar_members(buf.getvalue())
    assert got == [("3.txt", b"hello tar"), ("3.cls", b"en"),
                   ("4.txt", b""), ("4.cls", b"fr")]


def test_tarfile_parses_our_synth(spark):
    import io
    import tarfile

    from hustle_spark.sources.tarball import synthesize_tar_shards

    df = spark.createDataFrame(
        [(1, "alpha beta", "en"), (2, None, None)],
        "doc_id long, text string, lang string",
    )
    [row] = synthesize_tar_shards(df, n_shards=1).collect()
    tf = tarfile.open(fileobj=io.BytesIO(bytes(row.payload)))
    got = {
        m.name: (tf.extractfile(m).read() if m.size else b"")
        for m in tf.getmembers()
    }
    assert got == {"1.txt": b"alpha beta", "1.cls": b"en",
                   "2.txt": b"", "2.cls": b""}


def test_tar_walker_rejects_corruption(spark):
    import io
    import tarfile

    from hustle_spark.sources.tarball import parse_tar_members

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        info = tarfile.TarInfo("x.txt")
        info.size = 5
        tf.addfile(info, io.BytesIO(b"abcde"))
    good = buf.getvalue()
    # flip a header byte: checksum must fail
    bad = bytearray(good)
    bad[0] ^= 0x01
    assert parse_tar_members(bytes(bad)) is None
    # cut the terminator: must not silently succeed
    assert parse_tar_members(good[:512 + 512]) is None
    # empty bytes are NOT a valid tar (no terminator blocks) — same
    # verdict Python tarfile gives (ReadError)
    assert parse_tar_members(b"") is None


# --- ZIP archives (sources/ziparchive.py, r10-cont) ---------------------


def test_zip_parses_python_zipfile_output(spark):
    """Our reader must accept STORED archives Python's zipfile writes
    (including its trailing data descriptors absence and real CRCs)."""
    import io
    import zipfile

    from hustle_spark.sources.ziparchive import parse_zip_members

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", compression=zipfile.ZIP_STORED) as zf:
        zf.writestr("7.txt", b"hello zip")
        zf.writestr("8.txt", b"")
    got = parse_zip_members(buf.getvalue())
    assert got == [("7.txt", b"hello zip"), ("8.txt", b"")]


def test_zipfile_parses_our_synth(spark):
    import io
    import zipfile

    from hustle_spark.sources.ziparchive import synthesize_zip_shards

    df = spark.createDataFrame(
        [(1, "alpha beta"), (2, None)], "doc_id long, text string"
    )
    [row] = synthesize_zip_shards(df, n_shards=1).collect()
    zf = zipfile.ZipFile(io.BytesIO(bytes(row.payload)))
    assert zf.testzip() is None  # every CRC verifies
    assert {i.filename: zf.read(i.filename) for i in zf.infolist()} == {
        "1.txt": b"alpha beta", "2.txt": b""
    }


def test_zip_reader_rejects_corruption_and_compression(spark):
    import io
    import zipfile

    from hustle_spark.sources.ziparchive import parse_zip_members

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", compression=zipfile.ZIP_STORED) as zf:
        zf.writestr("x.txt", b"abcdefgh")
    good = buf.getvalue()
    # flip a content byte: stored CRC no longer matches
    bad = bytearray(good)
    at = good.index(b"abcdefgh")
    bad[at] ^= 0x01
    assert parse_zip_members(bytes(bad)) is None
    # deflate entries: the former documented swap point, now code —
    # zipfile-written ZIP_DEFLATED archives inflate correctly
    buf2 = io.BytesIO()
    with zipfile.ZipFile(buf2, "w", compression=zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("y.txt", b"abcdefgh" * 20)
    assert parse_zip_members(buf2.getvalue()) == [
        ("y.txt", b"abcdefgh" * 20)
    ]
    # a corrupt deflate stream still fails loudly (flip a byte inside
    # the compressed body, offsets intact; zlib error, wrong inflated
    # size, or the CRC gate catches it — all return None)
    deflated = bytearray(buf2.getvalue())
    data_at = deflated.index(b"y.txt") + 5  # first local entry's data
    deflated[data_at + 3] ^= 0xFF
    assert parse_zip_members(bytes(deflated)) is None
    # bzip2 (method 12) stays rejected, not mis-read
    buf3 = io.BytesIO()
    with zipfile.ZipFile(buf3, "w", compression=zipfile.ZIP_BZIP2) as zf:
        zf.writestr("z.txt", b"abcdefgh" * 20)
    assert parse_zip_members(buf3.getvalue()) is None
    assert parse_zip_members(b"") is None
    assert parse_zip_members(good[:20]) is None


def test_tar_zip_parsers_roundtrip_property(spark):
    """Property roundtrip for both container parsers: random member
    names (tar/zip-legal subset) and binary contents written by the
    STDLIB writers must come back byte-identical through our walkers
    — fuzzing the readers against the reference implementations, the
    GIF-vs-reference-encoder precedent applied to containers."""
    import io
    import tarfile
    import zipfile

    from hypothesis import given, settings, strategies as st

    from hustle_spark.sources.tarball import parse_tar_members
    from hustle_spark.sources.ziparchive import parse_zip_members

    name_st = st.from_regex(r"[A-Za-z0-9_\-.]{1,40}", fullmatch=True)
    members_st = st.dictionaries(
        name_st, st.binary(min_size=0, max_size=600), min_size=1, max_size=8
    )

    @settings(max_examples=60, deadline=None)
    @given(members_st)
    def run(members):
        tbuf = io.BytesIO()
        with tarfile.open(fileobj=tbuf, mode="w",
                          format=tarfile.USTAR_FORMAT) as tf:
            for nm, data in members.items():
                info = tarfile.TarInfo(nm)
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
        got_tar = parse_tar_members(tbuf.getvalue())
        assert got_tar is not None and dict(got_tar) == members

        # both methods our reader speaks: STORED and DEFLATED
        for comp in (zipfile.ZIP_STORED, zipfile.ZIP_DEFLATED):
            zbuf = io.BytesIO()
            with zipfile.ZipFile(zbuf, "w", compression=comp) as zf:
                for nm, data in members.items():
                    zf.writestr(nm, data)
            got_zip = parse_zip_members(zbuf.getvalue())
            assert got_zip is not None and dict(got_zip) == members

    run()


def test_tar_streaming_packer_byte_identical_to_codegen(spark, tmp_path):
    """The production streaming packer and the codegen oracle fixture
    must emit byte-identical shards at the same n_shards — one layout,
    two execution shapes (VERDICT r10 directive #3)."""
    import tarfile

    from hustle_spark.sources.tarball import (
        pack_tar_shards_streaming,
        synthesize_tar_shards,
    )

    df = spark.createDataFrame(
        [(i, f"doc {i} body " * (i % 4), ["en", "fr", None][i % 3])
         for i in range(20)],
        "doc_id long, text string, lang string",
    )
    out = tmp_path / "tar_stream"
    rows = {
        r.shard: r
        for r in pack_tar_shards_streaming(
            df, str(out), n_shards=3
        ).collect()
    }
    fixture = {
        p.shard: bytes(p.payload)
        for p in synthesize_tar_shards(df, n_shards=3).collect()
    }
    assert set(rows) == set(fixture)
    for shard, r in rows.items():
        disk = open(r.path, "rb").read()
        assert disk == fixture[shard], f"shard {shard} bytes diverge"
        with tarfile.open(r.path) as tf:  # stdlib interop
            assert len(tf.getnames()) == r.n_members


def test_tar_streaming_packer_scales_shard_count(spark, tmp_path):
    """Derived n_shards must GROW with the corpus while per-shard
    bytes stay near the target — the production 100 TB contract."""
    from hustle_spark.sources.tarball import pack_tar_shards_streaming

    target = 16 * 1024
    small = spark.createDataFrame(
        [(i, "x" * 400, "en") for i in range(20)],
        "doc_id long, text string, lang string",
    )
    big = spark.createDataFrame(
        [(i, "x" * 400, "en") for i in range(200)],
        "doc_id long, text string, lang string",
    )
    n_small = pack_tar_shards_streaming(
        small, str(tmp_path / "s"), shard_target_bytes=target
    ).count()
    big_rows = pack_tar_shards_streaming(
        big, str(tmp_path / "b"), shard_target_bytes=target
    ).collect()
    assert len(big_rows) >= 8 * n_small  # 10x corpus -> ~10x shards
    for r in big_rows:  # shard size bounded near target (+1 member slack)
        assert r.payload_bytes <= target + 3 * 512 + 1024


def test_zip_streaming_packer_byte_identical_to_codegen(spark, tmp_path):
    import zipfile

    from hustle_spark.sources.ziparchive import (
        pack_zip_shards_streaming,
        synthesize_zip_shards,
    )

    df = spark.createDataFrame(
        [(i, f"zip body {i} " * (i % 5)) for i in range(17)],
        "doc_id long, text string",
    )
    out = tmp_path / "zip_stream"
    rows = {
        r.shard: r
        for r in pack_zip_shards_streaming(
            df, str(out), n_shards=3
        ).collect()
    }
    fixture = {
        p.shard: bytes(p.payload)
        for p in synthesize_zip_shards(df, n_shards=3).collect()
    }
    assert set(rows) == set(fixture)
    for shard, r in rows.items():
        disk = open(r.path, "rb").read()
        assert disk == fixture[shard], f"shard {shard} bytes diverge"
        with zipfile.ZipFile(r.path) as zf:  # stdlib interop + CRCs
            assert zf.testzip() is None
            assert len(zf.namelist()) == r.n_members


def test_zip_streaming_packer_classic_limit_guard(spark, tmp_path):
    """The classic-ZIP member ceiling must raise LOUDLY from the
    production writer, mirroring the fixture's assert_true guard."""
    import pytest
    from pyspark.errors.exceptions.captured import PythonException

    from hustle_spark.sources.ziparchive import pack_zip_shards_streaming

    df = spark.range(0x10000 + 10).selectExpr(
        "id as doc_id", "'x' as text"
    )
    with pytest.raises(PythonException, match="classic-ZIP"):
        pack_zip_shards_streaming(
            df, str(tmp_path / "overflow"), n_shards=1
        ).collect()


def test_tar_sample_decoder_groups_and_flags_incomplete(spark):
    """decode_tar_samples must group adjacent {key}.{ext} members into
    one row per sample, flag samples missing a member, ignore unknown
    extensions, and skip unparseable shards — against a STDLIB-written
    archive, not our own packer."""
    import io
    import tarfile

    from hustle_spark.sources.tarball import decode_tar_samples

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w",
                      format=tarfile.USTAR_FORMAT) as tf:
        for nm, data in (
            ("7.txt", b"seven text"), ("7.cls", b"en"),
            ("8.txt", b"eight text"),            # incomplete: no .cls
            ("9.cls", b"fr"),                    # incomplete: no .txt
            ("9.json", b"{}"),                   # unknown ext: ignored
        ):
            info = tarfile.TarInfo(nm)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    df = spark.createDataFrame(
        [(0, bytearray(buf.getvalue())), (1, bytearray(b"not a tar"))],
        "shard long, payload binary",
    )
    rows = {r.key: r for r in decode_tar_samples(df).collect()}
    assert set(rows) == {"7", "8", "9"}  # bad shard contributes nothing
    assert rows["7"].txt == "seven text" and rows["7"].cls == "en"
    assert rows["7"].complete
    assert rows["8"].txt == "eight text" and rows["8"].cls is None
    assert not rows["8"].complete
    assert rows["9"].cls == "fr" and rows["9"].txt is None
    assert not rows["9"].complete


def test_zip_reader_bounds_deflate_expansion():
    """ADVICE r11: a hostile deflate entry whose stream expands past
    the CD's declared uncompressed size (zip-bomb shape) must be
    REJECTED with allocation bounded at usize+1 bytes — the reader
    uses decompressobj(max_length), never a full zlib.decompress, so
    the lie in the central directory caps the work, not the stream."""
    import struct
    import zlib

    from hustle_spark.sources.ziparchive import parse_zip_members

    content = b"\x00" * 200_000
    comp = zlib.compressobj(9, zlib.DEFLATED, -15)
    body = comp.compress(content) + comp.flush()
    crc = zlib.crc32(content) & 0xFFFFFFFF
    lied_usize = 10  # declares 10 B; the stream expands to 200 kB

    def entry(usize):
        name = b"bomb.bin"
        local = struct.pack(
            "<IHHHHHIII", 0x04034B50, 20, 0, 8, 0, 0, crc, len(body), usize
        ) + struct.pack("<HH", len(name), 0) + name + body
        cd = struct.pack(
            "<IHHHHHHIIIHHHHHII", 0x02014B50, 20, 20, 0, 8, 0, 0,
            crc, len(body), usize, len(name), 0, 0, 0, 0, 0, 0,
        ) + name
        eocd = struct.pack(
            "<IHHHHIIH", 0x06054B50, 0, 0, 1, 1, len(cd), len(local), 0
        )
        return local + cd + eocd

    assert parse_zip_members(entry(lied_usize)) is None  # bomb rejected
    # same bytes with the TRUE size declared still parse — the guard
    # rejects the lie, not the method
    assert parse_zip_members(entry(len(content))) == [
        ("bomb.bin", content)
    ]


def test_streaming_packers_refuse_stale_out_dir(spark, tmp_path):
    """ADVICE r11: re-packing into an out_dir that already holds
    finished shards must raise (stale shards from a different derived
    n_shards would silently mix into a glob re-read); orphaned .tmp
    files from an aborted run are cleaned, not inherited."""
    import pytest

    from hustle_spark.sources.tarball import pack_tar_shards_streaming
    from hustle_spark.sources.ziparchive import pack_zip_shards_streaming

    df = spark.createDataFrame(
        [(i, f"body {i}", "en") for i in range(6)],
        "doc_id long, text string, lang string",
    )
    out = tmp_path / "guarded"
    assert pack_tar_shards_streaming(df, str(out), n_shards=2).count() == 2
    with pytest.raises(ValueError, match="already contains"):
        pack_tar_shards_streaming(df, str(out), n_shards=3)
    # a zip pack into the same dir is a DIFFERENT container type: the
    # guard is per-suffix, and an orphan .tmp OF ITS OWN TYPE is swept
    # before writing — while a foreign .tmp (another pack's in-flight
    # file, or an unrelated user file) survives untouched (review
    # finding r12: a blanket *.tmp unlink would kill a concurrent
    # tar pack's os.replace mid-write)
    (out / "shard-zzz.zip.tmp").write_bytes(b"torn")
    (out / "unrelated.tmp").write_bytes(b"user file")
    assert (
        pack_zip_shards_streaming(
            df.drop("lang"), str(out), n_shards=2
        ).count() == 2
    )
    assert not list(out.glob("shard-*.zip.tmp"))
    assert (out / "unrelated.tmp").exists()
    with pytest.raises(ValueError, match="already contains"):
        pack_zip_shards_streaming(df.drop("lang"), str(out), n_shards=2)


def test_zip_reader_truncated_zip64_structures_degrade_to_none():
    """A corrupt shard whose EOCD carries zip64 sentinels but whose
    EOCD64 record (or a CD entry) is truncated must parse to None —
    the ok=False row every other corruption produces — never raise
    struct.error out of the executor task and fail the whole job on
    one bad shard (review finding r12, reproduced pre-fix)."""
    import struct

    from hustle_spark.sources.ziparchive import parse_zip_members

    # locator points at a 'PK\x06\x06' signature with < 52 bytes after
    e64_partial = b"PK\x06\x06" + b"\x00" * 20
    locator = b"PK\x06\x07" + struct.pack("<IQI", 0, 0, 1)
    eocd_z64 = b"PK\x05\x06" + struct.pack(
        "<HHHHIIH", 0, 0, 0xFFFF, 0xFFFF, 0xFFFFFFFF, 0xFFFFFFFF, 0
    )
    assert parse_zip_members(e64_partial + locator + eocd_z64) is None

    # classic EOCD whose central directory entry is cut short
    cd_partial = b"PK\x01\x02" + b"\x00" * 10
    eocd = b"PK\x05\x06" + struct.pack(
        "<HHHHIIH", 0, 0, 1, 1, len(cd_partial), 0, 0
    )
    assert parse_zip_members(cd_partial + eocd) is None

    # local header truncated (ADVICE r12): a payload whose
    # 'PK\x03\x04' signature sits within the last 30 bytes passes the
    # 4-byte signature compare but must degrade to None at the
    # fixed-size header unpack, never raise struct.error. Craft: a
    # valid one-entry CD whose lho points INTO the EOCD comment —
    # the comment is exactly the 4-byte local-header signature, so
    # the signature check passes with only 4 bytes left in payload
    # (reproduced as struct.error pre-fix).
    cd1 = b"PK\x01\x02" + struct.pack(
        "<HHHHHHIIIHHHHHII",
        20, 20, 0, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0,
    ) + b"a"
    comment = b"PK\x03\x04"
    eocd1 = b"PK\x05\x06" + struct.pack(
        "<HHHHIIH", 0, 0, 1, 1, len(cd1), 0, len(comment)
    )
    evil = bytearray(cd1 + eocd1 + comment)
    # patch the CD's lho field (offset 42 in the entry) to the
    # comment's position = start of the last 4 bytes
    evil[42:46] = struct.pack("<I", len(evil) - 4)
    assert parse_zip_members(bytes(evil)) is None


def test_zip_reader_reads_zip64_archives():
    """zip64 (the former documented swap point, closed r12): the
    reader must follow the EOCD64 locator/record and the per-entry
    0x0001 extra fields. Pinned two ways: (a) a stdlib-written
    archive with force_zip64 local headers parses identically to
    zipfile's own read; (b) a hand-built archive with FULL zip64
    structures (sentineled EOCD + CD entry, APPNOTE-ordered extra)
    parses correctly AND stdlib zipfile agrees on the content —
    interop in both directions, the deflate-closure precedent."""
    import io
    import struct
    import zipfile
    import zlib

    from hustle_spark.sources.ziparchive import parse_zip_members

    # (a) stdlib-written: force_zip64 local headers
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", compression=zipfile.ZIP_STORED) as zf:
        with zf.open("a.txt", "w", force_zip64=True) as fh:
            fh.write(b"alpha zip64 content")
    got = parse_zip_members(buf.getvalue())
    assert got == [("a.txt", b"alpha zip64 content")]

    # (b) hand-built: sentinels everywhere the spec allows
    name = b"big.bin"
    content = b"zip64 body " * 40
    crc = zlib.crc32(content) & 0xFFFFFFFF
    local = (
        struct.pack(
            "<IHHHHHIII", 0x04034B50, 45, 0, 0, 0, 0,
            crc, 0xFFFFFFFF, 0xFFFFFFFF,
        )
        + struct.pack("<HH", len(name), 20)
        + name
        + struct.pack("<HHQQ", 0x0001, 16, len(content), len(content))
        + content
    )
    cd_extra = struct.pack(
        "<HHQQQ", 0x0001, 24, len(content), len(content), 0
    )  # usize, csize, lho — all sentineled below, APPNOTE order
    cd = (
        struct.pack(
            "<IHHHHHHIIIHHHHHII", 0x02014B50, 45, 45, 0, 0, 0, 0,
            crc, 0xFFFFFFFF, 0xFFFFFFFF, len(name), len(cd_extra), 0,
            0, 0, 0, 0xFFFFFFFF,
        )
        + name
        + cd_extra
    )
    cd_off = len(local)
    eocd64 = struct.pack(
        "<IQHHIIQQQQ", 0x06064B50, 44, 45, 45, 0, 0, 1, 1,
        len(cd), cd_off,
    )
    e64_at = cd_off + len(cd)
    locator = struct.pack("<IIQI", 0x07064B50, 0, e64_at, 1)
    eocd = struct.pack(
        "<IHHHHIIH", 0x06054B50, 0, 0, 0xFFFF, 0xFFFF,
        0xFFFFFFFF, 0xFFFFFFFF, 0,
    )
    payload = local + cd + eocd64 + locator + eocd
    assert parse_zip_members(payload) == [("big.bin", content)]
    with zipfile.ZipFile(io.BytesIO(payload)) as zf:  # stdlib agrees
        assert zf.read("big.bin") == content
    # a missing locator behind sentineled EOCD fields stays rejected
    assert parse_zip_members(local + cd + eocd) is None
