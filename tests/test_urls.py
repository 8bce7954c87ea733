"""functions.urls edge cases the differential oracle cannot see (the
synthesized model is well-formed): NULL/garbage/schemeless inputs,
single-label and bare-suffix hosts, empty queries, valueless params,
and quota behavior under NULL domains."""

from pyspark.sql import functions as F

from hustle_spark.functions.urls import (
    canonicalize_url,
    domain_quota,
    synthesize_messy_urls,
    url_domain,
)


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = df.select(
        canonicalize_url("url").alias("c"), url_domain("url").alias("d")
    ).collect()
    return [(r.c, r.d) for r in rows]


def test_url_canonicalize_edges(spark):
    out = _canon(
        spark,
        [
            None,
            "not a url",
            "example.com/x",                       # schemeless
            "HTTP://Example.COM:80/a?utm_source=1&z=2&a=3#f",
            "https://a.b.com:80/p",                # :80 kept on https
            "https://a.b.com:443/p",               # default stripped
            "http://a.com/p?",                     # empty query
            "http://a.com/p?flag&b=1",             # valueless param kept
            "http://a.com/p?gclid",                # valueless TRACKING key
            "http://a.com/p?utm_source&b=1",       # ... dropped (rule 4)
            "http://a.com/p?utm=1&gclidx=2",       # near-miss keys kept
            "http://localhost/x",                  # single-label host
            "http://co.uk/x",                      # bare multi-label suffix
            "http://x.blog.example.co.uk/x",       # deep ccTLD subdomain
        ],
    )
    assert out[0] == (None, None)
    assert out[1] == (None, None)
    assert out[2] == (None, None)
    assert out[3] == ("http://example.com/a?a=3&z=2", "example.com")
    assert out[4] == ("https://a.b.com:80/p", "b.com")
    assert out[5] == ("https://a.b.com/p", "b.com")
    assert out[6] == ("http://a.com/p", "a.com")
    assert out[7] == ("http://a.com/p?b=1&flag", "a.com")
    # ADVICE r6 #2: valueless tracking keys are dropped too
    assert out[8] == ("http://a.com/p", "a.com")
    assert out[9] == ("http://a.com/p?b=1", "a.com")
    # near-miss keys ('utm' w/o underscore, 'gclidx') are NOT tracking
    assert out[10] == ("http://a.com/p?gclidx=2&utm=1", "a.com")
    # localhost canonicalizes fine but has no registrable domain
    assert out[11] == ("http://localhost/x", None)
    # heuristic floor: a bare public suffix is returned as-is (the
    # full-PSL swap point would reject it) — pinned, documented
    assert out[12] == ("http://co.uk/x", "co.uk")
    assert out[13] == (
        "http://x.blog.example.co.uk/x", "example.co.uk",
    )


def test_psl_snapshot_breadth(spark):
    """The r7 embedded PSL snapshot (functions/psl.py): ≥20 multi-label
    suffixes beyond the original 8-entry heuristic resolve 3-label
    registrable domains (VERDICT r6 'Next round' #4 done-criterion)."""
    from hustle_spark.functions.psl import PUBLIC_SUFFIX_2LABEL

    original8 = {"co.uk", "org.uk", "ac.uk", "gov.uk",
                 "com.au", "co.jp", "com.br", "co.in"}
    beyond = [s for s in PUBLIC_SUFFIX_2LABEL if s not in original8]
    assert len(PUBLIC_SUFFIX_2LABEL) >= 300
    # spot-check 24 load-bearing suffixes across the snapshot
    probe = ["com.cn", "co.kr", "com.mx", "gob.mx", "com.tr", "co.za",
             "co.nz", "com.sg", "com.hk", "com.tw", "co.th", "co.id",
             "com.my", "com.ph", "com.vn", "co.il", "com.ua", "com.pl",
             "com.eg", "com.sa", "co.ke", "com.ar", "gob.pe", "on.ca"]
    assert set(probe) <= set(beyond) and len(probe) >= 20
    urls = [f"http://www.site.{s}/x" for s in probe]
    out = _canon(spark, urls)
    assert [d for _, d in out] == [f"site.{s}" for s in probe]


def test_domain_quota_deterministic_and_null_safe(spark):
    rows = [(i, f"http://d{i % 2}.com/p") for i in range(10)]
    rows += [(100, None), (101, "garbage")]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = domain_quota(df, max_per_domain=3)
    kept = {r.doc_id for r in out.filter("is_kept").collect()}
    # lowest-3 ids per domain; NULL-domain rows form their own group
    assert {0, 2, 4} <= kept and {1, 3, 5} <= kept
    assert 6 not in kept and 7 not in kept
    assert out.count() == 12  # no row silently dropped


def test_messy_url_model_is_parseable(spark):
    df = spark.range(0, 210).selectExpr("id as doc_id")
    synth = synthesize_messy_urls(df, "doc_id")
    out = synth.select(
        canonicalize_url("url").alias("c"), url_domain("url").alias("d")
    )
    assert out.filter(F.col("c").isNull() | F.col("d").isNull()).count() == 0
    doms = {r.d for r in out.select("d").distinct().collect()}
    assert doms == {"example.com", "example.co.uk", "site.org",
                    "portal.net", "shop.com.cn", "ejemplo.gob.mx"}


def test_robots_parse_and_filter(spark):
    """robots.txt rule core (RFC 9309 group semantics in one codegen
    fold): consecutive User-agent lines share a group, only applying
    groups contribute Disallow prefixes, comments/blank/empty-value
    lines are inert; the filter blocks exactly the URLs whose path
    starts with a disallowed prefix of their domain."""
    from hustle_spark.functions.urls import (
        robots_disallows,
        robots_filter,
        url_path,
    )

    robots_txt = (
        "# crawl policy\n"
        "User-agent: evilbot\n"
        "Disallow: /\n"
        "\n"
        "User-agent: goodbot\n"
        "User-agent: *\n"
        "Disallow: /private/\n"
        "Disallow: /tmp\n"
        "Disallow:\n"          # empty value = allow-all, inert
        "Crawl-delay: 10\n"    # unknown directive, inert
        "Disallow: /late\n"    # still in the same group's rule block
    )
    rdf = spark.createDataFrame(
        [("example.com", robots_txt),
         ("open.org", None),                      # no robots -> allow
         ("strict.net", "User-agent: *\nDisallow: /\n")],
        "domain string, body string",
    )
    parsed = rdf.select(
        "domain", robots_disallows(F.col("body")).alias("disallows")
    )
    got = {r.domain: r.disallows for r in parsed.collect()}
    assert got["example.com"] == ["/private/", "/tmp", "/late"]
    assert got["open.org"] == []
    assert got["strict.net"] == ["/"]
    # the evilbot-only group must apply when asked for evilbot
    evil = rdf.filter("domain = 'example.com'").select(
        robots_disallows(F.col("body"), user_agent="EvilBot").alias("d")
    ).collect()[0].d
    assert evil == ["/", "/private/", "/tmp", "/late"]

    docs = spark.createDataFrame(
        [
            (1, "http://www.example.com/private/x.html"),   # blocked
            (2, "http://example.com/public/x.html"),        # kept
            (3, "http://example.com/tmpfile"),              # prefix: blocked
            (4, "https://strict.net:443/anything"),         # blocked
            (5, "http://open.org/private/whatever"),        # no rules
            (6, "http://unknown.io/x"),                     # no robots row
            (7, None),                                      # NULL url
        ],
        "doc_id long, url string",
    )
    out = {r.doc_id: r.blocked
           for r in robots_filter(docs, parsed).collect()}
    assert out == {1: True, 2: False, 3: True, 4: True,
                   5: False, 6: False, 7: False}
    assert docs.select(url_path(F.col("url")).alias("p")).collect()[0].p \
        == "/private/x.html"


def test_robots_generative_model_closed_form(spark):
    """The synthesized robots corpus (variant = length(domain) % 4)
    parses to exactly the closed-form blocked rule the oracle will
    replay: v0 /p/1|/q/, v1 /p/2 (the other agent's full block must
    not leak), v2 allow-all, v3 /p/ via consecutive UA lines."""
    from hustle_spark.functions.urls import (
        robots_disallows,
        robots_filter,
        synthesize_robots_bodies,
    )

    domains = ["a.co", "a-site.io", "portal.net", "example.com"]
    assert [len(d) % 4 for d in domains] == [0, 1, 2, 3]
    rdf = synthesize_robots_bodies(
        spark.createDataFrame([(d,) for d in domains], "domain string")
    )
    parsed = rdf.select(
        "domain", robots_disallows(F.col("robots_txt")).alias("disallows")
    )
    got = {r.domain: r.disallows for r in parsed.collect()}
    assert got["a.co"] == ["/p/1", "/q/"]
    assert got["a-site.io"] == ["/p/2"]
    assert got["portal.net"] == []
    assert got["example.com"] == ["/p/"]

    paths = ["/p/1x", "/p/2y", "/p/zz", "/q/k", "/r/ok"]
    docs = spark.createDataFrame(
        [
            (i * 10 + j, f"http://{d}{p}")
            for i, d in enumerate(domains)
            for j, p in enumerate(paths)
        ],
        "doc_id long, url string",
    )
    out = {r.doc_id: r.blocked
           for r in robots_filter(docs, parsed).collect()}

    def closed_form(domain, path):
        v = len(domain) % 4
        if v == 0:
            return path.startswith("/p/1") or path.startswith("/q/")
        if v == 1:
            return path.startswith("/p/2")
        if v == 2:
            return False
        return path.startswith("/p/")

    exp = {
        i * 10 + j: closed_form(d, p)
        for i, d in enumerate(domains)
        for j, p in enumerate(paths)
    }
    assert out == exp
