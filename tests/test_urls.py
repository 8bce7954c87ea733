"""functions.urls edge cases the differential oracle cannot see (the
synthesized model is well-formed): NULL/garbage/schemeless inputs,
single-label and bare-suffix hosts, empty queries, valueless params,
quota behavior under NULL domains, and the robots.txt precedence
corners (Allow ties, group leaks, malformed Crawl-delay)."""

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
    """The embedded PSL snapshot (functions/psl.py): ≥20 2-label
    suffixes beyond the original 8-entry heuristic resolve 3-label
    registrable domains (VERDICT r6 #4 done-criterion), and — the r8
    depth expansion (VERDICT r7 #7 done-criterion) — ≥20 3-label
    suffixes resolve 4-label registrable domains."""
    from hustle_spark.functions.psl import (
        PUBLIC_SUFFIX_2LABEL,
        PUBLIC_SUFFIX_3LABEL,
    )

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

    # r8 depth expansion: 3-label suffixes yield 4-label domains
    assert len(PUBLIC_SUFFIX_3LABEL) >= 20
    probe3 = ["act.edu.au", "nsw.edu.au", "qld.edu.au", "vic.edu.au",
              "wa.edu.au", "tas.edu.au", "sa.edu.au", "nt.edu.au",
              "catholic.edu.au", "act.gov.au", "nsw.gov.au",
              "vic.gov.au", "k12.ca.us", "k12.ny.us", "k12.tx.us",
              "k12.ma.us", "k12.il.us", "cc.ca.us", "cc.ny.us",
              "lib.ca.us", "lib.tx.us", "lib.wa.us"]
    assert set(probe3) <= set(PUBLIC_SUFFIX_3LABEL) and len(probe3) >= 20
    urls3 = [f"http://www.site.{s}/x" for s in probe3]
    out3 = _canon(spark, urls3)
    assert [d for _, d in out3] == [f"site.{s}" for s in probe3]


def test_psl_wildcard_and_exception_rules(spark):
    """TLD wildcard rules (*.ck → <x>.ck is a suffix, registrable
    domains carry 3 labels) and the !www.ck exception (www.ck IS
    registrable), per the PSL algorithm's exception-beats-wildcard
    precedence."""
    out = _canon(
        spark,
        [
            "http://media.port.foo.ck/x",   # wildcard: foo.ck is suffix
            "http://port.foo.ck/x",         # already registrable
            "http://foo.ck/x",              # bare wildcard suffix: floor
            "http://www.ck/x",              # exception: registrable
            "http://shop.www.ck/x",         # under the exception domain
            "http://a.b.gov.ck/x",          # another *.ck branch
            "http://x.y.kh/x",              # *.kh: y.kh is the suffix
        ],
    )
    assert [d for _, d in out] == [
        "port.foo.ck", "port.foo.ck", "foo.ck", "www.ck", "www.ck",
        "b.gov.ck", "x.y.kh",
    ]


def test_psl_r9_additions(spark):
    """ADVICE r8 #1: *.np is a genuine current-PSL TLD wildcard (every
    <label>.np is a suffix) and eq.edu.au (Education Queensland) joins
    the AU 3-label family."""
    out = _canon(
        spark,
        [
            "http://www.site.com.np/x",     # *.np: com.np is a suffix
            "http://site.com.np/x",         # already registrable
            "http://a.b.gov.np/x",          # another *.np branch
            "http://school.eq.edu.au/x",    # 3-label: eq.edu.au suffix
            "http://www.school.eq.edu.au/x",
            "http://dept.edu.au/x",         # plain 2-label edu.au
        ],
    )
    assert [d for _, d in out] == [
        "site.com.np", "site.com.np", "b.gov.np",
        "school.eq.edu.au", "school.eq.edu.au", "dept.edu.au",
    ]


def test_psl_depth_completion_4label_and_city_wildcards(spark):
    """The r9 depth completion: 4-label ICANN suffixes
    (pvt.k12.<st>.us -> registrable carries FIVE labels) and non-TLD
    wildcards (*.kawasaki.jp -> <x>.kawasaki.jp is a suffix,
    registrable carries four) with their !city.<base> exceptions —
    exception beats wildcard, longest rule beats shorter."""
    out = _canon(
        spark,
        [
            "http://www.site.pvt.k12.ma.us/x",   # 4-label suffix
            "http://site.pvt.k12.ma.us/x",       # already registrable
            "http://pvt.k12.ma.us/x",            # bare suffix: floor
            "http://a.k12.ma.us/x",              # 3-label rule still wins
            "http://x.chtr.k12.ma.us/x",         # the OTHER real 4-label
            "http://s.paroch.pvt.k12.ma.us/x",   # the PSL's one 5-label
            # the review-caught over-widening: pvt.k12 is MA-only on
            # the real PSL — CA resolves via the 3-label k12.ca.us
            "http://district.pvt.k12.ca.us/x",
            "http://blog.ward.kawasaki.jp/x",    # *.kawasaki.jp
            "http://ward.kawasaki.jp/x",         # bare wildcard suffix
            "http://city.kawasaki.jp/x",         # exception: registrable
            "http://www.city.kawasaki.jp/x",     # under the exception
            "http://x.y.sendai.jp/x",            # another city wildcard
        ],
    )
    assert [d for _, d in out] == [
        "site.pvt.k12.ma.us", "site.pvt.k12.ma.us", "pvt.k12.ma.us",
        "a.k12.ma.us", "x.chtr.k12.ma.us", "s.paroch.pvt.k12.ma.us",
        "pvt.k12.ca.us",
        "blog.ward.kawasaki.jp", "ward.kawasaki.jp",
        "city.kawasaki.jp", "city.kawasaki.jp", "x.y.sendai.jp",
    ]


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
    df = spark.range(0, 330).selectExpr("id as doc_id")
    synth = synthesize_messy_urls(df, "doc_id")
    out = synth.select(
        canonicalize_url("url").alias("c"), url_domain("url").alias("d")
    )
    assert out.filter(F.col("c").isNull() | F.col("d").isNull()).count() == 0
    doms = {r.d for r in out.select("d").distinct().collect()}
    assert doms == {"example.com", "example.co.uk", "site.org",
                    "portal.net", "shop.com.cn", "ejemplo.gob.mx",
                    "school.act.edu.au", "port.foo.ck",
                    # r9 depth-completion hosts (pool 11 -> 13)
                    "site.pvt.k12.ma.us", "blog.ward.kawasaki.jp"}


def test_robots_rules_parse_and_filter(spark):
    """robots.txt rule core (RFC 9309 group semantics in one codegen
    fold) + precedence matcher: consecutive User-agent lines share a
    group, only applying groups contribute rules, comments/blank/
    empty-value lines are inert; the filter applies longest-match
    with Allow winning length ties."""
    from hustle_spark.functions.urls import (
        robots_crawl_delay,
        robots_disallows,
        robots_filter,
        robots_rules,
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
        "Allow: /private/press/\n"   # longest match re-opens a subtree
        "Disallow: /tmp\n"
        "Allow: /tmp\n"              # equal-length tie -> Allow wins
        "Disallow:\n"                # empty value, inert
        "Allow:\n"                   # empty value, inert
        "Crawl-delay: 10\n"
        "Disallow: /late\n"          # still in the same group's block
    )
    rdf = spark.createDataFrame(
        [("example.com", robots_txt),
         ("open.org", None),                      # no robots -> allow
         ("strict.net", "User-agent: *\nDisallow: /\nCrawl-delay: x\n")],
        "domain string, body string",
    )
    parsed = rdf.select(
        "domain", robots_rules(F.col("body")).alias("rules")
    )
    got = {r.domain: [(x["pfx"], x["allow"]) for x in r.rules]
           for r in parsed.collect()}
    assert got["example.com"] == [
        ("/private/", False), ("/private/press/", True),
        ("/tmp", False), ("/tmp", True), ("/late", False),
    ]
    assert got["open.org"] == []
    assert got["strict.net"] == [("/", False)]

    # the disallow-only projection keeps the pre-r8 shape
    dis = {r.domain: r.d for r in rdf.select(
        "domain", robots_disallows(F.col("body")).alias("d")
    ).collect()}
    assert dis["example.com"] == ["/private/", "/tmp", "/late"]

    # the evilbot-only group must apply when asked for evilbot
    evil = rdf.filter("domain = 'example.com'").select(
        robots_rules(F.col("body"), user_agent="EvilBot").alias("r")
    ).collect()[0].r
    assert [(x["pfx"], x["allow"]) for x in evil][0] == ("/", False)

    # crawl delay: applying group only; malformed values -> NULL
    delays = {r.domain: r.cd for r in rdf.select(
        "domain", robots_crawl_delay(F.col("body")).alias("cd")
    ).collect()}
    assert delays == {"example.com": 10, "open.org": None,
                      "strict.net": None}

    docs = spark.createDataFrame(
        [
            (1, "http://www.example.com/private/x.html"),   # blocked
            (2, "http://example.com/public/x.html"),        # kept
            (3, "http://example.com/tmpfile"),              # tie->Allow
            (4, "https://strict.net:443/anything"),         # blocked
            (5, "http://open.org/private/whatever"),        # no rules
            (6, "http://unknown.io/x"),                     # no robots row
            (7, None),                                      # NULL url
            (8, "http://example.com/private/press/release"),  # re-opened
            (9, "http://example.com/latepost"),             # blocked
        ],
        "doc_id long, url string",
    )
    out = {r.doc_id: r.blocked
           for r in robots_filter(docs, parsed).collect()}
    assert out == {1: True, 2: False, 3: False, 4: True,
                   5: False, 6: False, 7: False, 8: False, 9: True}
    assert docs.select(url_path(F.col("url")).alias("p")).collect()[0].p \
        == "/private/x.html"


def test_robots_generative_model_closed_form(spark):
    """The synthesized robots corpus (variant = length(domain) % 4)
    parses to exactly the closed-form blocked rule the oracle will
    replay — including the r8 Allow-precedence cases: v0 Disallow
    /p/1|/q/ with Allow /p/12 carved out, v1 /p/2 minus /p/22 (the
    other agent's full block and its Allow must not leak), v2
    allow-all, v3 the equal-length /p/3 tie going to Allow with /p/4
    still blocked."""
    from hustle_spark.functions.urls import (
        robots_crawl_delay,
        robots_filter,
        robots_rules,
        synthesize_robots_bodies,
    )

    domains = ["a.co", "a-site.io", "portal.net", "example.com"]
    assert [len(d) % 4 for d in domains] == [0, 1, 2, 3]
    rdf = synthesize_robots_bodies(
        spark.createDataFrame([(d,) for d in domains], "domain string")
    )
    parsed = rdf.select(
        "domain",
        robots_rules(F.col("robots_txt")).alias("rules"),
        robots_crawl_delay(F.col("robots_txt")).alias("cd"),
    )
    got = {r.domain: [(x["pfx"], x["allow"]) for x in r.rules]
           for r in parsed.collect()}
    assert got["a.co"] == [("/p/1", False), ("/q/", False),
                           ("/p/12", True)]
    assert got["a-site.io"] == [("/p/2", False), ("/p/22", True)]
    assert got["portal.net"] == []
    assert got["example.com"] == [("/p/3", False), ("/p/3", True),
                                  ("/p/4", False)]
    delays = {r.domain: r.cd for r in parsed.collect()}
    assert delays == {"a.co": 2, "a-site.io": 5, "portal.net": None,
                      "example.com": None}

    paths = ["/p/1x", "/p/12", "/p/2y", "/p/22", "/p/3z", "/p/4",
             "/p/zz", "/q/k", "/r/ok"]
    docs = spark.createDataFrame(
        [
            (i * 10 + j, f"http://{d}{p}")
            for i, d in enumerate(domains)
            for j, p in enumerate(paths)
        ],
        "doc_id long, url string",
    )
    out = {r.doc_id: r.blocked
           for r in robots_filter(
               docs, parsed.select("domain", "rules")).collect()}

    def closed_form(domain, path):
        v = len(domain) % 4
        if v == 0:
            return (path.startswith("/p/1")
                    and not path.startswith("/p/12")) \
                or path.startswith("/q/")
        if v == 1:
            return path.startswith("/p/2") \
                and not path.startswith("/p/22")
        if v == 2:
            return False
        return path.startswith("/p/4")

    exp = {
        i * 10 + j: closed_form(d, p)
        for i, d in enumerate(domains)
        for j, p in enumerate(paths)
    }
    assert out == exp


def test_robots_precedence_property_vs_python_model(spark):
    """Property differential for the r8 precedence core: random robots
    bodies (UA runs, Allow/Disallow/Crawl-delay/comment/junk lines,
    empty values, mixed case) and random paths, checked against an
    independent pure-Python RFC 9309 model (longest match wins, Allow
    wins length ties, consecutive UA lines share a group, non-UA
    directives close the run). One batched Spark job for ALL cases —
    the hypothesis-over-Spark pattern would pay a job per example."""
    import random

    from hustle_spark.functions.urls import (
        robots_crawl_delay,
        robots_filter,
        robots_rules,
    )

    rng = random.Random(80823)
    prefixes = ["/", "/a", "/a/b", "/ab", "/b/", "/a/bc", "/q", ""]
    agents = ["*", "goodbot", "OtherBot"]

    def gen_body():
        lines = []
        for _ in range(rng.randint(1, 4)):  # groups
            for _ in range(rng.randint(1, 2)):  # consecutive UA lines
                lines.append(f"User-agent: {rng.choice(agents)}")
            for _ in range(rng.randint(0, 4)):  # rule block
                kind = rng.choice(
                    ["Disallow", "Allow", "Crawl-delay", "# junk", "Foo"]
                )
                if kind == "Crawl-delay":
                    lines.append(
                        f"Crawl-delay: {rng.choice(['3', '15', 'x'])}"
                    )
                elif kind in ("Disallow", "Allow"):
                    lines.append(f"{kind}: {rng.choice(prefixes)}")
                elif kind == "# junk":
                    lines.append("# comment line")
                else:
                    lines.append("Foo: bar")
            if rng.random() < 0.5:
                lines.append("")
        return "\n".join(lines)

    def py_model(body, ua="*"):
        """Independent reference: collect (pfx, allow) rules + first
        delay for applying groups, then longest-match per path."""
        rules, delay = [], None
        active, in_group = False, False
        for raw in body.split("\n"):
            t = raw.split("#", 1)[0].strip()
            low = t.lower()
            val = t.split(":", 1)[1].strip() if ":" in t else ""
            if low.startswith("user-agent") and ":" in t:
                applies = val.lower() == ua or val == "*"
                active = (active or applies) if in_group else applies
                in_group = True
                continue
            in_group = False
            if low.startswith("disallow") and ":" in t:
                if active and val:
                    rules.append((val, False))
            elif low.startswith("allow") and ":" in t:
                if active and val:
                    rules.append((val, True))
            elif low.startswith("crawl-delay") and ":" in t:
                if active and delay is None and val.isdigit():
                    delay = int(val)
        def blocked(path):
            best_len, best_allow = -1, True
            for pfx, allow in rules:
                if path.startswith(pfx):
                    if len(pfx) > best_len:
                        best_len, best_allow = len(pfx), allow
                    elif len(pfx) == best_len:
                        best_allow = best_allow or allow
            return not best_allow
        return rules, delay, blocked

    cases = [(i, gen_body()) for i in range(60)]
    paths = ["/a/bc/x", "/ab", "/b/z", "/q1", "/zzz", "/a"]
    rdf = spark.createDataFrame(cases, "rid long, body string")
    parsed = rdf.select(
        "rid",
        robots_rules(F.col("body")).alias("rules"),
        robots_crawl_delay(F.col("body")).alias("cd"),
    )
    got = {r.rid: ([(x["pfx"], x["allow"]) for x in r.rules], r.cd)
           for r in parsed.collect()}
    docs = spark.createDataFrame(
        [(rid * 100 + j, f"http://d{rid}.com{p}")
         for rid, _ in cases for j, p in enumerate(paths)],
        "doc_id long, url string",
    )
    robots = parsed.select(
        F.concat(F.lit("d"), F.col("rid").cast("string"), F.lit(".com"))
        .alias("domain"),
        "rules",
    )
    blocked = {r.doc_id: r.blocked
               for r in robots_filter(docs, robots).collect()}

    for rid, body in cases:
        rules, delay, blk = py_model(body)
        assert got[rid] == (rules, delay), f"case {rid}:\n{body}"
        for j, p in enumerate(paths):
            assert blocked[rid * 100 + j] == blk(p), (
                f"case {rid} path {p}:\n{body}"
            )


def test_robots_sitemaps_group_independent(spark):
    """Sitemap: lines are group-independent (sitemaps.org): collected
    from anywhere in the body, comments stripped, empty values and
    non-sitemap lines dropped, URL-internal colons preserved."""
    from hustle_spark.functions.urls import robots_sitemaps

    body = (
        "User-agent: somebot\n"
        "Disallow: /\n"
        "Sitemap: https://example.com/sitemap.xml\n"
        "User-agent: *\n"
        "sitemap:https://example.com/s2.xml  # trailing comment\n"
        "Sitemap:\n"                      # empty value dropped
        "Sitemapx: https://nope.example\n"  # near-miss key dropped
    )
    rdf = spark.createDataFrame([(body,), (None,)], "body string")
    got = [r.s for r in rdf.select(
        robots_sitemaps(F.col("body")).alias("s")).collect()]
    assert got[0] == ["https://example.com/sitemap.xml",
                      "https://example.com/s2.xml"]
    assert got[1] == []


def test_full_psl_swap_refines_only(spark):
    """VERDICT r9 directive #7: exercise the documented full-PSL swap
    point ONCE with a synthetic 'full file' and prove the promise —
    breadth-only change. A fuller PSL must (a) leave every host at a
    snapshot-covered depth with an IDENTICAL url_domain, and (b) only
    REFINE hosts previously at the fallback floor: the new domain
    extends the old one label-ward (old is a dot-suffix of new), so
    quota groups can split finer but never merge or relabel across
    old groups."""
    from hustle_spark.functions import psl, urls

    # synthetic full file = the snapshot re-serialized in PSL data-file
    # format + ~50 entries the snapshot does not carry (made-up TLDs,
    # so nothing here implies real-PSL membership)
    lines = ["// synthetic full PSL (test fixture)"]
    lines += list(psl.PUBLIC_SUFFIX_2LABEL)
    lines += list(psl.PUBLIC_SUFFIX_3LABEL)
    lines += list(psl.PUBLIC_SUFFIX_4LABEL)
    lines += list(psl.PUBLIC_SUFFIX_5LABEL)
    lines += [f"*.{t}" for t in psl.WILDCARD_TLDS]
    lines += [f"!{e}" for e in psl.WILDCARD_EXCEPTIONS]
    lines += [f"*.{b}" for b in psl.WILDCARD_2LABEL]
    lines += [f"!{e}" for e in psl.WILDCARD_2LABEL_EXCEPTIONS]
    lines += [f"co.x{i}" for i in range(25)]          # new 2-label
    lines += [f"s{i}.edu.zz" for i in range(15)]      # new 3-label
    lines += ["pvt.k12.zz.us", "paroch.pvt.k12.zz.us",  # new depths
              "*.zm", "!www.zm",                        # new TLD wildcard
              "*.fukuoka.jp", "!city.fukuoka.jp"]       # new 2L wildcard
    parsed = psl.parse_psl(lines)

    hosts = [
        # covered depths: outputs must be byte-identical post-swap
        "shop.co.uk", "a.shop.co.uk", "x.act.edu.au", "www.ck",
        "foo.ck", "bar.baz.ck", "city.kawasaki.jp", "x.y.kawasaki.jp",
        "school.pvt.k12.ma.us", "x.paroch.pvt.k12.ma.us",
        "example.com", "deep.a.b.example.com", "localhost",
        # floor-fallback hosts the fuller file refines
        "a.b.co.x3", "x.s2.edu.zz", "a.b.zm", "www.zm", "foo.zm",
        "x.y.fukuoka.jp", "city.fukuoka.jp", "sch.pvt.k12.zz.us",
        "x.paroch.pvt.k12.zz.us",
    ]
    covered = set(hosts[:13])
    df = spark.createDataFrame(
        [(f"http://{h}/p",) for h in hosts], "url string"
    )

    def domains():
        rows = df.select(
            F.col("url"), url_domain("url").alias("d")
        ).collect()
        return {r.url.split("//")[1].removesuffix("/p"): r.d for r in rows}

    before = domains()
    prev = urls.swap_psl(parsed)
    try:
        after = domains()
    finally:
        urls.swap_psl(prev)
    assert domains() == before  # restore round-trips

    for h in hosts:
        if h in covered:
            assert after[h] == before[h], (h, before[h], after[h])
        else:
            ok = after[h] == before[h] or (
                before[h] is not None
                and after[h] is not None
                and after[h].endswith("." + before[h])
            )
            assert ok, f"non-refining swap: {h}: {before[h]} -> {after[h]}"
    # quota-grouping view: new groups are sub-partitions of old groups
    # (splits fine, merges never)
    group_of = {}
    for h in hosts:
        if after[h] is None:
            continue
        group_of.setdefault(after[h], set()).add(before[h])
    assert all(len(olds) == 1 for olds in group_of.values()), group_of


def test_parse_psl_icann_boundary_and_unsupported_shapes():
    """Review r10: the real PSL file's PRIVATE section carries wildcard
    rules with multi-label bases (*.compute.amazonaws.com) that
    url_domain's depth probes do not model. Default parsing stops at
    the ===END ICANN DOMAINS=== marker (matching the snapshot's
    deliberate private-section exclusion), so the documented swap path
    runs on the real file; opting into the private section still
    raises loudly on unsupported shapes instead of mis-resolving."""
    import pytest as _pytest

    from hustle_spark.functions import psl

    lines = [
        "// comment", "com", "co.uk", "*.ck", "!www.ck",
        "// ===END ICANN DOMAINS===",
        "github.io", "*.compute.amazonaws.com",
    ]
    parsed = psl.parse_psl(lines)  # default: ICANN only — must succeed
    assert parsed["PUBLIC_SUFFIX_2LABEL"] == ("co.uk",)
    assert "github.io" not in parsed["PUBLIC_SUFFIX_2LABEL"]
    with _pytest.raises(ValueError, match="unsupported wildcard depth"):
        psl.parse_psl(lines, icann_only=False)
