"""URL-level curation — the Common Crawl pipeline stage between WARC
ingestion and text processing: canonicalize the `target_uri`, extract
the registrable domain, and enforce per-domain quotas (C4/RefinedWeb
keep per-site caps to stop a single boilerplate-heavy domain from
dominating the corpus).

Everything here is CODEGEN (regexp + array HOFs — JVM-side, scan
speed, no UDF): URL parsing is one anchored regex shared verbatim by
the DuckDB differential oracles, so both engines agree on every edge
by construction.

Canonicalization spec (applied in this order, each rule replayable):
  1. lowercase scheme and host
  2. strip the fragment
  3. strip the port only when it is the scheme default (http:80,
     https:443); other ports — including :80 on https — are kept
  4. drop tracking params whose key is utm_* / gclid / fbclid
  5. sort surviving params lexicographically by their full "k=v" text
  6. drop the '?' when no params survive
  7. the path is left untouched (no trailing-slash or dot-segment
     normalization — a documented non-goal; real crawls treat /a and
     /a/ as distinct fetches)

Registrable-domain resolution: longest-matching PSL snapshot rule
first — four labels when the final three form a known 3-label suffix
(act.edu.au / k12.ca.us families), the wildcard-exception form for
!www.ck, three labels when the final two form a 2-label suffix or the
TLD carries a wildcard rule (*.ck), else the last-2-labels floor
(functions/psl.py holds the snapshot + the full-PSL swap point; the
PSL is a data file, the machinery is identical).

Scale shape: all three functions are per-row expressions — zero
shuffle; quota enforcement (domain_quota) is one window rank per
domain, the same single-shuffle shape as source_quota_cap.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# one anchored parse regex, shared with the DuckDB oracles verbatim
URL_REGEX = (
    r"^([A-Za-z][A-Za-z0-9+.\-]*)://([^/?#:]+)(?::([0-9]+))?"
    r"([^?#]*)(?:\?([^#]*))?(?:#.*)?$"
)

# tracking-param keys dropped by canonicalization (key-anchored; the
# (=|$) tail catches VALUELESS tracking keys — '?gclid' / '?utm_source'
# with no '=' — which rule 4 drops too; shared verbatim with the
# oracles, so both engines agree by construction)
TRACKING_KEY_REGEX = r"^(utm_[^=]*|gclid|fbclid)(=|$)"

# multi-label public suffixes the domain heuristic knows about — the
# embedded PSL snapshot (see functions/psl.py for scope + the full-PSL
# swap point): ~380 2-label ICANN suffixes, the r8 3-label depth
# expansion (act.edu.au / k12.ca.us families), and the TLD-level
# wildcard rules (*.ck) with their exceptions (!www.ck); every set is
# compiled into the plan as a codegen InSet hash lookup.
from .psl import PUBLIC_SUFFIX_2LABEL as _CC_SECOND_LEVEL
from .psl import PUBLIC_SUFFIX_3LABEL as _SFX3
from .psl import PUBLIC_SUFFIX_4LABEL as _SFX4
from .psl import PUBLIC_SUFFIX_5LABEL as _SFX5
from .psl import WILDCARD_2LABEL as _WILD2
from .psl import WILDCARD_2LABEL_EXCEPTIONS as _WILD2_EXC
from .psl import WILDCARD_EXCEPTIONS as _WILD_EXC
from .psl import WILDCARD_TLDS as _WILD_TLDS

# alias -> psl.py group name, the rebind map swap_psl() walks
_PSL_BINDINGS = {
    "_CC_SECOND_LEVEL": "PUBLIC_SUFFIX_2LABEL",
    "_SFX3": "PUBLIC_SUFFIX_3LABEL",
    "_SFX4": "PUBLIC_SUFFIX_4LABEL",
    "_SFX5": "PUBLIC_SUFFIX_5LABEL",
    "_WILD2": "WILDCARD_2LABEL",
    "_WILD2_EXC": "WILDCARD_2LABEL_EXCEPTIONS",
    "_WILD_EXC": "WILDCARD_EXCEPTIONS",
    "_WILD_TLDS": "WILDCARD_TLDS",
}


def swap_psl(parsed: dict[str, tuple[str, ...]]) -> dict[str, tuple[str, ...]]:
    """Deploy-time full-PSL swap (the contract psl.py documents):
    rebind url_domain's lookup sets to ``psl.parse_psl(...)`` output.
    url_domain reads these module globals at CALL time, so plans built
    after the swap carry the fuller InSets — machinery unchanged, only
    breadth grows. Returns the PREVIOUS bindings so a caller (or test)
    can restore them. Empty groups keep the snapshot's floor semantics
    (an empty isin() is simply never true)."""
    g = globals()
    prev = {alias: g[alias] for alias in _PSL_BINDINGS}
    for alias, group in _PSL_BINDINGS.items():
        g[alias] = tuple(parsed.get(group, ()))
    return {
        _PSL_BINDINGS[alias]: vals for alias, vals in prev.items()
    }


def _part(url, group: int) -> Column:
    return F.regexp_extract(url, URL_REGEX, group)


def url_host(url) -> Column:
    """Lowercased host, '' when the URL does not parse."""
    return F.lower(_part(F.col(url) if isinstance(url, str) else url, 2))


def canonicalize_url(url) -> Column:
    """Canonical form of a URL string per the module spec; NULL when
    the anchored regex does not match (schemeless / garbage input)."""
    u = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(_part(u, 1))
    host = F.lower(_part(u, 2))
    port = _part(u, 3)
    path = _part(u, 4)
    query = _part(u, 5)
    default_port = (
        (scheme == F.lit("http")) & (port == F.lit("80"))
    ) | ((scheme == F.lit("https")) & (port == F.lit("443")))
    portpart = F.when(
        (port == F.lit("")) | default_port, F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != F.lit(""))
        & ~p.rlike(TRACKING_KEY_REGEX),
    )
    qcanon = F.array_join(F.array_sort(params), "&")
    qpart = F.when(qcanon == F.lit(""), F.lit("")).otherwise(
        F.concat(F.lit("?"), qcanon)
    )
    return F.when(
        host == F.lit(""), F.lit(None).cast("string")
    ).otherwise(F.concat(scheme, F.lit("://"), host, portpart, path, qpart))


def url_domain(url) -> Column:
    """Registrable domain of a URL per the embedded PSL snapshot
    (functions/psl.py), longest-matching rule first, exactly the PSL
    algorithm's precedence: a 3-label suffix beats a wildcard
    exception beats a 2-label/wildcard suffix beats the last-2-labels
    floor. NULL when the URL does not parse or the host has fewer
    than 2 labels; a bare public suffix is returned as-is (documented
    heuristic floor — the full-PSL swap point would reject it)."""
    host = url_host(url)
    labels = F.split(host, r"\.")
    n = F.size(labels)
    # try_element_at, not element_at: the isin() probes below sit in
    # CASE predicates, so they are evaluated for SHORT hosts too and
    # ANSI element_at would throw out-of-bounds. try_ returns NULL and
    # concat_ws skips it — a too-short lastK degenerates to the
    # shorter tail, which cannot spuriously match: every 3-label
    # snapshot entry has exactly two dots.
    last1 = F.try_element_at(labels, F.lit(-1))
    last2 = F.concat_ws(
        ".", F.try_element_at(labels, F.lit(-2)),
        F.try_element_at(labels, F.lit(-1)),
    )
    last3 = F.concat_ws(
        ".", F.try_element_at(labels, F.lit(-3)),
        F.try_element_at(labels, F.lit(-2)),
        F.try_element_at(labels, F.lit(-1)),
    )
    last4 = F.concat_ws(
        ".", F.try_element_at(labels, F.lit(-4)),
        F.try_element_at(labels, F.lit(-3)),
        F.try_element_at(labels, F.lit(-2)),
        F.try_element_at(labels, F.lit(-1)),
    )
    last5 = F.concat_ws(
        ".", F.try_element_at(labels, F.lit(-5)),
        F.try_element_at(labels, F.lit(-4)),
        F.try_element_at(labels, F.lit(-3)),
        F.try_element_at(labels, F.lit(-2)),
        F.try_element_at(labels, F.lit(-1)),
    )
    last6 = F.concat_ws(
        ".", F.try_element_at(labels, F.lit(-6)),
        F.try_element_at(labels, F.lit(-5)),
        F.try_element_at(labels, F.lit(-4)),
        F.try_element_at(labels, F.lit(-3)),
        F.try_element_at(labels, F.lit(-2)),
        F.try_element_at(labels, F.lit(-1)),
    )
    is_sfx5 = last5.isin(*_SFX5)
    is_sfx4 = last4.isin(*_SFX4)
    is_sfx3 = last3.isin(*_SFX3)
    is_sfx2 = last2.isin(*_CC_SECOND_LEVEL)
    # *.ck: any <label>.ck is a suffix — UNLESS the exception rule
    # (!www.ck) re-opens it as a registrable domain
    is_wild = last1.isin(*_WILD_TLDS)
    is_exc = last2.isin(*_WILD_EXC)
    # *.kawasaki.jp: any <label>.kawasaki.jp is a suffix — UNLESS the
    # !city.kawasaki.jp exception re-opens city.kawasaki.jp
    is_wild2 = last2.isin(*_WILD2)
    is_exc3 = last3.isin(*_WILD2_EXC)
    # concat_ws silently skips NULL parts, so a NULL input must be
    # short-circuited explicitly or it would canonicalize to ''
    # (precedence = the PSL algorithm: exception beats its wildcard,
    # longer matching rule beats shorter)
    return (
        F.when(
            host.isNull() | (host == F.lit("")) | (n < 2),
            F.lit(None).cast("string"),
        )
        .when(is_exc3 & (n >= 3), last3)
        .when(is_sfx5 & (n >= 6), last6)
        .when(is_sfx4 & (n >= 5), last5)
        .when(is_wild2 & (n >= 4), last4)
        # bare <x>.kawasaki.jp: a public suffix itself, returned as-is
        # (the same documented heuristic floor as bare *.ck suffixes)
        .when(is_wild2 & (n == 3), last3)
        .when(is_sfx3 & (n >= 4), last4)
        .when(is_exc, last2)
        .when((is_sfx2 | is_wild) & (n >= 3), last3)
        .otherwise(last2)
    )


def domain_quota(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    max_per_domain: int = 100,
) -> DataFrame:
    """Per-domain quota cap (the C4-style per-site limit): keep at
    most ``max_per_domain`` documents per registrable domain,
    deterministically (lowest ``id_col`` first — replayable, unlike a
    random sample; swap the rank key for a quality score in a
    quality-aware pipeline). Returns the input plus (domain, is_kept).

    Scale shape: one window rank partitioned by domain — a single
    shuffle on the domain key; skewed mega-domains are exactly the
    rows the cap discards, and AQE's skew-join handling covers the
    rank shuffle itself."""
    d = df.withColumn("domain", url_domain(url_col))
    w = Window.partitionBy("domain").orderBy(F.col(id_col).asc())
    return d.withColumn(
        "is_kept", F.row_number().over(w) <= max_per_domain
    )


# host pool for the generative URL model: mixed case (lowering is
# observable), subdomains (domain extraction collapses them), and
# multi-label public suffixes across every snapshot depth (co.uk from
# the original 8-entry heuristic; com.cn and gob.mx only present in
# the r7 2-label PSL snapshot; the 3-label act.edu.au and wildcard
# *.ck hosts only resolved by the r8 depth expansion — so the driver
# rows prove each expansion). 11 hosts, deliberately COPRIME to the
# scheme/port/query/fragment mod cycles (3/5/4/2) so every host meets
# every variant of the other fields.
_URL_MODEL_HOSTS = (
    "Example.COM", "news.example.com", "blog.Example.co.uk",
    "cdn.site.ORG", "shop.site.org", "www.Portal.NET", "api.portal.net",
    "WWW.Shop.COM.CN", "tienda.Ejemplo.gob.mx",
    "Www.School.ACT.edu.au", "media.Port.Foo.CK",
    # r9 depth-completion probes: a 4-label ICANN suffix and a
    # non-TLD wildcard — every PSL rule SHAPE is now driver-exercised
    "Www.Site.PVT.K12.MA.US", "Blog.Ward.Kawasaki.JP",
)


def synthesize_messy_urls(df: DataFrame, id_col: str) -> DataFrame:
    """Deterministic MESSY URLs from an integer generative model of
    the id (the multimodal/WARC synthesizer idiom): uppercase schemes,
    mixed-case hosts, default AND non-default ports (including :80 on
    https, which canonicalization must KEEP), tracking params in
    shuffled order, fragments. A DuckDB oracle replays the model and
    the canonicalization spec independently, making both the parse
    regex and every canonicalization rule differentially testable."""
    mid = F.col(id_col).cast("long")

    def pick(options, mod):
        return F.element_at(
            F.array(*[F.lit(o) for o in options]),
            (mid % mod).cast("int") + 1,
        )

    url = F.concat(
        pick(["HTTP", "https", "http"], 3),
        F.lit("://"),
        pick(_URL_MODEL_HOSTS, 13),
        pick([":80", ":443", ":8080", "", ""], 5),
        F.lit("/p/"), (mid % 50).cast("string"),
        pick(["?utm_source=x&b=2&a=1", "?a=1&fbclid=zz", "?b=2&a=1", ""], 4),
        F.when(mid % 2 == 0, F.lit("#frag")).otherwise(F.lit("")),
    )
    return df.select(mid.alias(id_col), url.alias("url"))


# --- robots.txt politeness filtering (crawl curation stage) -----------

def _robots_fold(robots_text, user_agent: str) -> Column:
    """THE robots.txt state machine — one aggregate fold over the
    lines shared by every parse surface (rules, crawl-delay), so the
    RFC 9309 group semantics live in exactly one place: ``User-agent:``
    lines open a group (several in a row share one rule block); a
    group applies if it names the agent exactly or ``*``; ``Disallow:``
    / ``Allow:`` lines inside an applying group contribute a rule
    struct<pfx:string, allow:boolean>; the first ``Crawl-delay:`` in
    an applying group sets delay (non-numeric values ignored);
    empty-value rules (RFC: ignored) and comment / unknown lines are
    inert, but every non-UA directive CLOSES the consecutive-UA run.
    Returns struct<rules:array<struct<pfx,allow>>, delay:int>."""
    lines = F.split(F.coalesce(robots_text, F.lit("")), r"\r?\n")
    ua = F.lit(user_agent.lower())

    def rule(pfx, allow):
        return F.struct(pfx.alias("pfx"), allow.alias("allow"))

    def step(acc, line):
        # acc: struct<active:bool, in_group:bool,
        #             rules:array<struct<pfx,allow>>, delay:int>
        t = F.trim(F.regexp_replace(line, r"#.*$", ""))
        low = F.lower(t)
        # value = everything after the FIRST colon (paths may contain
        # ':'), trimmed
        val = F.trim(F.regexp_replace(t, r"^[^:]*:", ""))
        is_ua = low.rlike(r"^user-agent\s*:")
        is_dis = low.rlike(r"^disallow\s*:")
        is_allow = low.rlike(r"^allow\s*:")
        is_delay = low.rlike(r"^crawl-delay\s*:")
        applies = (F.lower(val) == ua) | (val == F.lit("*"))
        return (
            F.when(
                is_ua,
                F.struct(
                    # consecutive User-agent lines OR into one group;
                    # a UA line after rules starts a fresh group
                    F.when(
                        acc["in_group"], acc["active"] | applies
                    ).otherwise(applies).alias("active"),
                    F.lit(True).alias("in_group"),
                    acc["rules"].alias("rules"),
                    acc["delay"].alias("delay"),
                ),
            )
            .when(
                is_dis | is_allow,
                F.struct(
                    acc["active"].alias("active"),
                    F.lit(False).alias("in_group"),
                    F.when(
                        acc["active"] & (val != F.lit("")),
                        F.array_append(acc["rules"], rule(val, is_allow)),
                    ).otherwise(acc["rules"]).alias("rules"),
                    acc["delay"].alias("delay"),
                ),
            )
            .when(
                is_delay,
                F.struct(
                    acc["active"].alias("active"),
                    F.lit(False).alias("in_group"),
                    acc["rules"].alias("rules"),
                    F.coalesce(
                        acc["delay"],
                        F.when(
                            acc["active"] & val.rlike(r"^[0-9]+$"),
                            val.cast("int"),
                        ),
                    ).alias("delay"),
                ),
            )
            .otherwise(
                F.struct(
                    acc["active"].alias("active"),
                    F.lit(False).alias("in_group"),
                    acc["rules"].alias("rules"),
                    acc["delay"].alias("delay"),
                )
            )
        )

    init = F.struct(
        F.lit(False).alias("active"),
        F.lit(False).alias("in_group"),
        F.array().cast(
            "array<struct<pfx:string, allow:boolean>>"
        ).alias("rules"),
        F.lit(None).cast("int").alias("delay"),
    )
    return F.aggregate(lines, init, step, lambda acc: acc)


def robots_rules(robots_text, user_agent: str = "*") -> Column:
    """The array of (pfx, allow) rules that apply to ``user_agent`` —
    a projection of the one shared ``_robots_fold`` state machine.
    Precedence between the collected rules is the MATCHER's job
    (robots_filter: longest match wins, Allow wins length ties) —
    rule ORDER inside the array therefore does not matter, matching
    the RFC. Pattern wildcards (``*``/``$`` inside a path) are out of
    scope of this rule core (documented; prefix semantics only).
    NULL text parses to an empty array (no restrictions)."""
    return _robots_fold(robots_text, user_agent)["rules"]


def robots_disallows(robots_text, user_agent: str = "*") -> Column:
    """Disallow-prefix view of robots_rules (the pre-r8 rule core's
    shape, kept as the convenient projection for disallow-only
    consumers): the array of Disallow path prefixes that apply to
    ``user_agent``, in document order."""
    return F.transform(
        F.filter(
            robots_rules(robots_text, user_agent), lambda r: ~r["allow"]
        ),
        lambda r: r["pfx"],
    )


def robots_sitemaps(robots_text) -> Column:
    """Array of ``Sitemap:`` URLs in a robots.txt body — per RFC 9309
    / sitemaps.org these are GROUP-INDEPENDENT (they apply regardless
    of User-agent, so no state machine is needed): one codegen
    filter+transform over the lines, comments stripped, empty values
    dropped. NULL text yields an empty array. Feeds crawl frontier
    seeding next to the (rules, crawl_delay) politeness pair."""
    lines = F.split(F.coalesce(robots_text, F.lit("")), r"\r?\n")

    def clean(line):
        return F.trim(F.regexp_replace(line, r"#.*$", ""))

    return F.transform(
        F.filter(
            lines,
            lambda x: F.lower(clean(x)).rlike(r"^sitemap\s*:")
            & (F.trim(F.regexp_replace(clean(x), r"^[^:]*:", "")) != ""),
        ),
        lambda x: F.trim(F.regexp_replace(clean(x), r"^[^:]*:", "")),
    )


def robots_crawl_delay(robots_text, user_agent: str = "*") -> Column:
    """First ``Crawl-delay:`` value (seconds, INT) inside a group that
    applies to ``user_agent``; NULL when no applying group sets one,
    the value is non-numeric, or the text is NULL — the same shared
    ``_robots_fold`` state machine, projected to its delay slot (the
    directive is a de-facto extension — not part of RFC 9309 — but
    real crawl corpora carry it constantly, and a politeness
    scheduler needs it next to the rule set)."""
    return _robots_fold(robots_text, user_agent)["delay"]


def url_path(url) -> Column:
    """Path component of a URL ('' when the URL does not parse)."""
    return F.regexp_extract(url, URL_REGEX, 4)


def robots_filter(
    docs: DataFrame,
    robots: DataFrame,
    url_col: str = "url",
    domain_col: str = "domain",
    rules_col: str = "rules",
) -> DataFrame:
    """Filter crawled documents by robots.txt rules with the RFC 9309
    precedence: among the rules whose prefix matches the URL's path,
    the LONGEST match decides, and an Allow wins a length tie — so an
    ``Allow: /p/12`` overrides a shorter ``Disallow: /p/1`` exactly as
    the RFC's most-specific-rule clause requires. No matching rule
    (or no robots row for the domain) means allowed. ``robots`` is
    (domain, rules array<struct<pfx:string, allow:boolean>>) — one
    row per domain, e.g. robots_rules over fetched bodies. Returns
    the input plus (domain, blocked) plus any EXTRA columns carried on
    the robots side (e.g. crawl_delay — r14: politeness metadata rides
    the one broadcast instead of forcing callers into a second
    broadcast join whose subtree recomputes the whole domain parse).

    Scale shape: domains number FAR fewer than documents and the rule
    arrays are tiny, so the robots side is an explicit BROADCAST
    joined on the domain key — the corpus is scanned once, never
    shuffled; the longest-match scan is an aggregate() HOF over the
    matching rules, all in codegen."""
    d = docs.withColumn("__dom", url_domain(F.col(url_col)))
    extras = [c for c in robots.columns if c not in (domain_col, rules_col)]
    r = robots.select(
        F.col(domain_col).alias("__dom"),
        F.col(rules_col).alias("__rules"),
        *[F.col(c) for c in extras],
    )
    path = url_path(F.col(url_col))
    matching = F.filter("__rules", lambda x: path.startswith(x["pfx"]))
    # fold to the decisive rule: (best_len, allow); ties OR in the
    # allow bit so Allow beats Disallow at equal specificity,
    # independent of rule order (RFC 9309 precedence)
    best = F.aggregate(
        matching,
        F.struct(
            F.lit(-1).alias("len"), F.lit(True).alias("allow")
        ),
        lambda acc, x: (
            F.when(
                F.length(x["pfx"]) > acc["len"],
                F.struct(
                    F.length(x["pfx"]).alias("len"),
                    x["allow"].alias("allow"),
                ),
            )
            .when(
                F.length(x["pfx"]) == acc["len"],
                F.struct(
                    acc["len"].alias("len"),
                    (acc["allow"] | x["allow"]).alias("allow"),
                ),
            )
            .otherwise(acc)
        ),
    )
    blocked = F.coalesce(~best["allow"], F.lit(False))
    return d.join(F.broadcast(r), "__dom", "left").select(
        *[F.col(c) for c in docs.columns],
        F.col("__dom").alias("domain"),
        blocked.alias("blocked"),
        *[F.col(c) for c in extras],
    )


def synthesize_robots_bodies(
    domains: DataFrame, domain_col: str = "domain"
) -> DataFrame:
    """Deterministic robots.txt bodies from an integer generative
    model of the DOMAIN STRING (the messy-URL synthesizer idiom, so a
    DuckDB oracle replays the expected blocked set in closed form
    without parsing any text): variant = length(domain) % 4. The r8
    bodies exercise the full RFC 9309 precedence — every variant with
    rules carries an Allow-overrides-Disallow case or an equal-length
    tie (VERDICT r7 directive #3's done-criterion):

      v0: ``User-agent: *`` Disallow /p/1 + /q/, Allow /p/12
          (longest match re-opens /p/12x), Crawl-delay 2 (+ comment
          and a trailing-spaces line the parser must trim)
      v1: a ``SomeOtherBot`` full-block group — whose ``Allow: /``
          must not leak either — FOLLOWED by a ``*`` group with
          Disallow /p/2, Allow /p/22, Crawl-delay 5
      v2: comment + empty-value ``Disallow:`` / ``Allow:`` — both
          inert, allow-all, no delay
      v3: consecutive ``User-agent: *`` / ``User-agent: FancyBot``
          lines sharing one block (group OR semantics) where
          ``Allow: /p/3`` sits BETWEEN ``Disallow: /p/3`` and
          ``Disallow: /p/4`` — the equal-length tie goes to Allow
          and rule order must not matter

    Closed form for agent ``*``: blocked(path) =
      v0: (path LIKE '/p/1%' AND path NOT LIKE '/p/12%')
          OR path LIKE '/q/%'                            (delay 2)
      v1: path LIKE '/p/2%' AND path NOT LIKE '/p/22%'   (delay 5)
      v2: false                                          (delay NULL)
      v3: path LIKE '/p/4%'                              (delay NULL)

    Returns (domain_col, robots_txt)."""
    v = (F.length(F.col(domain_col)) % 4).cast("int")
    body = (
        F.when(
            v == 0,
            F.lit(
                "# generated\nUser-agent: *\nDisallow: /p/1\n"
                "Disallow:   /q/   \nAllow: /p/12\nCrawl-delay: 2\n"
            ),
        )
        .when(
            v == 1,
            F.lit(
                "User-agent: SomeOtherBot\nDisallow: /\nAllow: /\n\n"
                "User-agent: *\nDisallow: /p/2\nAllow: /p/22\n"
                "Crawl-delay: 5\n"
            ),
        )
        .when(
            v == 2,
            F.lit("# open site\nUser-agent: *\nDisallow:\nAllow:\n"),
        )
        .otherwise(
            F.lit(
                "User-agent: *\nUser-agent: FancyBot\nDisallow: /p/3\n"
                "Allow: /p/3\nDisallow: /p/4\n"
            )
        )
    )
    return domains.select(F.col(domain_col), body.alias("robots_txt"))
