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

Registrable-domain heuristic: the last two host labels, or three when
the final two form a known multi-label suffix (_CC_SECOND_LEVEL — the
public-suffix-list swap point; the PSL is a data file, the machinery
is identical).

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

# multi-label public suffixes the domain heuristic knows about — an
# embedded ~380-entry snapshot of the 2-label ICANN suffixes from the
# Public Suffix List (see functions/psl.py for scope + the full-PSL
# swap point); compiled into the plan as a codegen InSet hash lookup.
from .psl import PUBLIC_SUFFIX_2LABEL as _CC_SECOND_LEVEL


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
    """Registrable domain of a URL (last-2-labels heuristic with the
    _CC_SECOND_LEVEL multi-label suffixes); NULL when the URL does
    not parse or the host has fewer than 2 labels."""
    host = url_host(url)
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(
        ".", F.element_at(labels, -2), F.element_at(labels, -1)
    )
    last3 = F.concat_ws(
        ".", F.element_at(labels, -3), F.element_at(labels, -2),
        F.element_at(labels, -1),
    )
    is_cc = last2.isin(*_CC_SECOND_LEVEL)
    # concat_ws silently skips NULL parts, so a NULL input must be
    # short-circuited explicitly or it would canonicalize to ''
    return (
        F.when(
            host.isNull() | (host == F.lit("")) | (n < 2),
            F.lit(None).cast("string"),
        )
        .when(is_cc & (n >= 3), last3)
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
# multi-label public suffixes across THREE ccTLDs (co.uk from the
# original 8-entry heuristic, com.cn and gob.mx only present in the
# r7 PSL snapshot — so the driver row proves the expanded list)
_URL_MODEL_HOSTS = (
    "Example.COM", "news.example.com", "blog.Example.co.uk",
    "cdn.site.ORG", "shop.site.org", "www.Portal.NET", "api.portal.net",
    "WWW.Shop.COM.CN", "tienda.Ejemplo.gob.mx",
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
        pick(_URL_MODEL_HOSTS, 9),
        pick([":80", ":443", ":8080", "", ""], 5),
        F.lit("/p/"), (mid % 50).cast("string"),
        pick(["?utm_source=x&b=2&a=1", "?a=1&fbclid=zz", "?b=2&a=1", ""], 4),
        F.when(mid % 2 == 0, F.lit("#frag")).otherwise(F.lit("")),
    )
    return df.select(mid.alias(id_col), url.alias("url"))


# --- robots.txt politeness filtering (crawl curation stage) -----------

def robots_disallows(robots_text, user_agent: str = "*") -> Column:
    """Parse a robots.txt body into the array of Disallow path
    prefixes that apply to ``user_agent`` — entirely in codegen (one
    aggregate fold over the lines, no UDF). Implements the core of
    the public robots exclusion protocol (RFC 9309) group semantics:
    ``User-agent:`` lines open a group (several in a row share one
    rule block); a group applies if it names the agent exactly or
    ``*``; ``Disallow:`` lines inside an applying group contribute
    their prefix; empty Disallow values (allow-all) and comment /
    unknown lines are ignored. Crawl-delay/Allow precedence are out
    of scope of this rule core (documented; a full matcher is a
    drop-in over the same per-line fold). NULL text parses to an
    empty array (no restrictions)."""
    lines = F.split(F.coalesce(robots_text, F.lit("")), r"\r?\n")
    ua = F.lit(user_agent.lower())

    def step(acc, line):
        # acc: struct<active:boolean, in_group:boolean, pfx:array<string>>
        t = F.trim(F.regexp_replace(line, r"#.*$", ""))
        low = F.lower(t)
        # value = everything after the FIRST colon (paths may contain
        # ':'), trimmed
        val = F.trim(F.regexp_replace(t, r"^[^:]*:", ""))
        is_ua = low.rlike(r"^user-agent\s*:")
        is_dis = low.rlike(r"^disallow\s*:")
        pfx = val
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
                    acc["pfx"].alias("pfx"),
                ),
            )
            .when(
                is_dis,
                F.struct(
                    acc["active"].alias("active"),
                    F.lit(False).alias("in_group"),
                    F.when(
                        acc["active"] & (pfx != F.lit("")),
                        F.array_append(acc["pfx"], pfx),
                    ).otherwise(acc["pfx"]).alias("pfx"),
                ),
            )
            .otherwise(
                F.struct(
                    acc["active"].alias("active"),
                    F.lit(False).alias("in_group"),
                    acc["pfx"].alias("pfx"),
                )
            )
        )

    init = F.struct(
        F.lit(False).alias("active"),
        F.lit(False).alias("in_group"),
        F.array().cast("array<string>").alias("pfx"),
    )
    return F.aggregate(lines, init, step, lambda acc: acc["pfx"])


def url_path(url) -> Column:
    """Path component of a URL ('' when the URL does not parse)."""
    return F.regexp_extract(url, URL_REGEX, 4)


def robots_filter(
    docs: DataFrame,
    robots: DataFrame,
    url_col: str = "url",
    domain_col: str = "domain",
    disallow_col: str = "disallows",
) -> DataFrame:
    """Filter crawled documents by robots.txt rules: a document is
    blocked iff its URL's path starts with ANY disallowed prefix of
    its registrable domain (prefix semantics of the robots exclusion
    protocol's rule core). ``robots`` is (domain, disallows
    array<string>) — one row per domain, e.g. robots_disallows over
    fetched robots bodies. Returns the input plus (domain, blocked).

    Scale shape: domains number FAR fewer than documents and the
    disallow arrays are tiny, so the robots side is an explicit
    BROADCAST joined on the domain key — the corpus is scanned once,
    never shuffled; the prefix test is an exists() HOF in codegen."""
    d = docs.withColumn("__dom", url_domain(F.col(url_col)))
    r = robots.select(
        F.col(domain_col).alias("__dom"),
        F.col(disallow_col).alias("__dis"),
    )
    path = url_path(F.col(url_col))
    blocked = F.coalesce(
        F.exists("__dis", lambda p: path.startswith(p)),
        F.lit(False),
    )
    return d.join(F.broadcast(r), "__dom", "left").select(
        *[F.col(c) for c in docs.columns],
        F.col("__dom").alias("domain"),
        blocked.alias("blocked"),
    )


def synthesize_robots_bodies(
    domains: DataFrame, domain_col: str = "domain"
) -> DataFrame:
    """Deterministic robots.txt bodies from an integer generative
    model of the DOMAIN STRING (the messy-URL synthesizer idiom, so a
    DuckDB oracle replays the expected blocked set in closed form
    without parsing any text): variant = length(domain) % 4.

      v0: ``User-agent: *`` with Disallow /p/1 and /q/ (+ comment and
          a trailing-spaces line the parser must trim)
      v1: a ``SomeOtherBot`` full-block group FOLLOWED by a ``*``
          group disallowing /p/2 — group isolation: the /  of the
          other agent must not leak into *
      v2: comment + ``Disallow:`` with empty value — allow-all
      v3: consecutive ``User-agent: *`` / ``User-agent: FancyBot``
          lines sharing one Disallow /p/ block — group OR semantics

    Closed form for agent ``*``: blocked(path) =
      v0: path LIKE '/p/1%' OR path LIKE '/q/%'
      v1: path LIKE '/p/2%'
      v2: false
      v3: path LIKE '/p/%'

    Returns (domain_col, robots_txt)."""
    v = (F.length(F.col(domain_col)) % 4).cast("int")
    body = (
        F.when(
            v == 0,
            F.lit(
                "# generated\nUser-agent: *\nDisallow: /p/1\n"
                "Disallow:   /q/   \nCrawl-delay: 2\n"
            ),
        )
        .when(
            v == 1,
            F.lit(
                "User-agent: SomeOtherBot\nDisallow: /\n\n"
                "User-agent: *\nDisallow: /p/2\n"
            ),
        )
        .when(v == 2, F.lit("# open site\nUser-agent: *\nDisallow:\n"))
        .otherwise(
            F.lit(
                "User-agent: *\nUser-agent: FancyBot\nDisallow: /p/\n"
            )
        )
    )
    return domains.select(F.col(domain_col), body.alias("robots_txt"))
