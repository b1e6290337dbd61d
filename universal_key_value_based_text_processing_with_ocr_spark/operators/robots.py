"""robots.txt parsing and RFC 9309 URL gating, declaratively.

A crawl-derived corpus has to answer "was this fetch even allowed?" —
retroactive robots filtering (and the crawl-delay / sitemap inventory)
is a standard audit stage over web corpora.  Two operators:

- ``parse_robots``: robots.txt bodies -> one typed rule row per
  (host, group, agent, directive, pattern) plus sitemap rows.  The
  line-grouping semantics of RFC 9309 §2.2 (consecutive ``User-agent``
  lines share the following rule block; a ``User-agent`` line after
  rules starts a NEW group) are expressed with two window functions
  over the exploded lines — no UDF, no driver-side parsing.
- ``apply_robots``: gate a URL table against the rule table.  Group
  choice per RFC: a host that defines a group for the product token
  uses ONLY those groups, else the ``*`` groups, else everything is
  allowed.  Match precedence: longest pattern (in octets) wins; on
  equal length Allow beats Disallow; no matching rule means allowed.
  ``*`` wildcards and the ``$`` end-anchor are supported by compiling
  each pattern to an anchored regex IN THE PLAN (nested regexp_replace
  over the pattern column — both the translation and the match are
  codegen'd JVM expressions).

Reference analog: the engine's key-dictionary config (kvcore/config.py)
declares which keys to extract; robots.txt is the web's own per-host
key-dictionary declaring which PATHS to fetch, evaluated with the same
longest-match-wins discipline as the key matcher's best-score pick
(kvcore/matching.py).

Scale shape: parsing is explode + two windows partitioned by host (one
shuffle on the natural key); the gate is one join on host — rules
tables are tiny relative to URL tables (one row per robots line), so
at 100 TB the join broadcasts; per-URL work is a handful of codegen'd
regex ops.  Rule pathology (a host with millions of rules) is bounded
by ``max_rules_per_host``: rules past the cap (in file order) are
dropped with the same documented-divergence contract real crawlers use
(Google reads only the first 500 KiB of a robots.txt).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: keep the first N rule lines per host (file order).  RFC 9309 lets a
#: crawler impose a parse limit; Googlebot caps the FILE at 500 KiB.
MAX_RULES_PER_HOST = 5000

_DIRECTIVE = r"(?i)^(user-agent|allow|disallow|crawl-delay|sitemap)\s*:\s*(.*)$"


def parse_robots(
    robots: DataFrame,
    host_col: str = "host",
    body_col: str = "robots_txt",
    max_rules_per_host: int = MAX_RULES_PER_HOST,
) -> DataFrame:
    """One row per parsed directive: (host, line_no, group_id, agent,
    directive, pattern).  ``agent`` is the lowercased user-agent token a
    rule row belongs to (rule rows are replicated once per agent in
    their group — RFC 9309 group semantics); ``sitemap`` and malformed
    lines carry agent NULL.  Comments (#...) and blank lines dropped."""
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(
            F.split(F.coalesce(F.col(body_col), F.lit("")), r"\r?\n")
        ).alias("line_no", "raw"),
    ).select(
        "host",
        "line_no",
        F.trim(F.regexp_replace("raw", r"#.*$", "")).alias("line"),
    ).where(F.col("line") != "")
    parsed = lines.select(
        "host",
        "line_no",
        F.lower(F.regexp_extract("line", _DIRECTIVE, 1)).alias("directive"),
        F.trim(F.regexp_extract("line", _DIRECTIVE, 2)).alias("value"),
    ).where(F.col("directive") != "")
    w = Window.partitionBy("host").orderBy("line_no")
    # a user-agent line starts a new group iff the previous directive
    # line was NOT user-agent (consecutive UA lines share one group)
    grouped = parsed.select(
        "*",
        F.sum(
            F.when(
                (F.col("directive") == "user-agent")
                & (F.coalesce(F.lag("directive").over(w), F.lit("")) != "user-agent"),
                1,
            ).otherwise(0)
        ).over(w).alias("group_id"),
    )
    agents = (
        grouped.where(F.col("directive") == "user-agent")
        .groupBy("host", "group_id")
        .agg(F.collect_set(F.lower(F.col("value"))).alias("_agents"))
    )
    rules = grouped.where(
        F.col("directive").isin("allow", "disallow", "crawl-delay")
    )
    wcap = Window.partitionBy("host").orderBy("line_no")
    rules = (
        rules.withColumn("_rk", F.row_number().over(wcap))
        .where(F.col("_rk") <= max_rules_per_host)
        .drop("_rk")
    )
    ruled = (
        rules.join(agents, ["host", "group_id"], "left")
        .select(
            "host",
            "line_no",
            "group_id",
            F.explode_outer("_agents").alias("agent"),
            "directive",
            F.col("value").alias("pattern"),
        )
    )
    sitemaps = grouped.where(F.col("directive") == "sitemap").select(
        "host",
        "line_no",
        "group_id",
        F.lit(None).cast("string").alias("agent"),
        "directive",
        F.col("value").alias("pattern"),
    )
    return ruled.unionByName(sitemaps)


def _pattern_regex(pattern) -> F.Column:
    """Compile a robots path pattern to an anchored Java/RE2 regex, in
    the plan: escape regex metacharacters, ``*`` -> ``.*``, a trailing
    ``$`` becomes the end anchor (a literal ``$`` elsewhere stays
    escaped).  Shared dialect: every emitted construct (escapes, ``.*``,
    anchors) means the same thing in Java regex and RE2."""
    ends_anchored = pattern.rlike(r"\$$")
    body = F.regexp_replace(pattern, r"\$$", "")
    esc = F.regexp_replace(body, r"([.\\+?^$(){}\[\]|])", r"\\$1")
    wild = F.regexp_replace(esc, r"\*", ".*")
    return F.concat(
        F.lit("^"), wild, F.when(ends_anchored, F.lit("$")).otherwise(F.lit(""))
    )


def apply_robots(
    urls: DataFrame,
    rules: DataFrame,
    agent: str = "*",
    url_col: str = "url",
) -> DataFrame:
    """Gate ``urls`` against parsed ``rules`` for ``agent``: adds
    (host, path, allowed, rule_pattern, rule_directive).  RFC 9309:
    exact agent-token groups win over ``*`` groups; longest pattern (in
    octets, BEFORE regex translation) wins; equal length -> Allow wins;
    no rule / no robots.txt / empty pattern -> allowed.

    Group EXISTENCE is decided over every rule row of the group —
    including empty-pattern and crawl-delay rows — and only then are the
    non-matchable rows dropped: the common exemption idiom
    ``User-agent: x / Disallow:`` (empty = allow everything) must select
    x's empty group and shadow the ``*`` rules, not fall through to
    them.  (A group declared with NO rule lines at all still falls
    through — parse_robots emits rows per rule, so a rule-less group is
    invisible here; real files exempt with the empty Disallow.)"""
    agent = agent.lower()
    rdir = rules.where(F.col("directive").isin("allow", "disallow", "crawl-delay"))
    has_exact = rdir.groupBy("host").agg(
        F.max((F.col("agent") == agent).cast("int")).alias("_has_exact")
    )
    r = (
        rdir.where(F.col("directive").isin("allow", "disallow"))
        .where(F.col("pattern") != "")
        .join(has_exact, "host")
        .where(
            ((F.col("agent") == agent) & (F.col("_has_exact") == 1))
            | ((F.col("agent") == "*") & (F.col("_has_exact") == 0))
        )
        .select(
            "host",
            F.col("directive").alias("rule_directive"),
            F.col("pattern").alias("rule_pattern"),
            F.octet_length("pattern").alias("_plen"),
            _pattern_regex(F.col("pattern")).alias("_pregex"),
        )
    )
    u = urls.select(
        "*",
        # per-row identity so duplicate URLs each keep their own gate row
        # (the window below picks the best RULE per input row, never
        # collapsing input rows)
        F.monotonically_increasing_id().alias("_uid"),
        F.lower(F.regexp_extract(url_col, r"^https?://([^/]+)", 1)).alias("host"),
        F.coalesce(
            F.nullif(F.regexp_extract(url_col, r"^https?://[^/]+(/[^#?]*)", 1), F.lit("")),
            F.lit("/"),
        ).alias("path"),
    )
    joined = u.join(r, "host", "left").withColumn(
        "_hit", F.col("_pregex").isNotNull() & F.expr("path rlike _pregex")
    )
    # argmax via max_by, NOT a row_number window: the per-URL pick is
    # then a partial-aggregatable groupBy (map-side combine over the
    # join output) instead of a full sort shuffle of |urls|x|rules|
    # rows.  Precedence key, lexicographic: matched > longer pattern >
    # Allow beats Disallow > pattern text (a pure determinism
    # tie-break for byte-identical duplicate rules).
    key = F.struct(
        F.col("_hit").cast("int").alias("h"),
        F.coalesce(F.col("_plen"), F.lit(-1)).alias("l"),
        F.coalesce(
            (F.col("rule_directive") == "allow").cast("int"), F.lit(0)
        ).alias("a"),
        F.coalesce(F.col("rule_pattern"), F.lit("")).alias("p"),
    )
    val = F.struct(
        F.col("_hit").alias("hit"),
        F.col("rule_pattern").alias("pat"),
        F.col("rule_directive").alias("dir"),
    )
    carried = [c for c in urls.columns] + ["host", "path"]
    best = joined.groupBy("_uid").agg(
        *[F.first(c).alias(c) for c in carried],
        F.max_by(val, key).alias("_best"),
    )
    return best.select(
        *carried,
        F.when(F.col("_best.hit"), F.col("_best.pat")).alias("rule_pattern"),
        F.when(F.col("_best.hit"), F.col("_best.dir")).alias("rule_directive"),
        F.coalesce(
            F.when(F.col("_best.hit"), F.col("_best.dir") == "allow"),
            F.lit(True),
        ).alias("allowed"),
    )


#: one <url>...</url> (or <sitemap>...</sitemap>) block; (?s) so the
#: block may span lines — supported identically by Java regex and RE2.
_URL_BLOCK = r"(?s)<url>(.*?)</url>"
_IDX_BLOCK = r"(?s)<sitemap>(.*?)</sitemap>"


def parse_sitemaps(
    sitemaps: DataFrame, host_col: str = "host", xml_col: str = "sitemap_xml"
) -> DataFrame:
    """Sitemap XML -> typed rows: (host, loc, lastmod, changefreq,
    priority, from_index).  Handles both <urlset> leaf sitemaps and
    <sitemapindex> index files (child-sitemap entries come back with
    ``from_index`` true, so a driver loop can fetch-and-recurse —
    fetching is I/O, outside this operator's scope).  Pure codegen'd
    regex projection + one explode; missing optional fields are NULL;
    ``priority`` keeps sitemap's 0.0-1.0 decimal as a string to stay
    bit-exact (consumers cast as needed)."""
    x = F.coalesce(F.col(xml_col), F.lit(""))

    def _field(block, tag):
        return F.nullif(
            F.trim(
                F.regexp_extract(block, rf"(?s)<{tag}[^>]*>([^<]*)</{tag}>", 1)
            ),
            F.lit(""),
        )

    def _rows(pattern, from_index):
        base = sitemaps.select(
            F.col(host_col).alias("host"),
            F.explode(F.regexp_extract_all(x, F.lit(pattern), F.lit(1))).alias(
                "_b"
            ),
        )
        b = F.col("_b")
        return base.select(
            "host",
            _field(b, "loc").alias("loc"),
            _field(b, "lastmod").alias("lastmod"),
            _field(b, "changefreq").alias("changefreq"),
            _field(b, "priority").alias("priority"),
            F.lit(from_index).alias("from_index"),
        ).where(F.col("loc").isNotNull())

    return _rows(_URL_BLOCK, False).unionByName(_rows(_IDX_BLOCK, True))


# Feed blocks: RSS 2.0 <item> and Atom <entry>, attributes tolerated on
# the opening tag.  (?s) lets a block span lines.
_RSS_ITEM_BLOCK = r"(?s)<item(?:\s[^>]*)?>(.*?)</item>"
_ATOM_ENTRY_BLOCK = r"(?s)<entry(?:\s[^>]*)?>(.*?)</entry>"


def parse_feeds(
    feeds: DataFrame, host_col: str = "host", xml_col: str = "feed_xml"
) -> DataFrame:
    """RSS 2.0 / Atom feed XML -> typed rows: (host, kind, title, link,
    entry_id, published) — the discovery-source sibling of
    :func:`parse_sitemaps` (crawl pipelines poll feeds for fresh URLs the
    sitemap hasn't listed yet; the links feed the frontier exactly like
    sitemap locs).

    One payload may carry BOTH formats (feed autodiscovery often finds
    both) — every <item> comes back kind='rss', every <entry>
    kind='atom'.  Per format:

    - rss:  link from <link>text</link>, id from <guid> (attributes on
      the tag tolerated), published from <pubDate>;
    - atom: link from the FIRST <link ... href="..."/> attribute (Atom
      links are attributes, not text), id from <id>, published from
      <updated>.

    Titles may be CDATA-wrapped (feeds routinely escape markup that
    way); the wrapper is stripped, inner whitespace trimmed.  Entries
    with no resolvable link are dropped (a frontier can do nothing with
    them — same posture as parse_sitemaps' loc-less <url>); every other
    missing field is NULL.  Timestamps stay RAW STRINGS: RFC 822 / RFC
    3339 forms pass through bit-exact for consumers to cast (the same
    stay-a-string decision as sitemap priority).

    Pure codegen'd regex projection + one explode per format, unioned —
    no UDF, no shuffle; at 100 TB this fuses onto the feed scan.
    """
    x = F.coalesce(F.col(xml_col), F.lit(""))

    def _text(block, tag):
        raw = F.regexp_extract(block, rf"(?s)<{tag}[^>]*>(.*?)</{tag}>", 1)
        no_cdata = F.regexp_replace(
            raw, r"(?s)^\s*<!\[CDATA\[(.*?)\]\]>\s*$", "$1"
        )
        return F.nullif(F.trim(no_cdata), F.lit(""))

    def _rows(pattern, kind, link_expr, id_tag, date_tag):
        base = feeds.select(
            F.col(host_col).alias("host"),
            F.explode(F.regexp_extract_all(x, F.lit(pattern), F.lit(1))).alias(
                "_b"
            ),
        )
        b = F.col("_b")
        return base.select(
            "host",
            F.lit(kind).alias("kind"),
            _text(b, "title").alias("title"),
            link_expr(b).alias("link"),
            _text(b, id_tag).alias("entry_id"),
            _text(b, date_tag).alias("published"),
        ).where(F.col("link").isNotNull())

    rss = _rows(
        _RSS_ITEM_BLOCK,
        "rss",
        lambda b: _text(b, "link"),
        "guid",
        "pubDate",
    )
    atom = _rows(
        _ATOM_ENTRY_BLOCK,
        "atom",
        lambda b: F.nullif(
            F.regexp_extract(b, r'(?s)<link[^>]*\bhref="([^"]*)"', 1),
            F.lit(""),
        ),
        "id",
        "updated",
    )
    return rss.unionByName(atom)
