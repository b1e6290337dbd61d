"""Host link graph: outlink extraction, fixed-point PageRank, anchor text.

Web-corpus quality weighting needs a signal that no per-document score
can provide: how the rest of the web regards a host.  Common Crawl ships
exactly this next to every crawl (the host-level web graph + harmonic
centrality / PageRank ranks), and curation pipelines join it back onto
documents as a quality prior.  Three operators:

- ``extract_outlinks``: ``<a href>`` extraction from raw HTML as a pure
  codegen'd regex projection (no UDF, fuses onto the scan), with
  root-relative URL resolution against the page URL, scheme filtering
  (http/https only — ``javascript:``/``mailto:``/fragment links
  dropped), and the ``rel=nofollow`` bit every link-graph build needs.
- ``pagerank_hosts``: power-iteration PageRank over the host graph in
  FIXED-POINT integer arithmetic.  Float PageRank cannot be
  hash-compared across engines (grouped float sums are order-dependent);
  here every rank is a BIGINT in units of 1e-12, contributions divide
  with integral ``DIV``, and the damping multiply is ``* 85 DIV 100``,
  so Spark and the DuckDB oracle agree bit-for-bit at every iteration.
  Truncation leaks ≤1 unit per edge per iteration of rank mass — a
  relative error of ~1e-9 on realistic graphs, far below the signal;
  the CONTRACT is the fixed-point algorithm, not a float approximation.
  Dangling-node mass is redistributed uniformly each iteration (the
  standard correction) as a 1-row broadcast scalar, never an N×N join.
- ``anchor_text_stats``: top-k anchor tokens per TARGET host (the
  classic relevance signal: what other sites call a page), with a fully
  deterministic (count desc, token asc) tie-break.

Reference analog: the engine's key->value association sweeps
(kvcore/matching.py) operate within one document; this family is the
cross-document version — page A's markup describing page B — which only
exists at corpus scope and is the canonical iterative-join workload on a
cluster.

Scale shape: extraction is a projection (no shuffle); the host-graph
rollup is one map-side-combinable groupBy; each PageRank iteration is
join(ranks, edges on src) -> groupBy(dst) — two exchanges on the SAME
key spine, so with ranks and edges co-partitioned on host the join is
shuffle-free after iteration 1 (Spark reuses the exchange; on a real
cluster you'd bucket both by host).  ``n_iter`` is a constant (5-20), so
the lineage stays shallow; no collect, no driver loop over data — the
driver only unrolls the fixed iteration count into the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .importance import TOKEN_SPLIT

#: fixed-point scale: ranks are BIGINTs in units of 1e-12.  2^63 / 1e12
#: ≈ 9.2e6 total mass units, so graphs up to ~9M hosts of total mass 1.0
#: per host fit without overflow; beyond that drop SCALE a decade.
SCALE = 1_000_000_000_000

#: an <a ...> open tag followed by its visible anchor run; href value in
#: double or single quotes.  RE2-safe dialect (no backreferences, [^<]
#: instead of dot-matches-newline) shared verbatim with the oracle.
_A_DQ = r'(?i)<a\s[^>]*href="([^"]*)"[^>]*>([^<]*)'
_A_SQ = r"(?i)<a\s[^>]*href='([^']*)'[^>]*>([^<]*)"


def extract_outlinks(
    pages: DataFrame, url_col: str = "url", html_col: str = "html_str"
) -> DataFrame:
    """(src_url, href, anchor, nofollow) per ``<a>`` tag, then resolved:
    absolute http(s) links kept as-is, root-relative ``/path`` resolved
    against the source page's scheme+host, everything else (javascript:,
    mailto:, #fragment, protocol-relative, path-relative) dropped —
    the conservative resolution a link-graph build wants (path-relative
    resolution needs full RFC 3986 dot-segment handling; the graph loses
    almost nothing by skipping those links and never mis-attributes).

    Output columns: src_url, src_host, dst_url, dst_host, anchor (text
    run after the tag, trimmed, NULL if empty), nofollow (boolean).
    One row per kept link; pages with no links contribute no rows.
    """
    h = F.coalesce(F.col(html_col), F.lit(""))
    src = F.coalesce(F.col(url_col), F.lit(""))
    # both quote styles, one array of [href, anchor, nofollow_src] structs
    tags = F.concat(
        F.transform(
            F.regexp_extract_all(h, F.lit(_A_DQ), F.lit(0)),
            lambda t: F.struct(
                F.regexp_extract(t, _A_DQ, 1).alias("href"),
                F.regexp_extract(t, _A_DQ, 2).alias("anchor"),
                t.alias("tag"),
            ),
        ),
        F.transform(
            F.regexp_extract_all(h, F.lit(_A_SQ), F.lit(0)),
            lambda t: F.struct(
                F.regexp_extract(t, _A_SQ, 1).alias("href"),
                F.regexp_extract(t, _A_SQ, 2).alias("anchor"),
                t.alias("tag"),
            ),
        ),
    )
    base = pages.select(
        src.alias("src_url"),
        F.regexp_extract(src, r"^(https?://[^/]+)", 1).alias("_src_base"),
        F.explode(tags).alias("_t"),
    )
    href = F.col("_t.href")
    resolved = (
        F.when(href.rlike(r"^(?i)https?://"), href)
        .when(
            href.startswith("/") & ~href.startswith("//"),
            F.concat(F.col("_src_base"), href),
        )
        .otherwise(F.lit(None))
    )
    return (
        base.select(
            "src_url",
            F.regexp_extract("src_url", r"^https?://([^/]+)", 1).alias("src_host"),
            resolved.alias("dst_url"),
            F.nullif(F.trim(F.col("_t.anchor")), F.lit("")).alias("anchor"),
            F.col("_t.tag").rlike(r'(?i)\srel="[^"]*nofollow').alias("nofollow"),
        )
        .where(F.col("dst_url").isNotNull() & (F.col("_src_base") != ""))
        .select(
            "src_url",
            "src_host",
            "dst_url",
            F.lower(F.regexp_extract("dst_url", r"^(?i)https?://([^/]+)", 1)).alias(
                "dst_host"
            ),
            "anchor",
            "nofollow",
        )
    )


def host_graph(links: DataFrame, follow_only: bool = True) -> DataFrame:
    """Roll links up to the host level: (src_host, dst_host, n_links),
    self-loops dropped (a host linking to itself carries no authority),
    nofollow links excluded by default (the graph crawlers actually
    honor).  One map-side-combinable groupBy."""
    df = links.where(~F.col("nofollow")) if follow_only else links
    return (
        df.where(F.col("src_host") != F.col("dst_host"))
        .groupBy("src_host", "dst_host")
        .agg(F.count("*").alias("n_links"))
    )


def pagerank_hosts(
    edges: DataFrame, n_iter: int = 5, damping_pct: int = 85
) -> DataFrame:
    """Fixed-point integer PageRank over (src_host, dst_host [, ...])
    edges (parallel edges must already be rolled up — each (src,dst)
    pair counts once, the host_graph contract).

    Every host starts at ``SCALE DIV N``; each iteration every non-
    dangling host sends ``rank DIV outdeg`` along each out-edge, dangling
    rank is pooled and redistributed ``pool DIV N`` to everyone, and

        rank' = (1-d)*SCALE DIV N  +  d * (contribs + pool DIV N) DIV 100

    with d expressed as the integer percentage ``damping_pct``.  All
    divisions are integral (Spark ``DIV`` == DuckDB ``//``), so the
    result is bit-identical across engines and partitionings — grouped
    sums are over integers, hence order-independent.

    Returns (host, outdeg, rank_fp) with rank_fp in units of 1/SCALE.
    """
    if not 0 < damping_pct < 100:
        raise ValueError("damping_pct must be in (0, 100)")
    e = edges.select("src_host", "dst_host")
    nodes = (
        e.select(F.col("src_host").alias("host"))
        .unionByName(e.select(F.col("dst_host").alias("host")))
        .distinct()
    )
    outdeg = e.groupBy(F.col("src_host").alias("host")).agg(
        F.count("*").alias("outdeg")
    )
    spine = nodes.join(outdeg, "host", "left").select(
        "host", F.coalesce("outdeg", F.lit(0)).alias("outdeg")
    )
    # Materialise the spine ONCE (it anchors every iteration's join and
    # the final output; without a cut Spark re-derives nodes+outdeg
    # n_iter times).  localCheckpoint, NOT cache(): CacheManager entries
    # persist until an explicit unpersist nobody can issue (the returned
    # plan is lazy), so repeated calls would pin one orphaned cached
    # table per call for the session's life; localCheckpoint blocks are
    # reclaimed by the ContextCleaner as soon as the returned plan is
    # garbage collected (same reasoning as dedup.connected_components).
    spine = spine.localCheckpoint(eager=True)
    n = spine.select(F.count("*").alias("n_hosts"))  # 1-row broadcast
    ranks = spine.crossJoin(F.broadcast(n)).select(
        "host",
        "outdeg",
        "n_hosts",
        F.expr(f"CAST({SCALE} AS BIGINT) DIV n_hosts").alias("rank_fp"),
    )
    d, rest = damping_pct, 100 - damping_pct
    for _ in range(n_iter):
        contrib = (
            ranks.where(F.col("outdeg") > 0)
            .join(e, ranks.host == e.src_host)
            .select(
                F.col("dst_host").alias("host"),
                F.expr("rank_fp DIV outdeg").alias("c"),
            )
            .groupBy("host")
            .agg(F.sum("c").alias("contrib"))
        )
        pool = (
            ranks.select(
                F.when(F.col("outdeg") == 0, F.col("rank_fp"))
                .otherwise(F.lit(0))
                .alias("dangling")
            )
            .agg(
                F.coalesce(F.sum("dangling"), F.lit(0).cast("long")).alias("pool")
            )
        )
        ranks = (
            ranks.select("host", "outdeg", "n_hosts", "rank_fp")
            .join(contrib, "host", "left")
            .crossJoin(F.broadcast(pool))
            .select(
                "host",
                "outdeg",
                "n_hosts",
                F.expr(
                    f"((CAST({rest} AS BIGINT) * {SCALE}) DIV 100) DIV n_hosts"
                    f" + ({d} * (coalesce(contrib, CAST(0 AS BIGINT))"
                    f" + (pool DIV n_hosts))) DIV 100"
                ).alias("rank_fp"),
            )
        )
    return ranks.select("host", "outdeg", "rank_fp")


def anchor_text_stats(links: DataFrame, top_k: int = 3) -> DataFrame:
    """Top-k anchor tokens per TARGET host — what the rest of the web
    calls a host.  (dst_host, token, n) ranked per host by (n desc,
    token asc); the text explode happens only on anchors (tiny strings),
    never on page bodies.  Two combinable shuffles: (dst_host, token)
    count, then the per-host top-k window."""
    from pyspark.sql import Window

    toks = links.select(
        "dst_host",
        F.explode(
            F.filter(
                F.split(F.lower(F.coalesce(F.col("anchor"), F.lit(""))), TOKEN_SPLIT),
                lambda w: w != "",
            )
        ).alias("token"),
    )
    counts = toks.groupBy("dst_host", "token").agg(F.count("*").alias("n"))
    w = Window.partitionBy("dst_host").orderBy(
        F.col("n").desc(), F.col("token").asc()
    )
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= top_k)
        .select("dst_host", "token", "n", "rk")
    )


def resolve_redirects(
    edges: DataFrame,
    max_hops: int = 16,
    src_col: str = "src_url",
    dst_col: str = "dst_url",
) -> DataFrame:
    """Redirect-chain resolution over CDX-style (src -> dst) redirect
    records: one row per distinct src with its terminal URL and EXACT hop
    count — (src_url, final_url, hops, resolved).

    Canonicalising a crawl means following 301/302 chains to the page
    that actually served content (Common Crawl's CDX carries the
    redirect records; the dedup/canonical-URL stages join against the
    resolved target).  Chains longer than ``max_hops`` and cycles
    (incl. self-loops) come back ``resolved=false`` with NULL
    final/hops — browsers cap redirect depth the same way.

    Plan: POINTER DOUBLING, not per-hop iteration — ``log2(max_hops)``
    self-joins of the (src -> next, hops) map, each round composing the
    function with itself so reach doubles (1, 2, 4, ... max_hops) while
    hop counts ADD exactly (once next is terminal the compose join
    misses and the row rides unchanged, so no overshoot).  At web scale
    that is ~4 hash joins on the url key instead of 16 dependent ones,
    and every join key is the url the table is already bucketed by.
    A src with several outgoing records keeps the lexicographically
    smallest dst (deterministic; real chains have one).  The oracle is
    a DuckDB recursive CTE with the same hop cap — two entirely
    different fixed-point encodings that must land on identical rows.
    """
    import math

    f = (
        edges.where(F.col(src_col).isNotNull() & F.col(dst_col).isNotNull())
        .groupBy(F.col(src_col).alias("src"))
        .agg(F.min(F.col(dst_col)).alias("nxt"))
        .withColumn("hops", F.lit(1).cast("long"))
    )
    srcs = f.select("src").alias("s")
    for _ in range(max(1, math.ceil(math.log2(max_hops)))):
        a = f.alias("a")
        b = f.alias("b")
        f = (
            a.join(b, F.col("a.nxt") == F.col("b.src"), "left")
            .select(
                F.col("a.src").alias("src"),
                F.coalesce(F.col("b.nxt"), F.col("a.nxt")).alias("nxt"),
                (
                    F.col("a.hops")
                    + F.coalesce(F.col("b.hops"), F.lit(0).cast("long"))
                ).alias("hops"),
            )
            # past the cap means a cycle or an over-long chain: freeze the
            # row so hops can't keep doubling unboundedly (the resolved
            # test below only needs to see "still has an outgoing edge")
            .withColumn(
                "hops",
                F.when(F.col("hops") > max_hops, F.lit(max_hops + 1)).otherwise(
                    F.col("hops")
                ),
            )
        )
    out = (
        f.alias("f")
        .join(srcs, F.col("f.nxt") == F.col("s.src"), "left")
        .select(
            F.col("f.src").alias("src_url"),
            F.when(F.col("s.src").isNull() & (F.col("f.hops") <= max_hops), F.col("f.nxt")).alias("final_url"),
            F.when(
                F.col("s.src").isNull() & (F.col("f.hops") <= max_hops),
                F.col("f.hops"),
            ).alias("hops"),
            (F.col("s.src").isNull() & (F.col("f.hops") <= max_hops)).alias(
                "resolved"
            ),
        )
    )
    return out
