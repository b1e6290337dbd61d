"""HTML ``<table>`` extraction to typed rows, declaratively.

Structured-data mining from crawls: the tables embedded in web pages
(league standings, spec sheets, financial filings) are the highest-
density structured text a corpus carries, and a training-data pipeline
wants them as ROWS — (page, table, row, cells) — not as flattened
prose.  ``extract_html_tables`` turns an HTML column into exactly that
with three nested ``regexp_extract_all`` + ``posexplode`` levels and a
cell-cleanup projection, all codegen'd JVM expressions: no UDF, no
shuffle, no driver parsing anywhere.

Reference analog: the OCR engine's block sweep walks a page's detected
boxes in reading order and emits (key, value) rows per box
(kvcore/boxsweep.py); this operator walks a page's DOM tables in
document order and emits (table_idx, row_idx, cells) rows — the same
"page -> ordered structured records" move over the grafted payload.

Semantics (the documented contract, chosen for crawl reality):

- tables are the non-greedy ``<table ...> ... </table>`` spans in
  document order; a NESTED table is not recursed into (the outer span
  ends at the first ``</table>``, standard for regex-level extraction
  and rare in post-2010 layout-free HTML).  A table with no ``<tr>``
  (caption-only, or markup soup) still consumes a ``table_idx`` but
  emits no rows.
- rows are ``<tr ...> ... </tr>`` spans inside a table; cells are
  ``<td>``/``<th>`` spans inside a row, in order.  Cells require their
  closing tag (implicit-close tag soup is a decode-layer concern; the
  divergence is pinned in tests).
- cell text: inner tags stripped FIRST, then the six ubiquitous
  entities unescaped (``&lt; &gt; &quot; &#39; &nbsp;`` then ``&amp;``
  LAST so ``&amp;lt;`` yields the literal ``&lt;`` — double-unescape
  is a classic corpus corruption), then whitespace collapsed + trimmed.
- ``is_header`` marks rows containing at least one ``<th>``.

Scale shape: per-page work only — the plan is scan -> three bounded
Generate levels -> project, zero exchanges; each explode level narrows
its input (a row's cells live inside that row's span only), so data is
never replicated beyond its own table.  Hostile pages (a million
``<tr>``) are bounded by the ``max_*`` caps via ``slice`` BEFORE the
explode, so the Generate fan-out is capped in the plan itself, not
cleaned up after.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

#: fan-out caps, applied with ``slice`` before each posexplode (document
#: order keeps the FIRST n, like every other cap in this engine).
MAX_TABLES_PER_PAGE = 64
MAX_ROWS_PER_TABLE = 10_000
MAX_CELLS_PER_ROW = 256

_TABLE_RE = r"(?is)<table\b[^>]*>(.*?)</table\s*>"
_TR_RE = r"(?is)<tr\b[^>]*>(.*?)</tr\s*>"
_CELL_RE = r"(?is)<t[dh]\b[^>]*>(.*?)</t[dh]\s*>"
_TH_RE = r"(?is)<th\b"


def _clean_cell(c: F.Column) -> F.Column:
    """Tag-strip -> entity-unescape -> whitespace-normalise (that order:
    unescaping first would let a literal ``&lt;b&gt;`` be eaten by the
    tag strip)."""
    c = F.regexp_replace(c, r"(?s)<[^>]*>", " ")
    for ent, rep in (
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
        ("&nbsp;", " "),
        ("&amp;", "&"),  # last — see module docstring
    ):
        c = F.regexp_replace(c, ent, rep)
    return F.trim(F.regexp_replace(c, r"[ \t\n\r\f]+", " "))


def extract_html_tables(
    pages: DataFrame,
    html_col: str = "html",
    id_cols: Sequence[str] = ("url",),
    max_tables: int = MAX_TABLES_PER_PAGE,
    max_rows: int = MAX_ROWS_PER_TABLE,
    max_cells: int = MAX_CELLS_PER_ROW,
) -> DataFrame:
    """One output row per ``<tr>``: (*id_cols, table_idx, row_idx,
    is_header, n_cells, cells array<string>).  Pure narrow projection —
    see the module docstring for the extraction contract."""
    ids = [F.col(c) for c in id_cols]
    tables = F.slice(
        F.regexp_extract_all(F.col(html_col), F.lit(_TABLE_RE), 1), 1, max_tables
    )
    t = pages.select(
        *ids, F.posexplode(tables).alias("table_idx", "_table_html")
    )
    rows = F.slice(
        F.regexp_extract_all(F.col("_table_html"), F.lit(_TR_RE), 1), 1, max_rows
    )
    r = t.select(
        *ids, "table_idx", F.posexplode(rows).alias("row_idx", "_row_html")
    )
    cells = F.slice(
        F.regexp_extract_all(F.col("_row_html"), F.lit(_CELL_RE), 1), 1, max_cells
    )
    return r.select(
        *ids,
        "table_idx",
        "row_idx",
        F.col("_row_html").rlike(_TH_RE).alias("is_header"),
        F.size(cells).alias("n_cells"),
        F.transform(cells, _clean_cell).alias("cells"),
    )


def tables_to_markdown(
    tables: DataFrame, id_cols: Sequence[str] = ("url",)
) -> DataFrame:
    """Linearise ``extract_html_tables`` output to one GitHub-markdown
    string per (page, table) — the form LLM corpora actually carry
    tables in (markdown survives tokenisation; raw ``<td>`` soup is
    stripped by the boilerplate pass).  ``| a | b |`` rows in row
    order; a ``| --- | --- |`` separator after row 0 iff row 0 is a
    header row; ``|`` inside a cell is escaped ``\\|`` so the row
    geometry survives round-trips.

    One combinable shuffle on (page, table); the assembly is a
    sort_array over collected row structs + codegen'd HOFs — no UDF.
    Row structs carry (row_idx, is_header, cells) only, so the shuffled
    payload is the cell text once, not the page.
    """
    ids = [F.col(c) for c in id_cols]
    rows = F.array_sort(F.collect_list(F.struct("row_idx", "is_header", "cells")))
    g = tables.groupBy(*ids, "table_idx").agg(
        rows.alias("_rows"), F.count(F.lit(1)).alias("n_rows")
    )
    line = (
        "concat('| ', array_join(transform(r.cells,"
        " c -> replace(c, '|', '\\\\|')), ' | '), ' |')"
    )
    sep = "concat('| ', array_join(transform(r.cells, c -> '---'), ' | '), ' |')"
    md = F.expr(
        "concat_ws('\n', flatten(transform(_rows, (r, i) -> "
        f"CASE WHEN i = 0 AND r.is_header THEN array({line}, {sep}) "
        f"ELSE array({line}) END)))"
    )
    return g.select(*ids, "table_idx", "n_rows", md.alias("markdown"))


def html_outline(
    pages: DataFrame, html_col: str = "html_str", url_col: str = "url"
) -> DataFrame:
    """Heading outline with hierarchical parents: every ``<h1>``-``<h6>``
    in document order as (url, pos, level, title, parent_pos), where
    ``parent_pos`` is the NEAREST PRECEDING heading of a strictly lower
    level (NULL for roots) — the section tree a RAG chunker or a
    document-structure model needs, which flat token chunking
    (``textstats.chunk_documents``) cannot see.

    The classic stack algorithm, declaratively: six running-max window
    columns over ONE (url, pos) distribution track "last position of a
    level-l heading so far" (frame = unbounded preceding to 1 preceding),
    and the parent is ``greatest`` of the levels below mine — a CASE over
    six codegen'd columns, never a self-join or a UDF.  Skipped levels
    (h1 -> h3 with no h2), repeated levels, and documents that never open
    with h1 all fall out of the same rule; the level-2-before-any-h1 case
    is a root.  NULL bookkeeping crosses engines via a -1 sentinel
    (DuckDB's greatest() propagates NULL where Spark's skips it).

    The heading regex avoids backreferences (``</h[1-6]>`` not
    ``</h\\1>``): Spark's Java regex supports them but the oracle's RE2
    does not — mismatched open/close levels are a decode-layer concern
    and the shared pattern keeps both engines on identical spans.  Inner
    tags are stripped from titles, whitespace trimmed.

    Plan: codegen regex projection + ONE posexplode + ONE url-key window
    exchange.  At 10^12 pages the exchange key is the url the table is
    bucketed by — co-located, no extra shuffle.
    """
    pat = r"(?is)<h[1-6][^>]*>.*?</h[1-6]>"
    heads = pages.select(
        F.col(url_col).alias("url"),
        F.posexplode(
            F.expr(
                f"regexp_extract_all(coalesce({html_col}, ''), '{pat}', 0)"
            )
        ).alias("pos", "_h"),
    )
    h = F.col("_h")
    level = F.regexp_extract(h, r"(?i)^<h([1-6])", 1).cast("int")
    title = F.trim(F.regexp_replace(F.regexp_extract(h, r"(?is)^<h[1-6][^>]*>(.*?)</h[1-6]>$", 1), r"<[^>]*>", ""))
    typed = heads.select("url", "pos", level.alias("level"), title.alias("title"))

    w = (
        Window.partitionBy("url")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    last = [
        F.coalesce(
            F.max(F.when(F.col("level") == l, F.col("pos"))).over(w), F.lit(-1)
        ).alias(f"_l{l}")
        for l in range(1, 6)
    ]
    typed = typed.select("url", "pos", "level", "title", *last)
    parent = F.when(F.col("level") == 1, F.lit(None).cast("int"))
    for lv in range(2, 7):
        cand = F.greatest(*[F.col(f"_l{l}") for l in range(1, lv)]) if lv > 2 else F.col("_l1")
        parent = parent.when(
            F.col("level") == lv, F.nullif(cand, F.lit(-1)).cast("int")
        )
    return typed.select(
        "url",
        "pos",
        "level",
        "title",
        parent.alias("parent_pos"),
    )


def section_chunks(
    pages: DataFrame, html_col: str = "html_str", url_col: str = "url"
) -> DataFrame:
    """Heading-aligned section text: one row per heading carrying the
    PROSE that follows it up to the next heading — (url, pos, level,
    title, text) — plus a ``pos = -1`` preamble row for non-empty text
    before the first heading (NULL level/title).  The section-granular
    splitter a RAG index actually wants: :func:`html_outline` gives the
    tree, ``textstats.chunk_documents`` gives flat token windows, this
    gives the semantically-bounded units in between.

    One codegen'd projection: the SAME no-backreference heading regex
    (shared verbatim with html_outline and the RE2 oracle) drives BOTH
    ``regexp_extract_all`` (the headings) and ``split`` (the segments
    between them — segment i+1 follows heading i), zipped row-locally
    and posexploded once; per-section text strips inner tags and trims.
    Empty sections (back-to-back headings) keep their row with ''
    text — the tree shape stays intact for consumers that join back to
    the outline on (url, pos).  No shuffle at all.
    """
    pat = "(?is)<h[1-6][^>]*>.*?</h[1-6]>"
    x = F.coalesce(F.col(html_col), F.lit(""))

    def _clean(c):
        return F.trim(F.regexp_replace(c, r"<[^>]*>", ""))

    base = pages.select(
        F.col(url_col).alias("url"),
        F.expr(
            f"regexp_extract_all(coalesce({html_col}, ''), '{pat}', 0)"
        ).alias("_hs"),
        F.split(x, pat).alias("_ss"),
    )
    sections = base.select(
        "url",
        F.posexplode(
            F.arrays_zip(
                F.col("_hs").alias("h"),
                F.expr("slice(_ss, 2, size(_hs))").alias("s"),
            )
        ).alias("pos", "_z"),
    ).select(
        "url",
        "pos",
        F.regexp_extract(F.col("_z.h"), r"(?i)^<h([1-6])", 1)
        .cast("int")
        .alias("level"),
        _clean(
            F.regexp_extract(
                F.col("_z.h"), r"(?is)^<h[1-6][^>]*>(.*?)</h[1-6]>$", 1
            )
        ).alias("title"),
        _clean(F.col("_z.s")).alias("text"),
    )
    preamble = (
        base.select(
            "url",
            F.lit(-1).alias("pos"),
            F.lit(None).cast("int").alias("level"),
            F.lit(None).cast("string").alias("title"),
            _clean(F.element_at("_ss", 1)).alias("text"),
        )
        .filter(F.col("text") != "")
    )
    return sections.unionByName(preamble)


def jsonld_extract(
    pages: DataFrame, html_col: str = "html_str", url_col: str = "url"
) -> DataFrame:
    """Embedded JSON-LD structured data (schema.org) -> typed rows: one
    row per ``<script type="application/ld+json">`` block as (url, pos,
    valid, ld_type, headline, date_published, author_name) — the
    highest-precision metadata a crawl carries (news articles, products,
    recipes declare type/headline/date/author here), mined by every
    curation pipeline that wants publication dates or authorship
    without guessing from prose.

    Malformed JSON (truncated blocks, trailing commas, HTML comments
    inside the script) yields ``valid=false`` with NULL fields — the
    row STAYS so block counts survive for per-host quality audits;
    field extraction is Spark's codegen'd ``get_json_object`` (JsonPath
    ``$['@type']`` for the @-key), never a Python json.loads.  The
    DuckDB oracle guards the same paths behind ``json_valid`` — both
    engines NULL the same blocks.

    Plan: regex projection + ONE posexplode + JSON-path projection, all
    fused on the scan — no UDF, no exchange.
    """
    pat = r"(?is)<script[^>]*type=.application/ld\\+json.[^>]*>(.*?)</script>"
    blocks = pages.select(
        F.col(url_col).alias("url"),
        F.posexplode(
            F.expr(
                f"regexp_extract_all(coalesce({html_col}, ''), '{pat}', 1)"
            )
        ).alias("pos", "_j"),
    )
    j = F.trim(F.col("_j"))
    return blocks.select(
        "url",
        "pos",
        F.get_json_object(j, "$").isNotNull().alias("valid"),
        F.get_json_object(j, "$['@type']").alias("ld_type"),
        F.get_json_object(j, "$.headline").alias("headline"),
        F.get_json_object(j, "$.datePublished").alias("date_published"),
        F.get_json_object(j, "$.author.name").alias("author_name"),
    )
