"""HTML → main-content extraction: the first stage of every real web
training-data pipeline (boilerplate removal BEFORE quality gates/dedup).

Capability addition for the §2.6 training-data surface (no reference
citation — the reference's scope starts at structured CDC envelopes;
public heuristics: Readability / jusText-style text-density + link-density
line filtering, Kohlschütter et al. 2010 boilerplate detection).

Design: the whole extractor is ONE scalar expression over the html
column — comment/script/style span removal, block-tag → newline
segmentation, then per-line filtering by minimum visible-text length and
maximum link density, reassembled with newlines.  Everything is built-in
string/regex/higher-order-array functions (split, filter, transform,
array_join), so the operator is map-only (zero shuffle, whole-stage
codegen, trivially parallel at 100 TB) and value-checkable in DuckDB.

Engine parity: the expression is GENERATED for both dialects from one
template (:func:`main_text_sql`), holding the regexes to the common
Java-regex ∩ RE2 subset — inline ``(?is)`` flags, non-greedy spans,
``\\b``, character classes; no backreferences (script and style spans get
separate patterns), no lookaround.  Link density compares in exact
integer cross-multiplication (``link_chars * 100 <= pct * text_chars``),
so the keep decision is bit-identical across engines.

Known simplifications (documented contract, pinned in tests): numeric
character references other than the six named entities are left intact;
``<pre>`` whitespace is collapsed like any other text; line order is
document order (no content re-ranking).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: tags whose boundaries delimit candidate text blocks
_BLOCK_TAGS = (
    "p|div|br|hr|h[1-6]|li|ul|ol|table|tr|td|th|section|article|header"
    "|footer|nav|aside|blockquote|form|fieldset|pre|main"
)


def _dialect(duck: bool) -> dict:
    """Per-engine SQL tokens.

    Spark SQL string literals process backslash escapes (``'\\s'`` in the
    emitted text reaches the regex engine as ``\\s``); DuckDB standard
    single-quoted strings do not, so the same two characters are emitted
    bare, and literal newlines use ``e'\\n'`` escape-strings.  DuckDB's
    ``regexp_replace`` replaces only the first match without the ``'g'``
    option; Spark always replaces all.
    """
    if duck:
        return {
            "filter": "list_filter",
            "transform": "list_transform",
            "join": "array_to_string",
            "split": "string_split_regex",
            "nl": "e'\\n'",
            "ws": r"\s",
            "wb": r"\b",
            "g": ", 'g'",
        }
    return {
        "filter": "filter",
        "transform": "transform",
        "join": "array_join",
        "split": "split",
        "nl": "'\\n'",
        "ws": r"\\s",
        "wb": r"\\b",
        "g": "",
    }


def _clean(line: str, d: dict) -> str:
    """Visible text of one block: strip tags, decode the six named
    entities (&amp; last, so no double-decode), collapse whitespace."""
    no_tags = f"regexp_replace({line}, '<[^>]*>', ' '{d['g']})"
    ent = no_tags
    for src, dst in (
        ("&nbsp;", " "),
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "''"),
        ("&amp;", "&"),
    ):
        ent = f"replace({ent}, '{src}', '{dst}')"
    return f"trim(regexp_replace({ent}, '{d['ws']}+', ' '{d['g']}))"


def main_text_sql(
    html_expr: str,
    min_chars: int = 25,
    max_link_pct: int = 33,
    duck: bool = False,
) -> str:
    """Emit the full main-content-extraction expression for one dialect.

    ``html_expr`` is any SQL expression producing the raw HTML string.
    A block line is kept iff its visible text has at least ``min_chars``
    characters AND at most ``max_link_pct`` percent of those characters
    come from anchor (``<a>``) text — the jusText-style short/navigational
    boilerplate cut.  Kept lines are re-joined with newlines in document
    order.
    """
    d = _dialect(duck)
    pre = f"regexp_replace({html_expr}, '(?is)<!--.*?-->', ' '{d['g']})"
    pre = f"regexp_replace({pre}, '(?is)<script{d['wb']}[^>]*>.*?</script>', ' '{d['g']})"
    pre = f"regexp_replace({pre}, '(?is)<style{d['wb']}[^>]*>.*?</style>', ' '{d['g']})"
    # HTML source whitespace (pretty-printing newlines/indentation) is
    # insignificant — collapse it BEFORE block segmentation, or a
    # formatter's 80-column wrapping would shatter every paragraph into
    # short lines the min-length gate then drops
    pre = f"regexp_replace({pre}, '{d['ws']}+', ' '{d['g']})"
    # tag-name boundary: attrs must start with whitespace (so <p ...> and
    # <br/> segment, but <param> / <pretty> never false-match p / pre)
    pre = (
        f"regexp_replace({pre}, '(?i)</?({_BLOCK_TAGS})({d['ws']}[^>]*)?/?>',"
        f" {d['nl']}{d['g']})"
    )
    lines = f"{d['split']}({pre}, {d['nl']})"
    cl = _clean("l", d)
    no_anchor = (
        f"regexp_replace(l, '(?is)<a{d['wb']}[^>]*>.*?</a>', ' '{d['g']})"
    )
    cl_no_anchor = _clean(no_anchor, d)
    link_len = f"(length({cl}) - length({cl_no_anchor}))"
    pred = (
        f"length({cl}) >= {min_chars}"
        f" AND {link_len} * 100 <= {max_link_pct} * length({cl})"
    )
    kept = f"{d['filter']}({lines}, l -> {pred})"
    cleaned = f"{d['transform']}({kept}, l -> {cl})"
    joined = f"{d['join']}({cleaned}, {d['nl']})"
    if duck:
        # DuckDB's array_to_string([]) is NULL where Spark's array_join
        # is '' — align on '' while keeping NULL-in → NULL-out
        return (
            f"CASE WHEN ({html_expr}) IS NULL THEN NULL"
            f" ELSE COALESCE({joined}, '') END"
        )
    return joined


def extract_main_text(
    html_col: str, min_chars: int = 25, max_link_pct: int = 33
) -> Column:
    """Spark Column form of :func:`main_text_sql` over a named column.

    Map-only: at any scale this is a projection inside whole-stage
    codegen — no shuffle, no UDF, no Python in the hot path."""
    return F.expr(
        main_text_sql(html_col, min_chars, max_link_pct, duck=False)
    )
