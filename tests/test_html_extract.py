"""Golden tests for the HTML main-content extractor
(``functions/html.py``): crafted pages with known expected extractions,
cross-engine (Spark vs DuckDB) bit-parity on hostile inputs, and the
documented edge-case contract."""

from __future__ import annotations

import duckdb
import pytest

from cdc_data_lake_pyspark_spark.functions.html import (
    extract_main_text,
    main_text_sql,
)

KEEP_1 = (
    "This paragraph is the genuine main content and it is comfortably "
    "long enough to clear the gate."
)
KEEP_2 = (
    "Second real paragraph with an inline link but mostly plain "
    "readable text on either side of it."
)

PAGE = (
    "<html><head><title>T</title>"
    "<style type='text/css'>p { color: #333; }</style>"
    "<script>if (1<2 && 3>2) { track('</div>'); }</script></head>"
    "<body><nav><a href='/'>Home</a> <a href='/a'>About the site</a> "
    "<a href='/c'>Contact page here</a></nav>"
    "<h1>Short head</h1>"
    f"<p>{KEEP_1}</p>"
    "<p>Second real paragraph with an <a href='/x'>inline link</a> but "
    "mostly plain readable text on either side of it.</p>"
    "<!-- a comment\nspanning lines -->"
    "<ul><li>tiny</li><li>items</li></ul>"
    "<footer><a href='/tos'>Terms of service</a></footer></body></html>"
)

CASES = [
    (PAGE, f"{KEEP_1}\n{KEEP_2}"),
    # entities decode; &amp; decodes LAST so &amp;lt; yields literal &lt;
    (
        "<p>Fish &amp; chips cost &lt;5 &quot;pounds&quot; &#39;here&#39;"
        " &nbsp; and that is plenty of text.</p>",
        "Fish & chips cost <5 \"pounds\" 'here' and that is plenty of"
        " text.",
    ),
    # <param> must not split on the p prefix; <br/> is a separator;
    # raw whitespace runs collapse
    (
        "<p><param name='x'>alpha beta gamma delta epsilon \n\t "
        "zeta eta theta iota kappa<br/>short bit</p>",
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
    ),
]


@pytest.mark.parametrize("html,expected", CASES)
def test_golden_extraction(spark, html, expected):
    df = spark.createDataFrame([(html,)], "h string")
    got = df.select(extract_main_text("h").alias("m")).first().m
    assert got == expected


def test_cross_engine_parity_on_hostile_inputs(spark):
    pages = [
        PAGE,
        "",
        "no tags at all but still a perfectly long line of plain text",
        "<div><div><div>nested blocks with enough text to pass the "
        "minimum length gate</div></div></div>",
        "<p>unclosed paragraph with plenty of text to keep around here",
        "<P>UPPERCASE TAGS WITH ENOUGH TEXT TO CLEAR THE LENGTH GATE</P>",
        "<a href='x'>an anchor alone that is certainly long enough to "
        "pass length</a>",
        "<p>text with &unknown; entity refs &#120; left intact but long "
        "enough to keep</p>",
        "<pre>  pre   whitespace   collapses   like everywhere else, "
        "documented contract  </pre>",
    ]
    df = spark.createDataFrame([(p,) for p in pages], "h string")
    spark_out = [
        r.m for r in df.select(extract_main_text("h").alias("m")).collect()
    ]
    con = duckdb.connect()
    duck_out = []
    for p in pages:
        lit = p.replace("'", "''")
        duck_out.append(
            con.sql(
                f"SELECT {main_text_sql('h', duck=True)} FROM "
                f"(SELECT '{lit}' AS h)"
            ).fetchone()[0]
        )
    assert spark_out == duck_out


def test_boilerplate_lines_dropped(spark):
    df = spark.createDataFrame([(PAGE,)], "h string")
    got = df.select(extract_main_text("h").alias("m")).first().m
    for boiler in ("Home", "Short head", "tiny", "Terms of service",
                   "track", "color"):
        assert boiler not in got


def test_null_html_stays_null(spark):
    df = spark.createDataFrame([(None,)], "h string")
    assert df.select(extract_main_text("h").alias("m")).first().m is None
