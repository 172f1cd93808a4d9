"""Canonical-URL normalization (functions/urls.py): hand-pinned edge
cases on the Spark expression, plus Spark ≡ DuckDB parity over the same
strings — the property the url_dedup_canonical oracle relies on."""

import duckdb
import pytest
from pyspark.sql import functions as F

from cdc_data_lake_pyspark_spark.functions.urls import (
    canonical_url_sql,
    canonicalize_url,
)

CASES = [
    # scheme+host lowercase, default https port stripped, fragment dropped
    ("HTTPS://WWW.Ex.COM:443/A/b#frag", "https://www.ex.com/A/b"),
    # http default port; path case PRESERVED
    ("http://Ex.COM:80/Path", "http://ex.com/Path"),
    # non-default port kept
    ("https://ex.com:8443/a", "https://ex.com:8443/a"),
    # trailing slashes stripped (root path becomes empty)
    ("https://ex.com/a///", "https://ex.com/a"),
    ("https://ex.com/", "https://ex.com"),
    # tracking params dropped, survivors sorted, '?' dropped when empty
    ("https://ex.com/a?utm_source=x&b=2&a=1", "https://ex.com/a?a=1&b=2"),
    ("https://ex.com/a?gclid=1&utm_campaign=z", "https://ex.com/a"),
    ("https://ex.com/a?fbclid=9&ref=tw&mc_cid=7", "https://ex.com/a"),
    # param ORDER must not matter
    ("https://ex.com/a?z=1&a=2", "https://ex.com/a?a=2&z=1"),
    # empty query / bare '?'
    ("https://ex.com/a?", "https://ex.com/a"),
    # query kept ahead of dropped fragment
    ("https://ex.com/a?x=1#sec?y=2", "https://ex.com/a?x=1"),
    # ADVICE r9: '?' appearing only INSIDE the fragment is NOT a query —
    # '#' ends the query region (RFC 3986), the whole fragment drops
    ("https://ex.com/a#frag?x=1", "https://ex.com/a"),
    ("https://ex.com/a#?gclid=1", "https://ex.com/a"),
    # not a URL: lower(trim(...)) fallback
    ("  Not A Url  ", "not a url"),
]


def test_canonicalize_url_pinned_cases(spark):
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(CASES)], ["i", "url"]
    )
    got = {
        r.i: r.c
        for r in df.select("i", canonicalize_url("url").alias("c")).collect()
    }
    for i, (raw, want) in enumerate(CASES):
        assert got[i] == want, f"{raw!r}: {got[i]!r} != {want!r}"


def test_canonicalize_url_duckdb_parity(spark):
    """The duck=True expression computes the identical string for every
    pinned case AND for a generated noisy family — the bit-parity the
    url_dedup_canonical oracle depends on."""
    raws = [raw for raw, _ in CASES] + [
        f"HTTP://Host{i % 3}.COM:80/p/{i}"
        f"{'/' if i % 2 else ''}?utm_x=1&k{i % 4}=v&a=0"
        f"{'#f' if i % 3 == 0 else ''}"
        for i in range(40)
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(url VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(r,) for r in raws])
    duck = [
        r[0]
        for r in con.execute(
            f"SELECT {canonical_url_sql('url', duck=True)} FROM t"
        ).fetchall()
    ]
    df = spark.createDataFrame([(r,) for r in raws], ["url"])
    got = [r.c for r in df.select(canonicalize_url("url").alias("c")).collect()]
    assert got == duck


def test_canonicalize_url_requires_column_name():
    with pytest.raises(TypeError):
        canonicalize_url(F.col("url"))


def test_tracking_params_parameterized(spark):
    """VERDICT r9 #4: the drop-list is a parameter — on hosts where
    ``?ref=<branch>`` names content, passing a list without ``ref``
    preserves it (and keeps dropping the rest)."""
    from cdc_data_lake_pyspark_spark.functions.urls import (
        DEFAULT_TRACKING_PARAMS,
    )

    no_ref = tuple(p for p in DEFAULT_TRACKING_PARAMS if p != "ref")
    df = spark.createDataFrame(
        [("https://forge.ex/repo/blob/f.py?ref=main&utm_source=x",)], ["url"]
    )
    got = df.select(
        canonicalize_url("url").alias("default"),
        canonicalize_url("url", tracking_params=no_ref).alias("kept"),
    ).first()
    assert got.default == "https://forge.ex/repo/blob/f.py"
    assert got.kept == "https://forge.ex/repo/blob/f.py?ref=main"


def test_tracking_params_reject_quote():
    with pytest.raises(ValueError):
        canonical_url_sql("url", tracking_params=("a'b",))


def test_tracking_params_reject_malformed():
    """r10 review: malformed fragments fail at construction, not as an
    executor-side PatternSyntaxException / silent empty alternative."""
    for bad in ("a)b", "gclid|", "|ref", "", "a||b"):
        with pytest.raises(ValueError):
            canonical_url_sql("url", tracking_params=(bad,))


def test_tracking_params_reject_python_only_syntax():
    """ADVICE r10: the fragment executes under Java regex and RE2, so
    anything outside the portable allowlisted subset is rejected even
    when Python's re would compile it — named groups, lookbehind,
    escapes, groups, anchors, bounded repetition."""
    for bad in (
        "(?P<n>utm)",   # Python-only named group
        "(?<=x)utm",    # lookbehind (no RE2 support)
        r"utm\d+",      # escapes excluded from the subset
        "(utm|ga)",     # groups excluded
        "^utm",         # anchors excluded (matcher supplies its own)
        "utm{1,3}",     # bounded repetition excluded
    ):
        with pytest.raises(ValueError):
            canonical_url_sql("url", tracking_params=(bad,))
    # the default list itself stays inside the subset
    canonical_url_sql("url")


def test_tracking_params_empty_disables_dropping(spark):
    got = (
        spark.createDataFrame(
            [("https://ex.com/a?utm_source=x&b=2",)], ["url"]
        )
        .select(canonicalize_url("url", tracking_params=()).alias("c"))
        .first()
        .c
    )
    assert got == "https://ex.com/a?b=2&utm_source=x"


def test_tracking_param_validator_rejects_structural_hazards():
    """ADVICE r11: fragments inside the character allowlist can still be
    invalid regex ('utm[', '*foo') or Python-valid but Java-invalid
    (']]-leading classes') — construction must reject them all, never
    an executor-side PatternSyntaxException at action time."""
    import pytest

    from cdc_data_lake_pyspark_spark.functions.urls import (
        _tracking_param_re,
    )

    for bad in (
        "utm[",        # unterminated class
        "*foo",        # dangling quantifier
        "a**",         # double quantifier
        "a|?b",        # quantifier after alternation
        "ab]",         # unbalanced close
        "[]]",         # Python-valid, Java PatternSyntaxException
        "[]",          # empty class
        "a[[b]c",      # nested raw '[' (not portable)
    ):
        with pytest.raises(ValueError):
            _tracking_param_re([bad])
    # the good subset still passes
    assert _tracking_param_re(["utm_[a-z0-9_]*", "gclid"]).startswith("^(")
