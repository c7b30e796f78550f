"""heading_outline: h1-h6 document structure over real parsed nodes."""

from html5ever_elixir_spark.operators.outline import heading_outline


def _rows(spark, html, url="u1"):
    df = spark.createDataFrame([(url, html)], "url string, html string")
    return sorted(
        (r.heading_idx, r.level, r.text, r.parent_idx)
        for r in heading_outline(pages=df).collect()
    )


def test_basic_nesting_and_pop(spark):
    got = _rows(
        spark,
        "<html><body><h1>A</h1><p>x</p><h2>B</h2><h3>C</h3>"
        "<h2>D</h2><h6>E</h6></body></html>",
    )
    assert got == [
        (1, 1, "A", None),
        (2, 2, "B", 1),
        (3, 3, "C", 2),
        (4, 2, "D", 1),   # pops back to the h1
        (5, 6, "E", 4),   # skipped levels attach to nearest shallower
    ]


def test_leading_deep_heading_has_no_parent(spark):
    got = _rows(
        spark, "<html><body><h3>A</h3><h1>B</h1><h2>C</h2></body></html>"
    )
    assert got == [
        (1, 3, "A", None),  # nothing shallower precedes it
        (2, 1, "B", None),
        (3, 2, "C", 2),
    ]


def test_entity_decoding_and_direct_children_only(spark):
    got = _rows(
        spark,
        "<html><body><h1>T &amp; <b>bold</b> tail</h1></body></html>",
    )
    # direct text children only ('bold' belongs to <b>), entities decoded
    assert got == [(1, 1, "T &  tail", None)]


def test_no_headings_no_rows(spark):
    assert _rows(spark, "<html><body><p>just text</p></body></html>") == []


def test_parses_once(spark):
    df = spark.createDataFrame(
        [("u1", "<html><body><h1>A</h1></body></html>")],
        "url string, html string",
    )
    plan = (
        heading_outline(pages=df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "MapInArrow" not in plan and "ArrowEvalPython" not in plan
