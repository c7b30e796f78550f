import duckdb

from html5ever_elixir_spark.operators.markdown import (
    docs_to_md_html_expr,
    oracle_markdown_sql,
    to_markdown,
)


def _md(spark, html):
    df = spark.createDataFrame([("u", html)], "url string, html string")
    [row] = to_markdown(df).collect()
    assert row.error is None
    return row.markdown


def test_markdown_blocks_and_inline(spark):
    html = (
        "<h1>Title</h1><p>see <a href='/x'>link</a> and <b>bold</b> "
        "plus <i>it</i> or <code>c()</code>.</p>"
        "<ul><li>one</li><li>two</li></ul>"
        "<ol><li>a</li><li>b</li></ol>"
        "<blockquote><p>quoted text</p></blockquote>"
        "<pre>raw  spaces</pre><hr>"
    )
    assert _md(spark, html) == (
        "# Title\n\n"
        "see [link](/x) and **bold** plus *it* or `c()`.\n\n"
        "- one\n- two\n\n"
        "1. a\n2. b\n\n"
        "> quoted text\n\n"
        "```\nraw  spaces\n```\n\n"
        "---"
    )


def test_markdown_table_and_nested_list(spark):
    html = (
        "<table><tr><th>H1</th><th>H2</th></tr>"
        "<tr><td>a</td><td>b</td></tr></table>"
        "<ul><li>top<ul><li>sub</li></ul></li></ul>"
    )
    assert _md(spark, html) == (
        "| H1 | H2 |\n| --- | --- |\n| a | b |\n\n"
        "- top\n  - sub"
    )


def test_markdown_skips_script_and_collapses_ws(spark):
    html = (
        "<p>keep</p><script>drop()</script><style>x{}</style>"
        "<p>a\n\t  b<br>c</p>"
    )
    assert _md(spark, html) == "keep\n\na b\nc"


def test_markdown_error_sentinel(spark):
    df = spark.createDataFrame(
        [(0, bytearray(b"\xff\xfe<p>x"))], "doc_id bigint, html binary"
    )
    [row] = to_markdown(df, id_col="doc_id").collect()
    assert row.error is not None and row.markdown is None


def test_markdown_gate_matches_duckdb(spark):
    sf_dir = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pages = docs.selectExpr("doc_id", docs_to_md_html_expr() + " AS html")
    got = sorted(
        (r.doc_id, r.markdown)
        for r in to_markdown(pages, id_col="doc_id").collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_dir}/documents.parquet'"
    )
    exp = sorted(tuple(r) for r in con.execute(oracle_markdown_sql()).fetchall())
    assert got == exp


def test_markdown_plan_is_narrow(spark):
    df = spark.createDataFrame([("u", "<p>x</p>")],
                               "url string, html string")
    plan = to_markdown(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Sort" not in plan


def test_markdown_and_tables_adversarial_corpus(spark):
    # synth_pages: dup attrs, templates, XML prologs, 10k-deep nesting,
    # RAWTEXT, foster parenting, invalid UTF-8 — the walks must emit
    # rows (or row-level errors), never fail the task
    import random

    from html5ever_elixir_spark.operators.tables import extract_table_cells
    from html5ever_elixir_spark.sources.pages import synth_pages

    sy = synth_pages(spark, 120).select("url", "html")
    md = to_markdown(sy).collect()
    assert len(md) == 120
    assert all((r.markdown is None) == (r.error is not None) for r in md)
    cells = extract_table_cells(sy).collect()
    assert all(r.error is None or r.table_idx is None for r in cells)

    # deterministic tag soup: unbalanced table/list/inline fragments
    rng = random.Random(7)
    frags = [
        "<table>", "</table>", "<tr>", "</tr>", "<td>", "</td>",
        "<th>", "<ul>", "<li>", "</ul>", "<ol>", "</li>", "<b>",
        "</b>", "<i>", "<a href='x'>", "</a>", "<p>", "</p>", "<pre>",
        "</pre>", "<blockquote>", "<h3>", "</h3>", "<hr>", "<br>",
        "txt ", "&amp;", "<code>", "</code>", "</blockquote>",
    ]
    soup = [
        ("s%d" % i, "".join(rng.choice(frags) for _ in range(60)))
        for i in range(150)
    ]
    df = spark.createDataFrame(soup, "url string, html string")
    out = to_markdown(df).collect()
    assert len(out) == 150 and all(r.error is None for r in out)
    _ = extract_table_cells(df).collect()  # must not raise


def test_parse_and_extract_with_markdown_single_parse(spark):
    from html5ever_elixir_spark.operators.parse import parse_and_extract

    df = spark.createDataFrame(
        [("u", "<h1>T</h1><p>body <b>x</b></p>")],
        "url string, html string",
    )
    [off] = parse_and_extract(df).collect()
    assert off.markdown is None  # hot path unchanged
    [on] = parse_and_extract(df, with_markdown=True).collect()
    [md] = to_markdown(df).collect()
    assert on.markdown == md.markdown == "# T\n\nbody **x**"
    assert on.text == off.text  # extraction untouched


def test_markdown_pre_newlines_and_cell_pipes(spark):
    html = (
        "<pre>a\n\n\n\nb</pre>"
        "<table><tr><td>x|y</td><td>z</td></tr></table>"
    )
    assert _md(spark, html) == (
        "```\na\n\n\n\nb\n```\n\n"
        "| x\\|y | z |"
    )


def test_markdown_inline_block_boundary_guard(spark):
    # misnested HTML puts a <p> inside <b>: emphasis must not wrap
    # across a paragraph boundary (invalid markdown) — content flows
    # through unwrapped instead
    assert _md(spark, "<b>a<p>b</p>c</b>") == "a\nb\n\nc"
    # single soft breaks inside emphasis stay wrapped (valid)
    assert _md(spark, "<p>x<b>y</p><p>z</b>w</p>") == "x**y**\n\n**z**w"
