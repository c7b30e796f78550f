import duckdb
import pyspark.sql.functions as F

from html5ever_elixir_spark.operators.tables import (
    docs_to_table_html_expr,
    extract_table_cells,
    oracle_table_cells_sql,
)


def test_table_cells_hand_built(spark):
    html = (
        "<table><thead><tr><th>H1</th><th>H2</th></tr></thead>"
        "<tbody><tr><td>a</td><td>b<b>c</b></td></tr>"
        "<tr><td><table><tr><td>inner</td></tr></table>outer</td></tr>"
        "</tbody></table>"
        "<p>x</p><table><tr><td>t2</td></tr></table>"
    )
    df = spark.createDataFrame([("u", html)], "url string, html string")
    rows = sorted(
        (r.table_idx, r.row_idx, r.col_idx, r.is_header, r.cell_text)
        for r in extract_table_cells(df).collect()
    )
    assert rows == [
        (1, 1, 1, 1, "H1"),
        (1, 1, 2, 1, "H2"),
        (1, 2, 1, 0, "a"),
        (1, 2, 2, 0, "bc"),  # textContent of td including <b>
        (1, 3, 1, 0, "innerouter"),  # nested table text included
        (2, 1, 1, 0, "inner"),  # nested table is its own table_idx
        (3, 1, 1, 0, "t2"),
    ]


def test_table_cells_error_and_empty(spark):
    df = spark.createDataFrame(
        [("ok", "<p>no tables</p>"), ("bad", None)],
        "url string, html string",
    )
    rows = extract_table_cells(df).collect()
    # no tables → no cell rows; null html parses as "" → no rows either
    assert rows == []


def test_table_cells_invalid_utf8_sentinel(spark):
    df = spark.createDataFrame(
        [(0, bytearray(b"\xff\xfe<table>"))], "doc_id bigint, html binary"
    )
    rows = extract_table_cells(df, id_col="doc_id").collect()
    assert len(rows) == 1
    assert rows[0].error is not None and rows[0].table_idx is None


def test_table_gate_matches_duckdb(spark):
    sf_dir = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pages = docs.selectExpr(
        "doc_id", docs_to_table_html_expr() + " AS html"
    )
    got = sorted(
        (r.doc_id, r.table_idx, r.row_idx, r.col_idx, r.is_header,
         r.cell_text)
        for r in extract_table_cells(pages, id_col="doc_id").collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_dir}/documents.parquet'"
    )
    exp = sorted(
        tuple(r) for r in con.execute(oracle_table_cells_sql()).fetchall()
    )
    assert got == exp


def test_table_extract_plan_is_narrow(spark):
    df = spark.createDataFrame([("u", "<table></table>")],
                               "url string, html string")
    plan = extract_table_cells(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Sort" not in plan


def test_table_grid_spans_hand_built(spark):
    from html5ever_elixir_spark.operators.tables import extract_table_grid

    html = (
        "<table>"
        "<tr><th>A</th><th colspan=2>B</th></tr>"
        "<tr><td rowspan=3>L</td><td>x</td><td>y</td></tr>"
        "<tr><td colspan='2'>wide</td></tr>"
        "<tr><td>p</td><td rowspan=0>z</td></tr>"
        "</table>"
    )
    df = spark.createDataFrame([("u", html)], "url string, html string")
    rows = sorted(
        (r.grid_row, r.grid_col, r.rowspan, r.colspan, r.is_header,
         r.cell_text)
        for r in extract_table_grid(df).collect()
    )
    assert rows == [
        (1, 1, 1, 1, 1, "A"),
        (1, 2, 1, 2, 1, "B"),
        (2, 1, 3, 1, 0, "L"),   # occupies col 1 of rows 2-4
        (2, 2, 1, 1, 0, "x"),
        (2, 3, 1, 1, 0, "y"),
        (3, 2, 1, 2, 0, "wide"),
        (4, 2, 1, 1, 0, "p"),
        (4, 3, 1, 1, 0, "z"),   # rowspan=0 simplified to 1
    ]


def test_table_grid_invalid_span_attrs(spark):
    from html5ever_elixir_spark.operators.tables import extract_table_grid

    html = (
        "<table><tr>"
        "<td colspan='abc'>a</td><td colspan='3x'>b</td>"
        "<td rowspan='-2'>c</td><td colspan='9999'>d</td>"
        "</tr></table>"
    )
    df = spark.createDataFrame([("u", html)], "url string, html string")
    rows = sorted(
        (r.grid_col, r.rowspan, r.colspan)
        for r in extract_table_grid(df).collect()
    )
    # 'abc'→1, '3x'→3 (leading digits), '-2'→1, 9999→capped 1000
    assert rows == [(1, 1, 1), (2, 1, 3), (5, 1, 1), (6, 1, 1000)]


def test_table_grid_gate_matches_duckdb(spark):
    import duckdb as _duck

    from html5ever_elixir_spark.operators.tables import (
        docs_to_grid_html_expr,
        extract_table_grid,
        oracle_table_grid_sql,
    )

    sf_dir = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pages = docs.selectExpr("doc_id", docs_to_grid_html_expr() + " AS html")
    got = sorted(
        (r.doc_id, r.grid_row, r.col_idx, r.grid_col, r.rowspan,
         r.colspan, r.is_header, r.cell_text)
        for r in extract_table_grid(pages, id_col="doc_id").collect()
    )
    con = _duck.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_dir}/documents.parquet'"
    )
    exp = sorted(
        (r[0], r[2], r[3], r[4], r[5], r[6], r[7], r[8])
        for r in con.execute(oracle_table_grid_sql()).fetchall()
    )
    assert got == exp


def test_table_cells_implied_structures():
    # parser-level implied structure feeding the walk (no Spark needed)
    from html5ever_elixir_spark.operators.tables import _doc_cells
    from html5ever_elixir_spark.parser.api import parse_document

    cases = [
        # bare tds: parser implies tbody+tr; implied cell closes
        ("<table><td>a<td>b</table>",
         [(1, 1, 1, 0, "a"), (1, 1, 2, 0, "b")]),
        # caption/colgroup are not cells and not tr containers
        ("<table><caption>cap</caption><tr><td>x</td></tr></table>",
         [(1, 1, 1, 0, "x")]),
        # thead/tfoot/tbody rows come back in DOCUMENT order (tfoot is
        # row 2 even though it renders last) — documented semantics
        ("<table><thead><tr><th>h</th></tr>"
         "<tfoot><tr><td>f</td></tr></tfoot>"
         "<tbody><tr><td>b</td></tr></table>",
         [(1, 1, 1, 1, "h"), (1, 2, 1, 0, "f"), (1, 3, 1, 0, "b")]),
        # a stray td outside any table is dropped by the tree builder
        ("<td>stray</td><table><tr><td>x</td></tr></table>",
         [(1, 1, 1, 0, "x")]),
        # implied cell close: <th>h<td>d → two cells in one row
        ("<table><tr><th>h<td>d</tr></table>",
         [(1, 1, 1, 1, "h"), (1, 1, 2, 0, "d")]),
    ]
    for html, exp in cases:
        assert _doc_cells(parse_document(html).doc) == exp, html
