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
