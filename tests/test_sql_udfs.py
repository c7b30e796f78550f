def test_sql_scalar_functions(spark):
    from html5ever_elixir_spark.functions.sql_udfs import register_all

    register_all(spark)
    spark.createDataFrame(
        [
            ("<html><head><title>T</title></head><body><p>hello world "
             "content</p></body></html>",),
            (None,),
        ],
        "html string",
    ).createOrReplaceTempView("mini_pages")
    rows = spark.sql(
        "SELECT h5_title(html) AS t, h5_extract_text(html) AS x, "
        "h5_n_nodes(html) AS n, h5_parse_error(html) AS e, "
        "h5_tree_json(html) AS j FROM mini_pages"
    ).collect()
    ok = rows[0]
    assert ok.t == "T"
    assert ok.x == "hello world content"
    assert ok.n == 8  # doc, html, head, title, 'T', body, p, text
    assert ok.e is None
    assert ok.j.startswith('["#doc",')
    nul = rows[1]
    assert nul.t is None and nul.x is None and nul.n is None


def test_h5_pdf_text_sql_udf(spark):
    from html5ever_elixir_spark.functions.sql_udfs import register_all
    from html5ever_elixir_spark.parser.pdf import make_simple_pdf

    register_all(spark)
    rows = [
        (0, bytearray(make_simple_pdf(["pdf line one", "and two"]))),
        (1, bytearray(b"%PDF-1.4 not really a pdf")),
        (2, None),
    ]
    spark.createDataFrame(rows, "i bigint, payload binary").createOrReplaceTempView("pdfs")
    got = {r.i: r.t for r in spark.sql("SELECT i, h5_pdf_text(payload) AS t FROM pdfs").collect()}
    assert got[0] == "pdf line one\nand two"
    assert got[1] is None and got[2] is None
