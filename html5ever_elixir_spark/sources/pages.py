"""Deterministic pages corpora (input_hint shape:
``url string, warc_ts timestamp, html binary|string, text string,
lang string``).

Two generators:

1. :func:`pages_from_documents` — HTML templated from the driver's
   ``documents.parquet`` via a **shared SQL expression** evaluated
   identically by Spark and DuckDB. This is what makes the correctness
   oracle possible: DuckDB rebuilds the same html AND the expected
   extraction output with pure SQL, so the driver's side-by-side
   compare is an end-to-end gate on the whole parse+extract path.
   Built 100% JVM-side (no Python) — at 100 TB this is a parquet scan
   plus codegen'd string concat, no shuffle.

2. :func:`synth_pages` — adversarial case-catalog corpus (FIXTURES.md
   §3): dup attrs, templates, XML prologs, deep nesting, RAWTEXT,
   foster parenting, invalid UTF-8 binaries, a skewed host owning ~30%
   of rows, and oversized documents (~100× median) to exercise salting.
   Driver-generated (small, tests only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# ---------------------------------------------------------------------------
# 1. oracle-reconstructible corpus from the `documents` table
#
# Template (no inter-tag whitespace → no stray text nodes):
#   <!doctype html><html><head><title>Doc {d}</title>
#   <style>p{color:red}</style></head><body>
#   <h1>Title {d}</h1>
#   [d%3=0 → <!-- c{d} -->]
#   <div class="content"><p>{t}</p>[d%5=0 → <p>extra &amp; {d}</p>]</div>
#   <div class="nav"><a href="/p/{d+1}">next</a> <a href="/p/{d+2}">more</a></div>
#   <footer>copyright host</footer></body></html>
#
# Expected extraction v1: "Title {d}" \n norm({t}) [\n "extra & {d}"]
#   (title/style/footer skipped; nav-div dropped by link density).

_HTML_EXPR = (
    "'<!doctype html><html><head><title>Doc ' || cast(d as string) || "
    "'</title><style>p{color:red}</style></head><body>"
    "<h1>Title ' || cast(d as string) || '</h1>' || "
    "case when d % 3 = 0 then '<!-- c' || cast(d as string) || ' -->' "
    "else '' end || "
    "'<div class=\"content\"><p>' || t || '</p>' || "
    "case when d % 5 = 0 then '<p>extra &amp; ' || cast(d as string) || "
    "'</p>' else '' end || "
    "'</div><div class=\"nav\"><a href=\"/p/' || cast(d + 1 as string) || "
    "'\">next</a> <a href=\"/p/' || cast(d + 2 as string) || "
    "'\">more</a></div><footer>copyright host</footer></body></html>'"
)

_URL_EXPR = (
    "'https://host' || cast(d % 50 as string) || '.example/page' || "
    "cast(d as string)"
)


def norm_expr(col: str, dialect: str) -> str:
    """Whitespace normalization identical to extract.py v1.

    Spark regexp_replace is global; DuckDB needs the 'g' flag. The
    pattern embeds *actual* control characters (not backslash escapes):
    Spark SQL string literals silently drop the backslash from unknown
    escapes like ``\\f``, which would corrupt the class."""
    pattern = "[ \t\n\r\f]+"
    if dialect == "duckdb":
        return f"trim(regexp_replace({col}, '{pattern}', ' ', 'g'))"
    return f"trim(regexp_replace({col}, '{pattern}', ' '))"


def expected_text_expr(dialect: str) -> str:
    """The extraction-v1 output, reconstructed in SQL (oracle side)."""
    return (
        "'Title ' || cast(d as string) || chr(10) || "
        + norm_expr("t", dialect)
        + " || case when d % 5 = 0 then chr(10) || 'extra & ' || "
        "cast(d as string) else '' end"
    )


def pages_select_sql(docs_table: str, dialect: str) -> str:
    """Shared SELECT building the pages view from a documents table.
    Columns: url, warc_ts, html (string), text (expected extraction,
    frozen fixture column per input_hint), lang, doc_id."""
    if dialect == "duckdb":
        ts = "TIMESTAMP '2024-01-01 00:00:00' + to_seconds(d)"
    else:
        ts = ("timestamp'2024-01-01 00:00:00' + "
              "make_interval(0, 0, 0, 0, 0, 0, cast(d as int))")
    return (
        f"SELECT {_URL_EXPR} AS url, {ts} AS warc_ts, {_HTML_EXPR} AS html, "
        f"{expected_text_expr(dialect)} AS text, lang, d AS doc_id "
        f"FROM (SELECT doc_id AS d, text AS t, lang FROM {docs_table})"
    )


def pages_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.createOrReplaceTempView("_h5s_documents")
    return spark.sql(pages_select_sql("_h5s_documents", "spark"))


# ---------------------------------------------------------------------------
# 2. adversarial case-catalog corpus (FIXTURES.md §3)

_CASES = [
    ("basic",
     "<html><head></head><body><h1>Hello</h1><!-- my comment --></body></html>"),
    ("doctype",
     "<!doctype html><html><body><h1>Hello world</h1></body></html>"),
    ("dup-attrs",
     '<html><head></head><body test="woo" class="content" test="baz">'
     "<p>dup attr body</p></body></html>"),
    ("template",
     "<!doctype html><html><body><h1>Doc</h1><template><h2>Flower</h2>"
     '<img src="f.jpg"></template><p>after template</p></body></html>'),
    ("xml-prolog",
     '<?xml version="1.0" encoding="UTF-8"?><!DOCTYPE html PUBLIC '
     '"-//W3C//DTD XHTML 1.0 Strict//EN" '
     '"http://www.w3.org/TR/xhtml1/DTD/xhtml1-strict.dtd">'
     '<html xmlns="http://www.w3.org/1999/xhtml" xml:lang="en">'
     "<head><title>Hello</title></head><body><p>xhtml body</p></body></html>"),
    ("rawtext",
     "<html><head><style>body { color: red; } /* < not a tag */</style>"
     "<script>if (a < b && c > d) { x('<div>'); }</script></head>"
     "<body><p>raw text page</p></body></html>"),
    ("foster",
     "<table><tr><td>cell</td></tr>fostered text</table><p>after table</p>"),
    ("adoption",
     "<p>1<b>bold2<i>bolditalic</b>italic4</i>5</p>"),
    ("entities",
     "<p>&amp; &lt;x&gt; &copy; &#65;&#x42; caf&eacute;</p>"),
    ("deep", "<div>" * 60 + "deep text" + "</div>" * 60),
    ("unbalanced", "<div>" * 100 + "unbalanced tail"),
    ("pre", "<pre>\n  spaced   text\nline2</pre>"),
    ("select", "<select><option>a<option>b</select><p>after select</p>"),
    ("svg",
     '<svg viewBox="0 0 1 1"><circle r="1"/><foreignObject><p>fo text</p>'
     "</foreignObject></svg><p>after svg</p>"),
]

_LINKFARM = (
    "<html><body>"
    + "".join(
        f'<a href="/l/{i}">link {i}</a><br>' for i in range(300)
    )
    + "<p>one real paragraph of content in a sea of links</p></body></html>"
)

_INVALID_UTF8 = bytes(
    [98, 29, 104, 122, 46, 145, 14, 37, 122, 155, 227, 121, 49, 120, 108,
     209, 155, 113, 229, 98, 90, 181, 146]
)


def synth_pages(spark: SparkSession, n_pages: int = 200, seed: int = 42) -> DataFrame:
    """Deterministic adversarial corpus; html is BINARY (some rows
    deliberately invalid UTF-8). Host 0 owns ~30% of rows (skew tail);
    every 50th doc is ~100× median size (oversized-document salting
    case)."""
    import datetime

    rows = []
    base_ts = datetime.datetime(2024, 1, 1)
    for i in range(n_pages):
        case_name, html = _CASES[i % len(_CASES)]
        if i % 50 == 17:
            html_bytes = _INVALID_UTF8
            case_name = "invalid-utf8"
        elif i % 50 == 0:
            html_bytes = _LINKFARM.encode("utf-8")
            case_name = "linkfarm-oversized"
        else:
            # vary the payload deterministically so dedup ops see variety
            html_bytes = html.replace(
                "text", f"text {i * 2654435761 % 1000}"
            ).encode("utf-8")
        host = 0 if (i * 7919 % 10) < 3 else (i % 20) + 1  # ~30% on host0
        rows.append(
            (
                f"https://host{host}.example/p{i}",
                base_ts + datetime.timedelta(seconds=i),
                bytearray(html_bytes),
                None,
                "en",
                case_name,
            )
        )
    return spark.createDataFrame(
        rows,
        schema="url string, warc_ts timestamp, html binary, text string, "
        "lang string, case_name string",
    )
