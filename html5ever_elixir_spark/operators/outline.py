"""Document heading outline over the flat-node table: one row per
``<h1>``–``<h6>`` element in document order, with its level, REAL-parser
text content, and a parent pointer to the nearest preceding heading of
smaller level — the section tree every structure-aware consumer builds
(section-scoped chunking for RAG, TOC generation, heading-path context
strings for training data).

The reference engine stops at the parsed tree (``lib/html5ever.ex:
40-127``); the outline is the canonical body-structure consumer of
those nodes, complementing :mod:`metadata` (head) and :mod:`tables` /
:mod:`markdown` (block content).

Semantics (oracle-pinned):

* ``heading_idx`` — 1-based document-order position among the page's
  headings (node ids are creation order).
* ``level`` — the numeral in the tag name (h3 → 3).
* ``text`` — concatenated direct text children in node order, with the
  real parser's entity decoding (a parse gate, not a regex gate).
* ``parent_idx`` — the LARGEST j < heading_idx with level_j <
  level_idx, else NULL (the HTML5 outline "nearest ancestor candidate"
  rule over flat heading sequences; skipped levels attach to the
  nearest shallower heading, an h2 opening the page has no parent).

Plan shape / scale: heading elements filter to 6 tag names (a handful
of rows per page) and join text children on the uniform (url, element
id) key; the parent computation is a per-PAGE array fold (bounded by
headings-per-page — O(n²) row-locally on a tiny n, never a corpus
join), then one posexplode back to rows. Raw ``pages`` input is parsed
once via the eager localCheckpoint (the :mod:`graph` rule).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = ["heading_outline", "section_chunks", "assemble_sections"]

_TEXT_CONCAT = (
    "concat_ws('', transform(array_sort("
    "collect_list(struct(node_id, contents))), s -> s.contents))"
)

# per-page fold: hs = sorted array<struct<node_id, level, text>>;
# parent of element i (0-based) = 1-based index of the last preceding
# entry with a smaller level. slice() is 1-based; i = 0 gives an empty
# slice (no preceding headings -> NULL parent).
_WITH_PARENTS = """
transform(hs, (h, i) ->
  struct(
    cast(i + 1 as bigint) AS heading_idx,
    h.level AS level,
    h.text AS text,
    array_max(filter(
      transform(slice(hs, 1, i),
                (g, j) -> CASE WHEN g.level < h.level
                               THEN cast(j + 1 as bigint) END),
      x -> x IS NOT NULL)) AS parent_idx))
"""


def heading_outline(
    pages: DataFrame | None = None, nodes: DataFrame | None = None
) -> DataFrame:
    """pages/nodes → one row per h1–h6:
    ``(url, heading_idx bigint, level bigint, text string,
    parent_idx bigint)`` — pages without headings contribute no rows."""
    if nodes is None:
        if pages is None:
            raise ValueError("heading_outline needs pages or nodes")
        from .parse import flat_parse_nodes

        nodes = flat_parse_nodes(pages).localCheckpoint(eager=True)

    headings = nodes.where(
        "type = 'element' AND name IN ('h1','h2','h3','h4','h5','h6')"
    ).select(
        "url",
        F.col("node_id").alias("e_id"),
        F.expr("cast(substring(name, 2, 1) as bigint)").alias("level"),
    )
    texts = nodes.where("type = 'text'").select(
        "url", F.col("parent_id").alias("e_id"), "node_id", "contents"
    )
    per_heading = (
        headings.join(texts, ["url", "e_id"], "left")
        .groupBy("url", "e_id", "level")
        .agg(F.expr(_TEXT_CONCAT).alias("text"))
    )
    per_page = per_heading.groupBy("url").agg(
        F.expr(
            "sort_array(collect_list(struct(e_id AS node_id, level, text)))"
        ).alias("hs")
    )
    return (
        per_page.select(
            "url", F.explode(F.expr(_WITH_PARENTS)).alias("h")
        )
        .select(
            "url", "h.heading_idx", "h.level", "h.text", "h.parent_idx"
        )
    )


def assemble_sections(items: list[tuple[int, str, int, str]]) -> list[dict]:
    """Pure per-page assembly (testable Spark-free): ``items`` =
    [(node_id, kind 'h'|'p', level, text)] in any order. Returns one
    dict per section in document order: paragraphs belong to the most
    recent heading (section_idx = that heading's 1-based index, 0 for
    preamble paragraphs before any heading), and ``heading_path`` walks
    the nearest-shallower parent chain (the :func:`heading_outline`
    rule) root-first, ' > '-joined."""
    items = sorted(items)
    headings: list[tuple[int, str, int | None]] = []  # (level, text, parent)
    out: list[dict] = []
    cur: dict | None = None

    def flush():
        # emit heading sections always (empty ones keep the outline
        # covered); a preamble row only exists if paragraphs preceded
        # every heading
        if cur is not None and (
            cur["n_paragraphs"] > 0 or cur["section_idx"] > 0
        ):
            out.append(cur)

    for _nid, kind, level, text in items:
        if kind == "h":
            flush()
            parent = None
            for j in range(len(headings) - 1, -1, -1):
                if headings[j][0] < level:
                    parent = j + 1
                    break
            headings.append((level, text, parent))
            path, k = [], len(headings)
            while k is not None:
                path.append(headings[k - 1][1])
                k = headings[k - 1][2]
            cur = {
                "section_idx": len(headings),
                "heading_path": " > ".join(reversed(path)),
                "section_text": "",
                "n_paragraphs": 0,
            }
        else:
            if cur is None:
                cur = {"section_idx": 0, "heading_path": "",
                       "section_text": "", "n_paragraphs": 0}
            cur["section_text"] = (
                (cur["section_text"] + " " + text) if cur["section_text"]
                else text
            )
            cur["n_paragraphs"] += 1
    flush()
    return out


SECTION_SCHEMA = (
    "url string, section_idx bigint, heading_path string, "
    "section_text string, n_paragraphs bigint"
)


def section_chunks(
    pages: DataFrame | None = None, nodes: DataFrame | None = None
) -> DataFrame:
    """Section-scoped chunking — the RAG-grade unit: one row per
    heading-delimited section with its ``heading_path`` context string
    (what retrieval pipelines prepend so an isolated chunk keeps its
    document position) and the concatenated ``<p>`` text in document
    order. Headings with no paragraphs still emit (empty text) so the
    section table covers the whole outline; preamble paragraphs before
    any heading emit section_idx 0 with an empty path.

    Plan: the heading and paragraph legs ride the SAME parsed-node
    lineage (eager localCheckpoint when raw pages arrive) and union
    into one typed row set; assembly is one ``applyInPandas`` over the
    url key — per-group state bounded by one PAGE's headings +
    paragraph text, and only the typed rows shuffle, never the html."""
    import pandas as pd

    if nodes is None:
        if pages is None:
            raise ValueError("section_chunks needs pages or nodes")
        from .parse import flat_parse_nodes

        nodes = flat_parse_nodes(pages).localCheckpoint(eager=True)

    elems = nodes.where(
        "type = 'element' AND name IN "
        "('h1','h2','h3','h4','h5','h6','p')"
    ).select(
        "url",
        F.col("node_id").alias("e_id"),
        F.expr(
            "CASE WHEN name = 'p' THEN 'p' ELSE 'h' END"
        ).alias("kind"),
        F.expr(
            "CASE WHEN name = 'p' THEN 0L "
            "ELSE cast(substring(name, 2, 1) as bigint) END"
        ).alias("level"),
    )
    texts = nodes.where("type = 'text'").select(
        "url", F.col("parent_id").alias("e_id"), "node_id", "contents"
    )
    rows = (
        elems.join(texts, ["url", "e_id"], "left")
        .groupBy("url", "e_id", "kind", "level")
        .agg(F.expr(_TEXT_CONCAT).alias("text"))
    )

    def assemble(pdf: pd.DataFrame) -> pd.DataFrame:
        url = pdf["url"].iloc[0]
        items = [
            (int(e), k, int(lv), t or "")
            for e, k, lv, t in zip(
                pdf["e_id"], pdf["kind"], pdf["level"], pdf["text"]
            )
        ]
        secs = assemble_sections(items)
        return pd.DataFrame(
            {
                "url": [url] * len(secs),
                "section_idx": [s["section_idx"] for s in secs],
                "heading_path": [s["heading_path"] for s in secs],
                "section_text": [s["section_text"] for s in secs],
                "n_paragraphs": [s["n_paragraphs"] for s in secs],
            }
        )

    return rows.groupBy("url").applyInPandas(assemble, SECTION_SCHEMA)
