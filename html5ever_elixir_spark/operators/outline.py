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

__all__ = ["heading_outline"]

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
