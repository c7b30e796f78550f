"""Main-content extraction heuristics over the parsed DOM.

The reference repo is parse-only; extraction is mandated by the
pipeline contract (BASELINE.json ``north_star``: "DOM heuristics
(text-density, link-density, tag-class boilerplate scoring) to strip
boilerplate"). The per-url extracted text must be byte-identical run to
run, so this algorithm is **pinned and versioned** — any change must
bump ``EXTRACT_VERSION`` and refreeze fixtures.

Algorithm v1 (deterministic, document order, single pass, iterative):

1. Walk the DOM depth-first. Skip entire subtrees rooted at elements in
   ``SKIP_TAGS`` (non-content / boilerplate containers) and skip
   comment / doctype / pi nodes. ``<template>`` contents are already
   detached by the parser.
2. A "block" is the text accumulated between boundaries; entering OR
   leaving an element in ``BLOCK_TAGS`` is a boundary (flush).
3. Per block, count total characters and characters contributed inside
   ``<a>`` descendants (anchor depth > 0).
4. Normalize each block: collapse ``[ \\t\\n\\r\\f]+`` runs to one
   space, strip ends. Drop empty blocks. Drop high link-density blocks
   (2 * anchor_chars > total_chars, raw counts).
5. Join surviving blocks with "\\n".

The regex class is written out explicitly so the DuckDB oracle SQL can
apply the *same* normalization (Java/RE2 ``\\s`` disagree on unicode).
"""

from __future__ import annotations

import re

from .dom import COMMENT, DOCTYPE, DOCUMENT, ELEMENT, HTML_NS, PI, TEXT, Node

EXTRACT_VERSION = "1"

SKIP_TAGS = frozenset(
    """script style template noscript iframe head nav footer header aside
    form button select option optgroup textarea object applet embed frame
    frameset noframes noembed svg math title xmp""".split()
)

BLOCK_TAGS = frozenset(
    """address article aside blockquote body br caption center dd details
    dialog dir div dl dt fieldset figcaption figure footer h1 h2 h3 h4 h5
    h6 header hgroup hr html li main menu nav ol p pre section summary
    table tbody td tfoot th thead tr ul""".split()
)

# tag-class boilerplate signal (north_star: "tag-class boilerplate
# scoring"): an element whose class/id token matches is skipped whole.
# Part of pinned v1 — matching is exact-token, lowercase.
BOILERPLATE_CLASS_TOKENS = frozenset(
    """nav navbar navigation menu footer header sidebar side-bar comment
    comments ad ads advert advertisement banner breadcrumb breadcrumbs
    pagination pager share social sponsored cookie-banner newsletter
    related-posts widget""".split()
)


def _has_boilerplate_class(node: Node) -> bool:
    if not node.attrs:
        return False
    for name, value in node.attrs:
        if name == "class" or name == "id":
            for token in value.lower().split():
                if token in BOILERPLATE_CLASS_TOKENS:
                    return True
    return False

_WS_RUN = re.compile(r"[ \t\n\r\f]+")


def extract_blocks(doc: Node):
    """Yield (normalized_text, total_chars, anchor_chars) per raw block."""
    blocks = []
    buf: list[str] = []
    total = 0
    anchor = 0

    def flush():
        nonlocal buf, total, anchor
        if buf:
            text = _WS_RUN.sub(" ", "".join(buf)).strip()
            if text:
                blocks.append((text, total, anchor))
        buf = []
        total = 0
        anchor = 0

    # iterative DFS with enter/exit events
    stack = [(doc, False)]
    anchor_depth = 0
    while stack:
        node, leaving = stack.pop()
        if leaving:
            if node.name == "a":
                anchor_depth -= 1
            elif node.name in BLOCK_TAGS:
                flush()
            continue
        t = node.type
        if t == TEXT:
            buf.append(node.contents)
            total += len(node.contents)
            if anchor_depth > 0:
                anchor += len(node.contents)
            continue
        if t in (COMMENT, DOCTYPE, PI):
            continue
        if t == ELEMENT:
            if node.namespace == HTML_NS and (
                node.name in SKIP_TAGS or _has_boilerplate_class(node)
            ):
                continue
            if node.name == "a":
                anchor_depth += 1
                stack.append((node, True))
            elif node.name in BLOCK_TAGS:
                flush()
                stack.append((node, True))
        for child in reversed(node.children):
            stack.append((child, False))
    flush()
    return blocks


def extract_text(doc: Node) -> str:
    """Pinned v1 main-content text (see module docstring)."""
    keep = [
        text
        for text, total, anchor in extract_blocks(doc)
        if 2 * anchor <= total
    ]
    return "\n".join(keep)


EXTRACT_V2_MIN_CHARS = 15
EXTRACT_V2_MAX_LINK_DENSITY = 1 / 3


def extract_text_v2(doc: Node) -> str:
    """Pinned v2 profile: v1 block segmentation + **text-density
    thresholds** — a block survives only if its normalized length is
    ≥ 15 chars AND anchor chars are ≤ 1/3 of raw chars. Drops headline
    stubs and link-dominated fragments; keeps body prose. Deterministic
    and SQL-reconstructable like v1."""
    keep = [
        text
        for text, total, anchor in extract_blocks(doc)
        if len(text) >= EXTRACT_V2_MIN_CHARS
        and 3 * anchor <= total
    ]
    return "\n".join(keep)


def extract_title(doc: Node) -> str | None:
    """Text of the first <title> element (document order), normalized."""
    stack = [doc]
    while stack:
        node = stack.pop()
        if node.type == ELEMENT and node.namespace == HTML_NS and node.name == "title":
            parts = []
            inner = [node]
            while inner:
                x = inner.pop()
                if x.type == TEXT:
                    parts.append(x.contents)
                inner.extend(reversed(x.children))
            return _WS_RUN.sub(" ", "".join(parts)).strip()
        stack.extend(reversed(node.children))
    return None


def extract_links(doc: Node) -> list[str]:
    """href values of <a> elements in document order."""
    out = []
    stack = [doc]
    while stack:
        node = stack.pop()
        if node.type == ELEMENT and node.name == "a":
            href = node.get_attr("href")
            if href is not None:
                out.append(href)
        stack.extend(reversed(node.children))
    return out


def extract_all(doc: Node) -> dict:
    """Single-pass fused traversal producing exactly what the four
    separate helpers produce (text / title / links / metrics) — the
    per-document hot path of the Spark operator. Equality with the
    separate functions is asserted in tests; any change here must keep
    them byte-identical (the DuckDB oracles depend on these outputs)."""
    blocks = []
    buf: list[str] = []
    total = 0
    anchor = 0
    anchor_depth = 0

    title_parts = None  # becomes a list when the first <title> is found
    links: list[str] = []

    n_nodes = 0
    n_elements = 0
    n_text_chars = 0
    n_anchors = 0
    max_depth = 0
    # per-type counts (rendered DOM reachable from the root; <template>
    # hidden documents are detached and intentionally not counted)
    n_texts = 0
    n_comments = 0
    n_doctypes = 0
    n_pis = 0
    n_documents = 0

    def flush():
        nonlocal buf, total, anchor
        if buf:
            text = _WS_RUN.sub(" ", "".join(buf)).strip()
            if text:
                blocks.append((text, total, anchor))
        buf = []
        total = 0
        anchor = 0

    # stack entries: (node, depth, leaving, skipped, in_title)
    stack = [(doc, 0, False, False, False)]
    while stack:
        node, depth, leaving, skipped, in_title = stack.pop()
        if leaving:
            if node.name == "a":
                anchor_depth -= 1
            elif node.name in BLOCK_TAGS:
                flush()
            continue
        t = node.type
        n_nodes += 1
        if depth > max_depth:
            max_depth = depth
        if t == TEXT:
            n_texts += 1
            n_text_chars += len(node.contents)
            if in_title and title_parts is not None:
                title_parts.append(node.contents)
            if not skipped:
                buf.append(node.contents)
                total += len(node.contents)
                if anchor_depth > 0:
                    anchor += len(node.contents)
            continue
        if t in (COMMENT, DOCTYPE, PI):
            if t == COMMENT:
                n_comments += 1
            elif t == DOCTYPE:
                n_doctypes += 1
            else:
                n_pis += 1
            continue
        child_skipped = skipped
        child_in_title = in_title
        if t == DOCUMENT:
            n_documents += 1
        if t == ELEMENT:
            n_elements += 1
            if node.name == "a":
                if node.attrs:
                    href = node.get_attr("href")
                    if href is not None:
                        links.append(href)
                n_anchors += 1
            if (
                node.namespace == HTML_NS
                and node.name == "title"
                and title_parts is None
            ):
                title_parts = []
                child_in_title = True
            if not skipped:
                if node.namespace == HTML_NS and (
                    node.name in SKIP_TAGS or _has_boilerplate_class(node)
                ):
                    child_skipped = True
                elif node.name == "a":
                    anchor_depth += 1
                    stack.append((node, depth, True, skipped, in_title))
                elif node.name in BLOCK_TAGS:
                    flush()
                    stack.append((node, depth, True, skipped, in_title))
        for child in reversed(node.children):
            stack.append((child, depth + 1, False, child_skipped, child_in_title))
    flush()

    text = "\n".join(
        b for b, tot, anc in blocks if 2 * anc <= tot
    )
    title = (
        _WS_RUN.sub(" ", "".join(title_parts)).strip()
        if title_parts is not None
        else None
    )
    return {
        "text": text,
        "title": title,
        "links": links,
        "n_nodes": n_nodes,
        "n_elements": n_elements,
        "n_text_chars": n_text_chars,
        "n_anchors": n_anchors,
        "max_depth": max_depth,
        "n_texts": n_texts,
        "n_comments": n_comments,
        "n_doctypes": n_doctypes,
        "n_pis": n_pis,
        "n_documents": n_documents,
    }


def dom_metrics(doc: Node) -> dict:
    """Cheap per-document structural metrics (for the metrics table)."""
    n_nodes = 0
    n_elements = 0
    n_text_chars = 0
    n_anchor = 0
    max_depth = 0
    stack = [(doc, 0)]
    while stack:
        node, depth = stack.pop()
        n_nodes += 1
        if depth > max_depth:
            max_depth = depth
        if node.type == ELEMENT:
            n_elements += 1
            if node.name == "a":
                n_anchor += 1
        elif node.type == TEXT:
            n_text_chars += len(node.contents)
        for child in node.children:
            stack.append((child, depth + 1))
    return {
        "n_nodes": n_nodes,
        "n_elements": n_elements,
        "n_text_chars": n_text_chars,
        "n_anchors": n_anchor,
        "max_depth": max_depth,
    }
