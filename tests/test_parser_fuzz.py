"""Property-based robustness: on ARBITRARY input the parser must never
raise (spec error recovery — the reference's only failure mode is
invalid UTF-8, which the str domain excludes) and the DOM must satisfy
its structural invariants.
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from html5ever_elixir_spark.parser.api import flat_parse, parse, parse_document

# bias toward markup-ish text so we actually exercise the state machine
_markupish = st.text(
    alphabet=st.sampled_from(
        list("<>&;/='\"! abcdefp-#x0123ABCtdlrsvgnoqu\t\n\x0c\x00�…é")
    ),
    max_size=200,
)
_tags = st.sampled_from(
    ["<p>", "</p>", "<div ", "<table>", "<td>", "</table>", "<b>", "</b>",
     "<a href='x'>", "</a>", "<!--", "-->", "<!doctype html>", "<template>",
     "</template>", "<script>", "</script>", "<svg>", "</svg>", "<math>",
     "<select>", "<option>", "<li>", "&amp;", "&#x41;", "&notin;", "<?pi?>",
     "<![CDATA[x]]>", "<title>", "</title>", "<textarea>", "<frameset>",
     "<form>", "<input type=hidden>", "<br/>", "]]>", "--!>", "<caption>",
     "<pre>", "</pre>", "<listing>", "</listing>", "<button>", "</button>",
     "<nobr>", "</nobr>", "<ruby>", "<rt>", "</html>", "</body>"]
)
_soup = st.lists(st.one_of(_markupish, _tags), max_size=30).map("".join)


def _check_invariants(doc):
    stack = [doc]
    seen_ids = set()
    while stack:
        node = stack.pop()
        assert node.id not in seen_ids, "duplicate node id"
        seen_ids.add(node.id)
        prev_type = None
        for child in node.children:
            assert child.parent is node, "parent/children mismatch"
            # invariant #1: consecutive text nodes are collapsed
            assert not (prev_type == "text" and child.type == "text"), (
                "adjacent text siblings"
            )
            prev_type = child.type
            stack.append(child)


@settings(max_examples=300, deadline=None)
@given(_soup)
def test_parser_never_raises_and_invariants_hold(html):
    builder = parse_document(html)
    assert builder.doc.id == 0
    _check_invariants(builder.doc)
    ok, tree = parse(html)
    assert ok == "ok"
    ok, flat = flat_parse(html)
    assert ok == "ok"
    assert flat["root"] == 0
    nodes = flat["nodes"]
    # flat map is closed: every parent/child id exists
    for nid, rec in nodes.items():
        if rec["parent"] is not None:
            assert rec["parent"] in nodes
        for cid in rec.get("children", ()):
            assert cid in nodes


def _count_nested(tree):
    """Node counts by kind from the nested tuple-tree encoding
    (api.py: document → list; element → (name, attrs, children);
    comment → ("comment", data); doctype → 4-tuple; pi → ("pi",
    target, contents)). Kinds are distinguished by SHAPE, not by
    node[0] — a literal <comment> tag is a 3-tuple element."""
    counts = {"element": 0, "text": 0, "comment": 0, "doctype": 0, "pi": 0}
    stack = [tree]
    while stack:
        node = stack.pop()
        if isinstance(node, str):
            counts["text"] += 1
        elif isinstance(node, list):
            stack.extend(node)
        elif isinstance(node, tuple):
            if len(node) == 4 and node[0] == "doctype":
                counts["doctype"] += 1
            elif len(node) == 2 and node[0] == "comment":
                counts["comment"] += 1
            elif len(node) == 3 and node[0] == "pi" and isinstance(
                node[2], str
            ):
                counts["pi"] += 1
            else:  # (name, attrs, children)
                counts["element"] += 1
                stack.extend(node[2])
    return counts


@settings(max_examples=150, deadline=None)
@given(_soup)
def test_nested_and_flat_encoders_agree(html):
    # the reference's two result sets (parse/1 vs flat_parse/1,
    # lib/html5ever.ex:40 vs :117) describe the SAME document: node
    # counts per kind must match between the encodings for ANY input
    ok, tree = parse(html)
    assert ok == "ok"
    ok, flat = flat_parse(html)
    assert ok == "ok"
    nested = _count_nested(tree)
    flat_counts = {"element": 0, "text": 0, "comment": 0, "doctype": 0,
                   "pi": 0}
    for rec in flat["nodes"].values():
        t = rec["type"]
        if t in flat_counts:
            flat_counts[t] += 1
    assert nested == flat_counts, (nested, flat_counts)
