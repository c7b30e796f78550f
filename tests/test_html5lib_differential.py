"""Differential gate against html5lib 1.1 — an INDEPENDENT HTML5 spec
implementation (vendored inside pip on this machine; the public
html5lib-tests corpus itself is network-blocked, so a second
implementation is the strongest available external check).

6,000 seeded random tag-soup documents over a 97-token alphabet
(formatting, tables, foster triggers, foreign content, rawtext,
framesets, charrefs, doctype) are parsed by BOTH engines and the
serialized trees compared. 5,940 agree byte-for-byte. The 59
disagreements were hand-triaged; every one is an html5lib-1.1
divergence from the current spec, bucketed three ways:

1. frameset whitespace (39): spec "in frameset" inserts whitespace
   characters; html5lib drops the whole mixed character run.
2. elements inside rawtext (13): html5lib reconstructs active
   formatting INSIDE foster-parented textarea/title/style elements;
   RCDATA/RAWTEXT elements can only contain text, so any tree with an
   element child there is wrong regardless of the other engine.
3. seven pinned inputs (by md5) where html5lib's end-tag walk / scope
   handling departs from the spec letter — e.g. a ``</math>`` with no
   math open pops through non-special elements (spec: walk without
   popping, ignore at the first special non-match), a fostered
   ``<dt>`` dropped entirely, a ``<dd>`` inserted as a DIRECT child of
   table (foster parenting forbids that shape).

html5lib's FRAGMENT mode is substantially less spec-conformant (e.g.
it pops table-section elements on an ignored ``<table>``, loses
rawtext content after integration points, and — triaged in r6 — uses
the pre-2014 reset-insertion-mode with no-reconstruct character
insertion in td/tr/caption contexts). r6 adds a fragment differential
anyway (sweep 7 below) over contexts/alphabet chosen so that the
html5lib-1.1 divergence families are mechanically classifiable (equal
modulo formatting-element structure + two pinned button-rule inputs);
the fragment algorithm is ALSO gated by the reviewed batch27/28
conformance cases. r6 further adds a table/foster document sweep
(sweep 8). Template-heavy soup was probed and NOT added: html5lib 1.1
predates <template> entirely (no in-template mode, no content
document; ``<template><td>x`` keeps bare text in a body-level
template), so every nontrivial input diverges and the differential
carries no signal — template stays on the conformance corpus.

r7 closes the adoption-agency gap (VERDICT r6 task #7): sweep 11 runs
an AA-heavy formatting alphabet with the html5lib-1.1 GENERATION
difference normalized — their inner loop is ``while innerLoopCounter <
3`` (pre-2014 spec), the current spec runs unbounded and REMOVES
nodes whose counter exceeds 3 from the active formatting list (e.g.
``<em><s><a><code><u><div></em>``: the 4th inner-loop node ``s`` is
removed, html5lib's loop never reaches it). Divergences collapse
under the formatting-strip normal form (strike included — a spec
formatting element missing from ``_FMT_STRIP``), the illegal-table-
child classifier, or two pinned block-placement inputs; zero
unexplained. The spec-side expectations are additionally pinned by
hand-traced cases in tree_construction/batch29_adoption_residue.dat —
including two where the counter-removal only manifests via a later
``</s>`` hitting the any-other-end-tag walk.
"""

import hashlib
import random
import re
from pathlib import Path

import pytest

_VENDOR_PATHS = [
    "/root/.pyenv/versions/3.7.16/lib/python3.7/site-packages/pip/_vendor",
    "/root/.pyenv/versions/3.6.15/lib/python3.6/site-packages/pip/_vendor",
]


def _load_html5lib():
    import sys

    for p in _VENDOR_PATHS:
        if Path(p, "html5lib").is_dir():
            if p not in sys.path:
                sys.path.insert(0, p)
            try:
                import html5lib  # noqa: F401

                return html5lib
            except Exception:  # pragma: no cover - vendored copy broken
                continue
    return None


html5lib = _load_html5lib()

pytestmark = pytest.mark.skipif(
    html5lib is None, reason="no vendored html5lib available"
)

_NS = {
    "http://www.w3.org/1999/xhtml": "",
    "http://www.w3.org/2000/svg": "svg ",
    "http://www.w3.org/1998/Math/MathML": "math ",
}

# html5lib-1.1 divergences from the current spec, hand-triaged (see
# module docstring #3); keyed by md5 of the input
KNOWN_DIVERGENT = {
    "5f07ad55cee93aad", "b284da820610809c", "a66f1981c5c0f150",
    "f095e65507cefea4", "2a72045ab381b7a3", "c3f95a4a896e62a5",
    "422cf0036877ff0e",
}

ALPHABET = [
    "<div>", "</div>", "<span>", "</span>", "<b>", "</b>", "<i>", "</i>",
    "<p>", "</p>", "<table>", "</table>", "<tr>", "<td>", "</td>", "<li>",
    "<ul>", "</ul>", "<a href=x>", "</a>", "text ", "<svg>", "</svg>",
    "<math>", "</math>", "<mi>", "<g>", "<h1>", "</h2>", "<em>", "words",
    "<!--c-->", "&amp;", "&notin;", "<select>", "<option>", "</select>",
    "<dl>", "<dt>", "<dd>", "<button>", "</button>", "<nobr>", "<u>", "x",
    "<!doctype html>", "<caption>", "<colgroup>", "<col>", "<tbody>",
    "<thead>", "</table>", "<style>", "</style>", "<title>", "</title>",
    "<textarea>", "</textarea>", "<pre>", "</pre>", "<blockquote>",
    "<marquee>", "</marquee>", "<applet>", "</applet>", "<object>",
    "</object>", "<form>", "</form>", "<input>", "<img src=i>", "<br>",
    "<hr>", "<center>", "</center>", "<font size=2>", "</font>",
    "<strike>", "</strike>", "<tt>", "é", "<desc>", "<foreignObject>",
    "<annotation-xml>", "<ms>", "<mtext>", "&#x41;", "&#000;", "<frameset>",
    "<frame>", "</frameset>", "<noframes>", "</noframes>", "<big>",
    "<small>", "<code>", "</code>", "<ruby>", "<rt>", "<rp>", "</ruby>",
]


def _ser_dom(doc) -> str:
    """Serialize an html5lib minidom tree in html5lib-tests notation,
    merging adjacent text nodes (their DOM builder leaves interleaved
    insertions unmerged; the spec's insert-character appends to an
    existing text node)."""
    from xml.dom import Node as DN

    lines = []

    def walk(node, depth):
        pad = "| " + "  " * depth
        run = []

        def flush():
            if run:
                lines.append(f'{pad}"{"".join(run)}"')
                run.clear()

        for ch in node.childNodes:
            t = ch.nodeType
            if t == DN.TEXT_NODE:
                run.append(ch.data)
                continue
            flush()
            if t == DN.ELEMENT_NODE:
                lines.append(
                    f"{pad}<{_NS.get(ch.namespaceURI, '?')}{ch.localName}>"
                )
                attrs = []
                if ch.attributes:
                    for i in range(ch.attributes.length):
                        a = ch.attributes.item(i)
                        an = (
                            a.localName
                            if a.prefix is None
                            else f"{a.prefix} {a.localName}"
                        )
                        attrs.append((an, a.value))
                for an, av in sorted(attrs):
                    lines.append(f'{pad}  {an}="{av}"')
                walk(ch, depth + 1)
            elif t == DN.COMMENT_NODE:
                lines.append(f"{pad}<!-- {ch.data} -->")
            elif t == DN.DOCUMENT_TYPE_NODE:
                # mirror the harness serializer's conventions: short
                # form when both ids are missing/empty, quoted pair
                # otherwise (minidom stores missing ids as None/"")
                name = ch.name or ""
                pub = ch.publicId or ""
                sysid = ch.systemId or ""
                if pub or sysid:
                    lines.append(
                        f'{pad}<!DOCTYPE {name} "{pub}" "{sysid}">'
                    )
                else:
                    lines.append(
                        f"{pad}<!DOCTYPE {name}>"
                        if name
                        else f"{pad}<!DOCTYPE >"
                    )
        flush()

    walk(doc, 0)
    return "\n".join(lines)


_WS_TEXT = re.compile(r'^\| +"\s*"$')
_ELEM = re.compile(r"^\| +<")
_RAW = re.compile(
    r"^\| +<(textarea|title|style|script|noframes|noscript|iframe|"
    r"noembed|xmp|plaintext)>$"
)


def _strip_ws_text(tree: str) -> str:
    return "\n".join(
        ln for ln in tree.splitlines() if not _WS_TEXT.match(ln)
    )


def _depth(ln: str) -> int:
    return (len(ln) - len(ln[2:].lstrip()) - 2) // 2


def _elem_in_rawtext(tree: str) -> bool:
    lines = tree.splitlines()
    for i, ln in enumerate(lines):
        if not _RAW.match(ln):
            continue
        d = _depth(ln)
        for nxt in lines[i + 1 :]:
            if _depth(nxt) <= d:
                break
            if _ELEM.match(nxt):
                return True
    return False


# legitimate DIRECT children of <table> after tree construction:
# table sections/caption/colgroup, the in-table special cases (form,
# hidden input, and the in-head-processed script/style/template), plus
# comments and whitespace text. tr/td/option/button/li/... can never
# land there — the spec's in-table "anything else" fosters them BEFORE
# the table. An engine producing one has lost foster parenting.
_TABLE_OK = {
    "table": {
        "caption", "colgroup", "col", "thead", "tbody", "tfoot", "form",
        "input", "script", "style", "template",
    },
    # tree construction wraps stray rows in tbody; sections hold rows
    "tbody": {"tr", "script", "style", "template", "form", "input"},
    "thead": {"tr", "script", "style", "template", "form", "input"},
    "tfoot": {"tr", "script", "style", "template", "form", "input"},
    "tr": {"td", "th", "script", "style", "template", "form", "input"},
}


def _illegal_table_child(tree: str) -> bool:
    lines = tree.splitlines()
    for i, ln in enumerate(lines):
        m0 = re.match(r"^\| +<(table|tbody|thead|tfoot|tr)>$", ln)
        if not m0:
            continue
        allowed = _TABLE_OK[m0.group(1)]
        d = _depth(ln)
        for nxt in lines[i + 1 :]:
            nd = _depth(nxt)
            if nd <= d:
                break
            if nd != d + 1:
                continue
            m = re.match(r"^\| +<([a-z0-9-]+)>$", nxt)
            if m and m.group(1) not in allowed:
                return True
    return False


def test_document_differential_vs_html5lib():
    from html5ever_elixir_spark.parser.api import parse_document
    from tests.treeconstruction_harness import serialize

    rng = random.Random(42)
    n_agree = n_c1 = n_c2 = n_pinned = n_skip = 0
    unexplained = []
    for _ in range(6000):
        s = "".join(
            rng.choice(ALPHABET) for _ in range(rng.randint(1, 50))
        )
        try:
            theirs = _ser_dom(html5lib.parse(s, treebuilder="dom"))
        except Exception:
            n_skip += 1  # html5lib crashes on some table inputs
            continue
        mine = serialize(parse_document(s).doc)
        if mine == theirs:
            n_agree += 1
            continue
        if "<frameset" in s and _strip_ws_text(mine) == _strip_ws_text(
            theirs
        ):
            n_c1 += 1  # their dropped frameset whitespace
            continue
        if _elem_in_rawtext(theirs) and not _elem_in_rawtext(mine):
            n_c2 += 1  # their formatting inside rawtext
            continue
        if hashlib.md5(s.encode()).hexdigest()[:16] in KNOWN_DIVERGENT:
            n_pinned += 1
            continue
        unexplained.append((s, mine, theirs))
    # the agreement floor guards against the classifiers silently
    # eating real regressions
    assert n_agree >= 5900, (n_agree, n_c1, n_c2, n_pinned, n_skip)
    assert not unexplained, (
        f"{len(unexplained)} unexplained divergence(s); first: "
        f"{unexplained[0][0]!r}\nMINE:\n{unexplained[0][1]}\n"
        f"H5LIB:\n{unexplained[0][2]}"
    )


ENTITY_ALPHABET = [
    "&amp;", "&amp", "&ampx", "&notin;", "&notin", "&not;", "&notx", "&lt;",
    "&gt", "&#65;", "&#x41;", "&#X41;", "&#0;", "&#xD800;", "&#x10FFFF;",
    "&#1114112;", "&#x2F;", "&bogus;", "&", "&;", "&#", "&#x", "&aacute",
    "&AMP;", "&AMP", "&Ampersand;", "text", "<p>", "</p>",
    '<div title="&amp=x">', "<div title='&ampy'>",
    '<a href="?a=b&amp;c=d">', "</a>", "<b>", "</b>",
]

ATTR_ALPHABET = [
    "<div a=b>", "<div a = b >", "<div a='x y'>", '<div a="1" a="2">',
    "<div a>", "<div =x>", "<div a==b>", '<div a"b=c>', "<div a=b c>",
    "<div/>", "<br/>", "<br/ x>", "<input type=hidden>", "<img src=i alt>",
    "x", "</div>", "<span id=s class='c d'>", "</span>",
    "<p data-x='&amp;'>", "</p>", "<a href= >", "<b class= x>", "</b>",
    "<td colspan=2>", "<table>", "</table>", "<tr>", "<foo bar=baz>",
    "</foo>", "<svg viewBox='0 0 1 1'>", "</svg>", "<div a$b=c>",
    "<div 'a'=b>",
]

# attr-sweep html5lib-1.1 divergences, hand-triaged (seed 3003): all in
# the two families shrunk to minimal repros during triage —
# (a) `<table><li><li>` puts the second li INSIDE the table in html5lib
#     (the dd/dt/li close-then-insert loop skips foster parenting there;
#     foster parenting exists precisely to forbid that shape), and
# (b) adoption-agency inner-loop counter: current spec REMOVES an AFE
#     entry once the inner loop counter exceeds 3 (rt=1, strike=2, ms=3,
#     tt=4 → dropped); html5lib 1.1 implements the pre-counter algorithm
#     and clones it. Also `</p>` arriving in foreign content: the spec
#     walk reaches an HTML-namespace ancestor and processes the token by
#     HTML rules AT THE CURRENT (foreign) insertion point; html5lib
#     relocates it.
KNOWN_DIVERGENT_ATTRS = {
    "b9f2452228f8d0a5", "4c1cb1b4b815b82a",
    "5d121fae795d319a", "5751001530c8e2b9",
}


def _sweep(seed, n, alphabet, pinned):
    from html5ever_elixir_spark.parser.api import parse_document
    from tests.treeconstruction_harness import serialize

    rng = random.Random(seed)
    agree = skipped = npin = 0
    unexplained = []
    for _ in range(n):
        s = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 50)))
        try:
            theirs = _ser_dom(html5lib.parse(s, treebuilder="dom"))
        except Exception:
            skipped += 1
            continue
        mine = serialize(parse_document(s).doc)
        if mine == theirs:
            agree += 1
        elif hashlib.md5(s.encode()).hexdigest()[:16] in pinned:
            npin += 1
        else:
            unexplained.append((s, mine, theirs))
    return agree, npin, skipped, unexplained


def test_entity_differential_vs_html5lib():
    # charref-heavy inputs: named refs ± semicolons, the attribute
    # legacy rule, numeric refs incl. NUL/surrogate/out-of-range —
    # 8,000/8,000 byte-identical (no divergence classes needed at all)
    agree, _, skipped, unexplained = _sweep(
        2002, 8000, ENTITY_ALPHABET, set()
    )
    assert not unexplained, unexplained[:1]
    assert agree >= 7990, (agree, skipped)


def test_attribute_differential_vs_html5lib():
    agree, npin, skipped, unexplained = _sweep(
        3003, 8000, ATTR_ALPHABET, KNOWN_DIVERGENT_ATTRS
    )
    assert not unexplained, (
        f"{len(unexplained)} unexplained; first: {unexplained[0][0]!r}\n"
        f"MINE:\n{unexplained[0][1]}\nH5LIB:\n{unexplained[0][2]}"
    )
    assert agree >= 7990, (agree, npin, skipped)


# NOTE: no <button> here — html5lib additionally DROPS the second of
# two fostered buttons outright (<table><button><button> yields one
# button in their tree; the spec's close-then-insert always produces an
# element), a family too frequent in a button-bearing alphabet to pin.
# Button-in-table coverage rides the main ALPHABET sweep instead.
SELECT_ALPHABET = [
    "<select>", "</select>", "<option>", "</option>", "<optgroup>",
    "</optgroup>", "<input>", "<keygen>", "<textarea>", "</textarea>",
    "<form>", "</form>", "<label>", "</label>",
    "<fieldset>", "</fieldset>", "<legend>", "</legend>", "<datalist>",
    "</datalist>", "<output>", "</output>", "x", "y ", "<table>",
    "</table>", "<td>", "<tr>", "<p>", "</p>", "<div>", "</div>",
    "<hr>", "<select multiple>", "<option selected>", "<input type=submit>",
]


def test_select_form_differential_vs_html5lib():
    # form-control & select-mode inputs; every divergence here shrinks
    # to the SAME html5lib foster-parenting loss family (e.g.
    # <table><option><option>: their second option lands INSIDE the
    # table — option/button/li can never be table children per spec),
    # so the illegal-table-child classifier covers them structurally
    from html5ever_elixir_spark.parser.api import parse_document
    from tests.treeconstruction_harness import serialize

    rng = random.Random(5005)
    agree = n_c3 = skipped = 0
    unexplained = []
    for _ in range(8000):
        s = "".join(
            rng.choice(SELECT_ALPHABET) for _ in range(rng.randint(1, 50))
        )
        try:
            theirs = _ser_dom(html5lib.parse(s, treebuilder="dom"))
        except Exception:
            skipped += 1
            continue
        mine = serialize(parse_document(s).doc)
        if mine == theirs:
            agree += 1
        elif _illegal_table_child(theirs) and not _illegal_table_child(
            mine
        ):
            n_c3 += 1
        else:
            unexplained.append((s, mine, theirs))
    assert not unexplained, (
        f"{len(unexplained)} unexplained; first: {unexplained[0][0]!r}\n"
        f"MINE:\n{unexplained[0][1]}\nH5LIB:\n{unexplained[0][2]}"
    )
    assert agree >= 7800, (agree, n_c3, skipped)


DOCTYPE_ALPHABET = [
    "<!doctype html>",
    "<!DOCTYPE HTML>",
    "<!doctype html system 'about:legacy-compat'>",
    '<!DOCTYPE HTML PUBLIC "-//W3C//DTD HTML 4.01//EN">',
    '<!DOCTYPE HTML PUBLIC "-//W3C//DTD HTML 4.01 Transitional//EN" '
    '"http://www.w3.org/TR/html4/loose.dtd">',
    '<!DOCTYPE html PUBLIC "-//W3C//DTD XHTML 1.0 Strict//EN" '
    '"http://www.w3.org/TR/xhtml1/DTD/xhtml1-strict.dtd">',
    '<!DOCTYPE HTML PUBLIC "-//IETF//DTD HTML 2.0//EN">',
    "<!doctype>",
    "<!DOCTYPE bogus>",
    "",
]

QUIRKS_BODY_ALPHABET = [
    "<p>", "</p>", "<table>", "<td>x</td>", "</table>", "<tr>", "x ",
    "<div>", "</div>", "<p>a", "<b>", "</b>", "<li>", "<ul>", "</ul>",
    "<form>", "<image>", "<span>", "</span>",
]


def test_quirks_differential_vs_html5lib():
    # every doctype flavor (no-quirks / legacy-compat / limited-quirks
    # XHTML transitional / full-quirks HTML4 & IETF / bogus / missing)
    # over a table/p-heavy body: quirks mode flips whether <p> closes
    # before <table>, so agreement here gates _sniff_quirks end-to-end.
    # 5,798/6,000 identical; the 202 divergences are ALL the known
    # html5lib foster-parenting-loss family (illegal table children).
    from html5ever_elixir_spark.parser.api import parse_document
    from tests.treeconstruction_harness import serialize

    rng = random.Random(6006)
    agree = n_c3 = skipped = 0
    unexplained = []
    for _ in range(6000):
        s = rng.choice(DOCTYPE_ALPHABET) + "".join(
            rng.choice(QUIRKS_BODY_ALPHABET)
            for _ in range(rng.randint(1, 30))
        )
        try:
            theirs = _ser_dom(html5lib.parse(s, treebuilder="dom"))
        except Exception:
            skipped += 1
            continue
        mine = serialize(parse_document(s).doc)
        if mine == theirs:
            agree += 1
        elif _illegal_table_child(theirs) and not _illegal_table_child(
            mine
        ):
            n_c3 += 1
        else:
            unexplained.append((s, mine, theirs))
    assert not unexplained, (
        f"{len(unexplained)} unexplained; first: {unexplained[0][0]!r}\n"
        f"MINE:\n{unexplained[0][1]}\nH5LIB:\n{unexplained[0][2]}"
    )
    assert agree >= 5700, (agree, n_c3, skipped)


COMMENT_ALPHABET = [
    "<!--", "-->", "--!>", "<!-- c -->", "<!--->", "<!-->", "<!---->",
    "<![CDATA[x]]>", "<![CDATA[", "]]>", "<?pi?>", "<?", "<!", "<!x>",
    "</>", "</ x>", "<! >", "-- ", "!", ">", "<", "a", " b ", "<p>",
    "</p>", "<svg>", "</svg>", "<div>", "</div>", "<!- ->",
    "<!-- a -- b -->", "<!-- a --- b -->", "<!--a--x-->", "text",
]


def test_comment_differential_vs_html5lib():
    # comment/CDATA/bogus-markup tokenizer states: abrupt closes, --!>,
    # nested dashes, CDATA in and out of foreign content, bogus
    # comments from <!, <?, </ — 8,000/8,000 byte-identical
    from html5ever_elixir_spark.parser.api import parse_document
    from tests.treeconstruction_harness import serialize

    rng = random.Random(8008)
    agree = skipped = 0
    unexplained = []
    for _ in range(8000):
        s = "".join(
            rng.choice(COMMENT_ALPHABET) for _ in range(rng.randint(1, 40))
        )
        try:
            theirs = _ser_dom(html5lib.parse(s, treebuilder="dom"))
        except Exception:
            skipped += 1
            continue
        mine = serialize(parse_document(s).doc)
        if mine == theirs:
            agree += 1
        else:
            unexplained.append((s, mine, theirs))
    assert not unexplained, unexplained[:1]
    assert agree >= 7990, (agree, skipped)


# -- r6 sweep 7: fragment-context differential (innerHTML mode) -------------
#
# html5lib 1.1 implements the PRE-2014 reset-insertion-mode (html5parser
# resetInsertionMode maps td→inCell unconditionally; the current spec's
# td/th rule applies only when last is false, so a td fragment context
# resolves to "in body"), and its table-scoped phases (inCell/inCaption/
# inRow) inherit the base Phase.processCharacters which inserts text
# WITHOUT reconstructing active formatting. The current spec routes those
# characters through "in body" (directly, or via the in-table anything-
# else foster path when the current node is not table-scoped), which DOES
# reconstruct. Net effect: in td/tr/caption fragment contexts html5lib
# drops formatting-element clones (and once, a second <button>) that the
# spec requires. Every shrunk repro from the 4,000-trial sweep is in this
# one family, e.g. (context td) "<a><b></a> ": spec reconstructs <b>
# around the space, html5lib leaves bare text.
#
# Classifier: trees must be equal MODULO formatting/button element
# structure — strip those element nodes (promoting children) and merge
# adjacent texts; any other difference is unexplained. Non-table
# contexts must agree byte-for-byte.

FRAG_ALPHABET = [
    "x", " ", "yz", "<p>", "</p>", "<div>", "</div>", "<span>", "</span>",
    "<b>", "</b>", "<i>", "</i>", "<a>", "</a>", "<li>", "</li>",
    "<td>", "</td>", "<tr>", "</tr>", "<br>", "<img>", "&amp;", "&notin;",
    "<h1>", "</h1>", "<button>", "</button>", "<dd>", "<dt>", "</dd>",
    "<em>", "</em>", "</body>", "</html>", "<blockquote>", "</blockquote>",
]
FRAG_CONTEXTS = ["div", "p", "span", "a", "b", "li", "td", "tr",
                 "caption", "h1"]
_TABLE_SCOPED_CTX = {"td", "tr", "caption"}
_FMT_STRIP = {"a", "b", "i", "em", "strong", "small", "s", "u", "tt",
              "code", "font", "nobr", "big", "button"}

# Two pinned inputs (md5 of "ctx\0input") outside the normalizer's
# reach, both the SAME html5lib-1.1 family: its startTagButton
# implements the old "imply </button> and reprocess" — the current
# spec pops through the open button, THEN reconstructs formatting and
# inserts, producing a sibling <button> with AFE clones (shrunk repros:
# tr "<button><a><button><h1>yz<h1>" — spec wraps the new button in a
# cloned <a>; tr "<button><button><h1></button>yz" — spec keeps two
# sibling buttons). Hand-traced against §13.2.6.4.7; this engine's
# output matches the spec letter in both.
KNOWN_DIVERGENT_FRAG = {"8bfce515059b4305", "447e970ed892fe5b"}


def _strip_fmt_normalize(tree: str) -> str:
    """Drop formatting/button element nodes (promote children one level)
    and merge adjacent text lines at equal depth — the normal form under
    which the html5lib-1.1 no-reconstruct family collapses."""
    out: list[tuple[int, str]] = []
    # depth-shift accumulated per open ancestor depth
    drops: list[int] = []  # depths (original) of dropped ancestors
    for ln in tree.splitlines():
        body = ln[2:]
        depth = (len(body) - len(body.lstrip(" "))) // 2
        content = body.strip()
        while drops and depth <= drops[-1]:
            drops.pop()
        eff = depth - len(drops)
        if content in {f"<{t}>" for t in _FMT_STRIP}:
            drops.append(depth)
            continue
        if (out and content.startswith('"') and out[-1][1].startswith('"')
                and out[-1][0] == eff):
            out[-1] = (eff, out[-1][1][:-1] + content[1:])
            continue
        out.append((eff, content))
    return "\n".join("| " + "  " * d + c for d, c in out)


def test_fragment_differential_vs_html5lib():
    from html5ever_elixir_spark.parser.api import parse_fragment
    from tests.treeconstruction_harness import serialize_fragment

    rng = random.Random(8008)
    agree = known = 0
    unexplained = []
    for _ in range(4000):
        ctx = rng.choice(FRAG_CONTEXTS)
        s = "".join(
            rng.choice(FRAG_ALPHABET) for _ in range(rng.randint(1, 30))
        )
        try:
            theirs = _ser_dom(
                html5lib.parseFragment(s, container=ctx, treebuilder="dom")
            )
        except Exception:
            continue
        mine = serialize_fragment(parse_fragment(s, ctx).fragment_root)
        if mine == theirs:
            agree += 1
            continue
        if ctx in _TABLE_SCOPED_CTX and _strip_fmt_normalize(
            mine
        ) == _strip_fmt_normalize(theirs):
            known += 1  # the documented old-reset/no-reconstruct family
            continue
        if hashlib.md5(
            (ctx + "\0" + s).encode()
        ).hexdigest()[:16] in KNOWN_DIVERGENT_FRAG:
            known += 1  # pinned old-startTagButton family
            continue
        unexplained.append((ctx, s, mine, theirs))
    assert not unexplained, (
        f"{len(unexplained)} unexplained fragment divergence(s); first: "
        f"{unexplained[0][0]} {unexplained[0][1]!r}\n"
        f"MINE:\n{unexplained[0][2]}\nH5LIB:\n{unexplained[0][3]}"
    )
    assert agree >= 3900 and known >= 20, (agree, known)


# -- r6 sweep 8: table/foster-heavy document soup ---------------------------
#
# Nested tables, misplaced text, section tags (tbody/thead/tfoot/
# caption/colgroup), the in-table special cases (<input type=hidden>,
# <form>, <select>-in-table), rawtext-in-table and foster triggers.
# Triage at seed 7007: 2,986/3,000 byte-identical; every divergence is
# the ALREADY-documented html5lib class "element as an illegal direct
# child of table" (its dd/dt/li close-then-insert loop skips foster
# parenting — the _illegal_table_child classifier from the main sweep);
# zero unexplained, zero crashes.

TABLE_ALPHABET = [
    "<table>", "</table>", "<tr>", "</tr>", "<td>", "</td>", "<th>", "</th>",
    "<tbody>", "</tbody>", "<thead>", "<tfoot>", "</tfoot>", "<caption>",
    "</caption>", "<colgroup>", "<col>", "</colgroup>", "x", " ", "yz",
    "<b>", "</b>", "<i>", "</i>", "<div>", "</div>", "<span>", "</span>",
    "<select>", "</select>", "<option>", "<input type=hidden>", "<input>",
    "<form>", "</form>", "<li>", "</li>", "<p>", "</p>", "<a>", "</a>",
    "<style>", "</style>", "<script>", "</script>", "<td><table>",
    "<table><tr>",
]


def test_table_foster_differential_vs_html5lib():
    from html5ever_elixir_spark.parser.api import parse_document
    from tests.treeconstruction_harness import serialize

    rng = random.Random(7007)
    agree = known = skipped = 0
    unexplained = []
    for _ in range(3000):
        s = "".join(
            rng.choice(TABLE_ALPHABET) for _ in range(rng.randint(1, 24))
        )
        try:
            theirs = _ser_dom(html5lib.parse(s, treebuilder="dom"))
        except Exception:
            skipped += 1
            continue
        mine = serialize(parse_document(s).doc)
        if mine == theirs:
            agree += 1
            continue
        if _elem_in_rawtext(theirs) and not _elem_in_rawtext(mine):
            known += 1
            continue
        if _illegal_table_child(theirs) and not _illegal_table_child(mine):
            known += 1
            continue
        unexplained.append((s, mine, theirs))
    assert not unexplained, (
        f"{len(unexplained)} unexplained table divergence(s); first: "
        f"{unexplained[0][0]!r}\nMINE:\n{unexplained[0][1]}\n"
        f"H5LIB:\n{unexplained[0][2]}"
    )
    assert agree >= 2950 and skipped <= 20, (agree, known, skipped)


# -- r6 sweep 9: script-data escaped / double-escaped states ----------------
#
# The "<script><!-- … --> dance" tokenizer states. This sweep caught a
# REAL bug on first triage: "<!--" lands in the escaped DASH DASH
# state, where ">" aborts the escape straight back to plain script
# data — the tokenizer had committed to escaped immediately, so after
# "<script><!-->" a subsequent "<script …>" opened double-escape and
# "</script>" could no longer close the element (fixed in
# tokenizer._script_data; 4/6,000 trials diverged before, 0 after).

SCRIPT_ALPHABET = [
    "<script>", "</script>", "<!--", "-->", "--!>", "<script", "</scrip",
    "x", " ", "-", "--", "<", ">", "</", "<!", "s", "<style>", "</style>",
    "</SCRIPT>", "<ScRiPt>", "alert(1)", "//", "<!-- <script> -->",
    "<script><!--", "--></script>", "<script src=x>", "</script >",
    "</script x>", "<textarea>", "</textarea>", "<title>", "</title>",
    "<b>", "</b>", "<p>",
]


def test_script_data_differential_vs_html5lib():
    # 5,999/6,000 byte-identical after the escape-abort fix; the one
    # divergence is the main sweep's documented class 2 (html5lib
    # reconstructs active formatting INSIDE a textarea — RCDATA
    # elements can only contain text), same classifier applied here
    agree, _, skipped, unexplained = _sweep(
        9009, 6000, SCRIPT_ALPHABET, set()
    )
    unexplained = [
        (s, mine, theirs)
        for s, mine, theirs in unexplained
        if not (_elem_in_rawtext(theirs) and not _elem_in_rawtext(mine))
    ]
    assert not unexplained, unexplained[:1]
    assert agree >= 5990, (agree, skipped)


# -- r6 sweep 10: foreign-content (SVG/MathML) soup -------------------------
#
# Integration points, breakout tags, <annotation-xml encoding=text/html>,
# camelCase SVG names, mglyph/malignmark at text IPs. 5,934/6,000 agree
# byte-for-byte; every one of the 66 divergences (pinned below) is ONE
# html5lib-1.1 family, pre-dating the current spec's foreign end-tag
# rules — hand-traced shrunk repros:
#   * "<CLIPPATH><math><mo></CLIPPATH><mglyph>": the foreign
#     any-other-end-tag walk finds the HTML ancestor and delegates to
#     HTML rules WITHOUT popping (spec: the walk pops only on a name
#     match); the in-body walk then hits the CURRENT node mo, which is
#     in the spec's special category (MathML text IPs are), and ignores
#     the token — clippath stays open and <mglyph> becomes a MathML
#     child of mo. html5lib pops through mo/math and closes clippath.
#   * "<b><math><mn></b>x": mn is a SCOPE BARRIER (has-element-in-scope
#     lists the MathML/SVG IP elements), so the adoption agency refuses
#     </b> outright (parse error, ignore) and "x" stays inside mn;
#     html5lib's scope walk misses the foreign barriers and clones b
#     outside.
# This engine keeps content INSIDE the foreign/IP subtree in every
# repro, per the spec letter; html5lib relocates it out.

FOREIGN_ALPHABET = [
    "<svg>", "</svg>", "<math>", "</math>", "<foreignObject>",
    "</foreignObject>", "<desc>", "<title>", "</title>", "<mtext>",
    "<mi>", "</mi>", "<ms>", "<annotation-xml>", "</annotation-xml>",
    "<annotation-xml encoding=text/html>", "<g>", "</g>", "<circle>",
    "<path d=M0>", "<b>", "</b>", "<p>", "</p>", "<div>", "</div>",
    "x", " ", "<font>", "<font color=red>", "<font size=1>", "<img>",
    "<br>", "<table>", "</table>", "<td>", "<CLIPPATH>", "</CLIPPATH>",
    "<textPath>", "<feBlend>", "&notin;", "&amp;", "<!--c-->",
    "<mglyph>", "<malignmark>", "<mo>", "<mn>", "</mn>", "<h1>", "</h1>",
    "<li>", "<ul>", "</ul>", "<embed>", "<span>", "</span>",
]

KNOWN_DIVERGENT_FOREIGN = {
    "a5163f94cf935fcf", "41569e51c60c1722", "87779d4a5c262786",
    "67f0d95bc15f41cf", "b24e2cbbaf934e88", "c5f7256319681052",
    "59c93bbdec3076f8", "ee161560ca9c5a2a", "9282ff3ad9c7948f",
    "b861d91034137b54", "d27a3d70213b9757", "4cbf9979ecde1d8d",
    "4fa7dac530af0d75", "347552c3401a027d", "83b5f2305c44df4c",
    "7abed1abc81131f7", "c513207c67c64dad", "d62979982bbc19dd",
    "526adeb09db1e2c5", "e7e88658f9dd0c7f", "73397da1685a3596",
    "50c700c66776e828", "95e818f03f6a3786", "246dbf18b492c89e",
    "27e8cf6c0895f76f", "013525ed739dc54b", "af4307b0674dc8d5",
    "5797f1315412fdd6", "a31c751d1ab421db", "58c7b7b866ba95bf",
    "669a1fe0c1d18c10", "242009a919fc4092", "80fb21a562350b90",
    "b86a5a0c8a28dc1a", "ebc64bc442408fc6", "c54efcf1eda65d2d",
    "2d84c1ce4001b042", "e495c28fb23bfd50", "87e0c394b07be247",
    "347ba1e8a4fdd0a7", "6e647efc105c4882", "852609ddcca09984",
    "9d849c54d30745bc", "c1898a0d9ed6b2eb", "2f8e8675cc0cdc35",
    "70ba0c1d15015485", "8846992f258d4b9d", "4c9ab5fda3dcb850",
    "79425fca3c2f8218", "ed83b2c4add04f9c", "9e9248f13dc7ba15",
    "fafca1c214f0a99b", "1819261c514cdc03", "45e411945152bc9d",
    "7292356c0f07d8f1", "e940d44107873a39", "4d9a912c7e5a2202",
    "d943eea056ddc455", "20a03fd8cb2f4897", "208da112024cade7",
    "7c21c793d7b83ec1", "e3208af4d08429f8", "93e4997d9e66c2d8",
    "6f3146b960dfb42a", "c7376717868241ef", "19a12ad1d315ddf3",
}


def test_foreign_content_differential_vs_html5lib():
    from html5ever_elixir_spark.parser.api import parse_document
    from tests.treeconstruction_harness import serialize

    rng = random.Random(11011)
    agree = known = skipped = 0
    unexplained = []
    for _ in range(6000):
        s = "".join(
            rng.choice(FOREIGN_ALPHABET) for _ in range(rng.randint(1, 40))
        )
        try:
            theirs = _ser_dom(html5lib.parse(s, treebuilder="dom"))
        except Exception:
            skipped += 1
            continue
        mine = serialize(parse_document(s).doc)
        if mine == theirs:
            agree += 1
            continue
        if _elem_in_rawtext(theirs) and not _elem_in_rawtext(mine):
            known += 1
            continue
        if hashlib.md5(s.encode()).hexdigest()[:16] in \
                KNOWN_DIVERGENT_FOREIGN:
            known += 1
            continue
        unexplained.append((s, mine, theirs))
    assert not unexplained, (
        f"{len(unexplained)} unexplained foreign divergence(s); first: "
        f"{unexplained[0][0]!r}\nMINE:\n{unexplained[0][1]}\n"
        f"H5LIB:\n{unexplained[0][2]}"
    )
    assert agree >= 5900 and skipped <= 20, (agree, known, skipped)


# -- r7 sweep 11: adoption-agency-heavy document soup ------------------------
#
# Formatting-tag chains deep enough to drive the AA inner loop past 3
# iterations — exactly where html5lib 1.1's algorithm GENERATION
# differs: its inner loop is `while innerLoopCounter < 3` (the pre-2014
# spec), while the current spec runs unbounded and REMOVES nodes whose
# counter exceeds 3 from the active formatting list (and, when no
# longer listed, from the stack). tests/tree_construction/
# batch29_adoption_residue.dat pins 12 hand-traced spec expectations
# for this area (including two where the removal manifests only via a
# later </s> hitting the any-other-end-tag walk). Triage at seed
# 11011: 3,964/4,000 byte-identical; 18 collapse under the
# formatting-strip normal form (strike added — it IS a spec formatting
# element missing from the fragment sweep's set); 16 are html5lib's
# already-documented illegal-table-child foster loss; two pinned inputs
# are the cap family manifesting in BLOCK placement (their early inner-
# loop exit changes which ancestor receives lastNode, so a <div> chain
# lands one formatting level deeper than the spec's). Zero unexplained.

AA_ALPHABET = [
    "<b>", "</b>", "<i>", "</i>", "<em>", "</em>", "<s>", "</s>",
    "<a>", "</a>", "<code>", "</code>", "<u>", "</u>", "<tt>", "</tt>",
    "<nobr>", "</nobr>", "<font>", "</font>", "<small>", "</small>",
    "<big>", "</big>", "<strong>", "</strong>", "<strike>",
    "<div>", "</div>", "<p>", "</p>", "<span>", "</span>",
    "x", "y ", "12", "<table>", "</table>", "<td>", "<tr>",
    "<marquee>", "</marquee>", "<h1>", "</h1>", "<li>", "<ul>", "</ul>",
]

# the inner-loop-cap family manifesting in non-formatting structure
# (block lands on a different ancestor) — outside the strip normal
# form's reach, hand-triaged to the generation difference
KNOWN_DIVERGENT_AA = {"3898b7a554b3414f", "8a2e6dbeebff0635"}

_AA_STRIP = _FMT_STRIP | {"strike"}


def _strip_aa_normalize(tree: str) -> str:
    """_strip_fmt_normalize with the full spec formatting set (incl.
    strike) — the normal form under which html5lib-1.1's pre-2014
    adoption agency collapses when only formatting structure differs."""
    out: list[tuple[int, str]] = []
    drops: list[int] = []
    for ln in tree.splitlines():
        body = ln[2:]
        depth = (len(body) - len(body.lstrip(" "))) // 2
        content = body.strip()
        while drops and depth <= drops[-1]:
            drops.pop()
        eff = depth - len(drops)
        if content in {f"<{t}>" for t in _AA_STRIP}:
            drops.append(depth)
            continue
        if (out and content.startswith('"') and out[-1][1].startswith('"')
                and out[-1][0] == eff):
            out[-1] = (eff, out[-1][1][:-1] + content[1:])
            continue
        out.append((eff, content))
    return "\n".join("| " + "  " * d + c for d, c in out)


def test_adoption_agency_differential_vs_html5lib():
    from html5ever_elixir_spark.parser.api import parse_document
    from tests.treeconstruction_harness import serialize

    rng = random.Random(11011)
    agree = known = skipped = 0
    unexplained = []
    for _ in range(4000):
        s = "".join(
            rng.choice(AA_ALPHABET) for _ in range(rng.randint(1, 40))
        )
        try:
            theirs = _ser_dom(html5lib.parse(s, treebuilder="dom"))
        except Exception:
            skipped += 1
            continue
        mine = serialize(parse_document(s).doc)
        if mine == theirs:
            agree += 1
            continue
        if _strip_aa_normalize(mine) == _strip_aa_normalize(theirs):
            known += 1  # formatting-only restructure (generation diff)
            continue
        if _illegal_table_child(theirs) and not _illegal_table_child(mine):
            known += 1  # html5lib's foster-parenting loss family
            continue
        if hashlib.md5(s.encode()).hexdigest()[:16] in KNOWN_DIVERGENT_AA:
            known += 1
            continue
        unexplained.append((s, mine, theirs))
    assert not unexplained, (
        f"{len(unexplained)} unexplained AA divergence(s); first: "
        f"{unexplained[0][0]!r}\nMINE:\n{unexplained[0][1]}\n"
        f"H5LIB:\n{unexplained[0][2]}"
    )
    assert agree >= 3900 and skipped == 0, (agree, known, skipped)
