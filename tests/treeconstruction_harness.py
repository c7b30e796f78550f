"""html5lib-tests tree-construction harness.

Parses the public corpus' ``.dat`` format and serializes our DOM in the
same ``#document`` notation, so the real html5lib-tests files
(tree-construction/*.dat) drop straight into ``tests/tree_construction/``
when available. The bundled files there are hand-authored from the
WHATWG spec (this sandbox has no network), targeting the edge areas the
round-1 verdict called out: CDATA in foreign content, doctype quirks,
adoption agency, foster parenting, rawtext/rcdata, template.

Format reference: html5lib/html5lib-tests README
(#data / #errors / #document sections; fragment cases use
#document-fragment which we skip — the reference exposes no fragment
entry point either).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from html5ever_elixir_spark.parser.dom import (  # noqa: E402
    COMMENT,
    DOCTYPE,
    DOCUMENT,
    ELEMENT,
    HTML_NS,
    MATHML_NS,
    PI,
    SVG_NS,
    TEXT,
)

_NS_PREFIX = {SVG_NS: "svg ", MATHML_NS: "math ", HTML_NS: ""}


def serialize(doc) -> str:
    """Serialize a parsed document in html5lib-tests notation."""
    lines: list[str] = []

    def walk(node, depth):
        pad = "| " + "  " * depth
        t = node.type
        if t == ELEMENT:
            lines.append(f"{pad}<{_NS_PREFIX.get(node.namespace, '')}{node.name}>")
            for name, value in sorted(node.attrs or []):
                lines.append(f'{pad}  {name}="{value}"')
            if node.template_contents is not None:
                lines.append(f"{pad}  content")
                for c in node.template_contents.children:
                    walk(c, depth + 2)
            for c in node.children:
                walk(c, depth + 1)
        elif t == TEXT:
            lines.append(f'{pad}"{node.contents}"')
        elif t == COMMENT:
            lines.append(f"{pad}<!-- {node.contents} -->")
        elif t == DOCTYPE:
            name = node.name or ""
            # the DOM stores MISSING public/system ids as "" (reference
            # parity: html5ever hands the sink empty tendrils), so the
            # short form covers both missing and genuinely-empty ids
            if node.public_id or node.system_id:
                pub = node.public_id or ""
                sysid = node.system_id or ""
                lines.append(f'{pad}<!DOCTYPE {name} "{pub}" "{sysid}">')
            else:
                lines.append(f"{pad}<!DOCTYPE {name}>" if name else f"{pad}<!DOCTYPE >")
        elif t == PI:
            lines.append(f"{pad}<?{node.name} {node.contents}?>")
        elif t == DOCUMENT:
            for c in node.children:
                walk(c, depth)

    for c in doc.children:
        walk(c, 0)
    return "\n".join(lines)


def parse_dat(text: str):
    """Yield dicts {data, errors, document, fragment, script} per case."""
    cases = []
    cur = None
    section = None
    for line in text.split("\n"):
        if line == "#data":
            if cur is not None:
                cases.append(cur)
            cur = {"data": [], "errors": [], "document": [], "fragment": None,
                   "script": None}
            section = "data"
        elif line in ("#errors", "#new-errors"):
            section = "errors"
        elif line == "#document":
            section = "document"
        elif line.startswith("#document-fragment"):
            section = "fragment"
        elif line in ("#script-on", "#script-off"):
            cur["script"] = line
        elif line.startswith("#"):
            section = "other"
        elif cur is not None:
            if section == "data":
                cur["data"].append(line)
            elif section == "errors":
                cur["errors"].append(line)
            elif section == "document":
                cur["document"].append(line)
            elif section == "fragment":
                cur["fragment"] = line
    if cur is not None:
        cases.append(cur)
    out = []
    for c in cases:
        # data/document keep internal newlines (multi-line text nodes
        # legitimately contain blank lines); only the trailing blank
        # case-separator lines are format artifacts
        data = "\n".join(c["data"])
        if data.endswith("\n"):
            data = data[:-1]
        doc = list(c["document"])
        while doc and not doc[-1]:
            doc.pop()
        out.append(
            {
                "data": data,
                "document": "\n".join(doc),
                "fragment": c["fragment"],
                "script": c["script"],
            }
        )
    return out


def serialize_fragment(root) -> str:
    """Serialize a fragment (the children of the fragment root) in
    html5lib-tests notation — fragment children print at depth 0."""

    class _FragmentDoc:
        type = "document"
        children = root.children

    return serialize(_FragmentDoc())


def run_file(path: str | Path):
    """Return (passes, failures) where failures is a list of
    (data, expected, got). ``#document-fragment`` cases run through
    the §13.4 fragment algorithm (r5; context string is the html5lib
    form: a tag name or "svg name"/"math name")."""
    from html5ever_elixir_spark.parser.api import parse_document, parse_fragment

    passes = 0
    failures = []
    for case in parse_dat(Path(path).read_text()):
        if case["script"] == "#script-on":
            continue
        if case["fragment"] is not None:
            got = serialize_fragment(
                parse_fragment(case["data"], case["fragment"]).fragment_root
            )
        else:
            got = serialize(parse_document(case["data"]).doc)
        if got == case["document"]:
            passes += 1
        else:
            failures.append((case["data"], case["document"], got))
    return passes, failures


if __name__ == "__main__":
    total_p = 0
    total_f = 0
    for p in sorted(Path(sys.argv[1]).glob("*.dat")):
        passes, failures = run_file(p)
        total_p += passes
        total_f += len(failures)
        print(f"{p.name}: {passes} pass, {len(failures)} fail")
        for data, exp, got in failures[:5]:
            print(f"  DATA: {data!r}")
            print("  EXPECTED:")
            for ln in exp.split(chr(10)):
                print("   ", ln)
            print("  GOT:")
            for ln in got.split(chr(10)):
                print("   ", ln)
    print(f"TOTAL: {total_p} pass, {total_f} fail")
