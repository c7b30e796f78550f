"""Differential gate for the CSS selector engine.

The engine (functions/selectors.py) matches right-to-left with
backtracking, one element at a time. This test re-derives the same
semantics with a COMPLETELY different evaluation strategy — naive
left-to-right set propagation over the whole tree (S0 = elements
matching the first compound; each combinator step maps the set through
the tree relation) — and compares matched node-id lists on thousands
of seeded random (document, selector) pairs. A disagreement means one
of the two independently-written evaluators is wrong.

Same style as tests/test_html5lib_differential.py: seeded
random.Random sweeps, zero-unexplained assertion.
"""

from __future__ import annotations

import random

import pytest

from html5ever_elixir_spark.functions.selectors import (
    SelectorError,
    compile_selector,
    iter_elements,
    select,
)
from html5ever_elixir_spark.parser.api import parse_document
from html5ever_elixir_spark.parser.dom import ELEMENT, TEXT


# ---------------------------------------------------------------------------
# naive evaluator (independent re-derivation; left-to-right, set-based)


def _n_tag(e):
    return e.name


def _n_attr(e, name):
    return e.get_attr(name)


def _n_compound_ok(e, comp) -> bool:
    """Evaluate one _Compound directly against an element."""
    if comp.tag is not None and _n_tag(e) != comp.tag:
        return False
    if comp.id is not None:
        if _n_attr(e, "id") != comp.id:
            return False
    if comp.classes:
        have = set((_n_attr(e, "class") or "").split())
        if not set(comp.classes) <= have:
            return False
    for name, op, val in comp.attrs:
        got = _n_attr(e, name)
        if got is None:
            return False
        if op is None:
            continue
        if op == "=" and got != val:
            return False
        if op == "~=" and (val == "" or val not in got.split()):
            return False
        if op == "|=" and not (got == val or got[: len(val) + 1] == val + "-"):
            return False
        if op == "^=" and (val == "" or got[: len(val)] != val):
            return False
        if op == "$=" and (val == "" or got[-len(val):] != val):
            return False
        if op == "*=" and (val == "" or got.find(val) < 0):
            return False
    if comp.pseudos or comp.nots:
        parent = e.parent
        if parent is not None:
            sibs = [c for c in parent.children if c.type == ELEMENT]
        else:
            sibs = [e]
        pos = sibs.index(e) + 1
        for name, arg in comp.pseudos:
            if name == "first-child" and pos != 1:
                return False
            if name == "last-child" and pos != len(sibs):
                return False
            if name == "only-child" and len(sibs) != 1:
                return False
            if name == "empty" and any(
                c.type == ELEMENT or c.type == TEXT for c in e.children
            ):
                return False
            if name == "nth-child":
                a, b = arg
                if a == 0:
                    if pos != b:
                        return False
                else:
                    # pos = a*n + b for integer n >= 0
                    k = pos - b
                    if k % a != 0 or k // a < 0:
                        return False
        for inner in comp.nots:
            if _n_compound_ok(e, inner):
                return False
    return True


def _ancestors(e):
    p = e.parent
    while p is not None and p.type == ELEMENT:
        yield p
        p = p.parent


def _prev_siblings(e):
    p = e.parent
    if p is None:
        return []
    out = []
    for c in p.children:
        if c is e:
            break
        if c.type == ELEMENT:
            out.append(c)
    return out


def naive_select(doc, selector: str):
    """Left-to-right set propagation: for each alternative, start from
    every element matching compound 0, then filter the whole element
    population by tree-relation to the previous step's set."""
    matched = set()
    for steps in compile_selector(selector):
        elems = list(iter_elements(doc))
        cur = {id(e) for e in elems if _n_compound_ok(e, steps[0][1])}
        for comb, comp in steps[1:]:
            nxt = set()
            for e in elems:
                if not _n_compound_ok(e, comp):
                    continue
                if comb == " ":
                    ok = any(id(a) in cur for a in _ancestors(e))
                elif comb == ">":
                    p = e.parent
                    ok = (
                        p is not None
                        and p.type == ELEMENT
                        and id(p) in cur
                    )
                elif comb == "+":
                    prevs = _prev_siblings(e)
                    ok = bool(prevs) and id(prevs[-1]) in cur
                else:  # '~'
                    ok = any(id(s) in cur for s in _prev_siblings(e))
                if ok:
                    nxt.add(id(e))
            cur = nxt
        matched |= cur
    return [e.id for e in iter_elements(doc) if id(e) in matched]


# ---------------------------------------------------------------------------
# random document + selector generators (seeded)

_TAGS = ["div", "span", "p", "section", "article", "b", "i", "a"]
_CLASSES = ["x", "y", "z", "big small", "x y"]
_IDS = ["i0", "i1", "i2", "i3", "i4", "i5"]
_ATTR_VALS = ["v", "v-w", "v w", "vw", "", "wv"]


def _gen_html(rng: random.Random) -> str:
    out = []
    depth = 0
    n_ids = 0

    def elem(budget: int) -> int:
        nonlocal depth, n_ids
        tag = rng.choice(_TAGS)
        attrs = []
        if rng.random() < 0.4:
            attrs.append(f' class="{rng.choice(_CLASSES)}"')
        if rng.random() < 0.25 and n_ids < len(_IDS):
            attrs.append(f' id="{_IDS[n_ids]}"')
            n_ids += 1
        if rng.random() < 0.3:
            attrs.append(f' data-k="{rng.choice(_ATTR_VALS)}"')
        if rng.random() < 0.15:
            attrs.append(" data-flag")
        out.append(f"<{tag}{''.join(attrs)}>")
        used = 1
        depth += 1
        while budget - used > 0 and rng.random() < 0.65 and depth < 6:
            r = rng.random()
            if r < 0.25:
                out.append(rng.choice(["t", " ", "tx ty"]))
            elif r < 0.32:
                out.append("<!--c-->")
            else:
                used += elem(budget - used)
        depth -= 1
        out.append(f"</{tag}>")
        return used

    total = 0
    while total < 12:
        total += elem(12 - total)
    return "".join(out)


def _gen_compound(rng: random.Random, allow_not: bool = True) -> str:
    parts = []
    if rng.random() < 0.6:
        parts.append(rng.choice(_TAGS + ["*"]))
    if rng.random() < 0.35:
        parts.append("." + rng.choice(["x", "y", "z", "big", "small"]))
    if rng.random() < 0.2:
        parts.append("#" + rng.choice(_IDS))
    if rng.random() < 0.35:
        op = rng.choice(["", "=", "~=", "|=", "^=", "$=", "*="])
        if op == "":
            parts.append(rng.choice(["[data-k]", "[data-flag]"]))
        else:
            val = rng.choice(["v", "v-w", "w", "vw", '"v w"', '""'])
            parts.append(f"[data-k{op}{val}]")
    if rng.random() < 0.3:
        parts.append(
            rng.choice(
                [
                    ":first-child",
                    ":last-child",
                    ":only-child",
                    ":empty",
                    ":nth-child(2)",
                    ":nth-child(odd)",
                    ":nth-child(even)",
                    ":nth-child(2n+1)",
                    ":nth-child(-n+2)",
                    ":nth-child(3n)",
                ]
            )
        )
    if allow_not and rng.random() < 0.25:
        inner = _gen_compound(rng, allow_not=False)
        parts.append(f":not({inner})")
    if not parts:
        parts.append("*")
    return "".join(parts)


def _gen_selector(rng: random.Random) -> str:
    def complex_sel():
        s = _gen_compound(rng)
        for _ in range(rng.randrange(0, 3)):
            comb = rng.choice([" ", " > ", " + ", " ~ "])
            s += comb + _gen_compound(rng)
        return s

    alts = [complex_sel() for _ in range(1 + (rng.random() < 0.2))]
    return ", ".join(alts)


# ---------------------------------------------------------------------------
# sweeps


@pytest.mark.parametrize("seed", range(8))
def test_differential_sweep(seed):
    rng = random.Random(0xC55 + seed)
    disagreements = []
    for trial in range(400):
        html = _gen_html(rng)
        sel = _gen_selector(rng)
        doc = parse_document(html).doc
        eng = [e.id for e in select(doc, sel)]
        ref = naive_select(doc, sel)
        if eng != ref:
            disagreements.append((trial, sel, html, eng, ref))
    assert not disagreements, disagreements[:3]


def test_differential_deep_chains():
    """Long combinator chains (4-6 steps) stress the backtracking."""
    rng = random.Random(0xDEE9)
    disagreements = []
    for trial in range(300):
        html = _gen_html(rng)
        sel = _gen_compound(rng)
        for _ in range(rng.randrange(3, 6)):
            sel += rng.choice([" ", " > ", " + ", " ~ "]) + _gen_compound(rng)
        doc = parse_document(html).doc
        eng = [e.id for e in select(doc, sel)]
        ref = naive_select(doc, sel)
        if eng != ref:
            disagreements.append((trial, sel, html, eng, ref))
    assert not disagreements, disagreements[:3]


def test_selector_parse_errors_are_typed():
    """Garbage selectors raise SelectorError, never other exceptions."""
    rng = random.Random(0xBAD5E1)
    alphabet = "div.#[]()>+~,: x=\"'*n-2"
    for _ in range(2000):
        s = "".join(
            rng.choice(alphabet) for _ in range(rng.randrange(1, 14))
        )
        try:
            compiled = compile_selector(s)
        except SelectorError:
            continue
        # if it compiled, it must also match without crashing
        doc = parse_document("<div class=x><p id=i0>t</p></div>").doc
        for e in iter_elements(doc):
            for alt in compiled:
                from html5ever_elixir_spark.functions.selectors import (
                    _matches_complex,
                )

                _matches_complex(e, alt)
