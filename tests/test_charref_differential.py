"""Differential check of character-reference decoding against the
stdlib's independent WHATWG implementation (``html.unescape``).

Known, deliberate divergence: for numeric references to C0 control
characters (e.g. ``&#x1;``) the spec emits the character (parse error
only) — html5ever and browsers agree — while CPython's ``unescape``
drops them. We normalize those away before comparing.
"""

import random
import re
from html import unescape

from html5ever_elixir_spark.parser.api import parse

_CTRL = re.compile(r"[\x00-\x08\x0b\x0e-\x1f\x7f]")

FRAGS = [
    "&amp;", "&amp", "&AMP", "&notin;", "&not", "&notit;", "&#65;",
    "&#x41;", "&#X41;", "&#0;", "&#xD800;", "&#x110000;", "&#999999999;",
    "&bogus;", "&bogus", "&", "&&", "&#", "&#x", "&;", "&a",
    "&CounterClockwiseContourIntegral;", "&ampamp;", "&amp;amp;",
    "&ltamp", "&nbsp", "&nbsp;", "x", " ", "1", "&eacute", "&eacutex",
    "&Eacute;", "&frac12;", "&there4;", "&#x1D49C;", "&fjlig;", "&gg;",
]


def _text_of(html: str) -> str:
    ok, tree = parse("<p>" + html + "</p>")
    assert ok == "ok"
    body = tree[0][2][1]
    if not body[2]:
        return ""
    p = body[2][0]
    return "".join(c for c in p[2] if isinstance(c, str))


def test_charref_differential_20k():
    rng = random.Random(7)
    for _ in range(20000):
        s = "".join(rng.choice(FRAGS) for _ in range(rng.randint(1, 10)))
        mine = _CTRL.sub("", _text_of(s))
        expected = _CTRL.sub("", unescape(s))
        assert mine == expected, repr(s)
