"""Pure-Python WHATWG HTML5 parser (tokenizer + tree construction).

From-scratch implementation of the algorithm the reference delegates to
the Rust ``html5ever`` crate (reference ``native/html5ever_nif/src/
arena_sink.rs:35-47`` drives ``parse_document``).  No third-party HTML
libraries are used (the sandbox has neither ``html5lib`` nor ``lxml``).
"""

from .api import parse, parse_attrs_maps, flat_parse, flat_parse_attrs_maps  # noqa: F401
