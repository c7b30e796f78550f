"""html5ever_elixir_spark — a from-scratch PySpark-native HTML5 parse +
main-content extraction engine with the query capabilities of
rusterlium/html5ever_elixir (reference at /root/reference, studied for
behavior only; no code copied — the reference is an Elixir NIF over the
Rust ``html5ever`` crate, while this package re-implements the WHATWG
HTML §13.2 algorithm in pure Python and runs it inside Arrow-vectorized
Spark UDFs over a Common-Crawl-style pages table).

Public API parity (reference ``lib/html5ever.ex:40-129``):

* :func:`html5ever_elixir_spark.parser.api.parse`             — nested tree, attrs as pair lists
* :func:`html5ever_elixir_spark.parser.api.parse_attrs_maps`  — nested tree, attrs as first-wins maps
* :func:`html5ever_elixir_spark.parser.api.flat_parse`        — flat ``{root, nodes}`` map
* :func:`html5ever_elixir_spark.parser.api.flat_parse_attrs_maps`

Spark-side surface lives in :mod:`html5ever_elixir_spark.operators`.
"""

__version__ = "0.1.0"
