"""oculus_crawl_spark — a from-scratch PySpark-native fulltext engine.

Replaces the fetch-and-parse service of the reference project
(BigRLab/oculus-crawl — checkout empty in this sandbox, see SURVEY.md §0;
behavior known only as public knowledge) with an inverted-index build +
Okapi BM25 top-k query pipeline over Common-Crawl-style web-page tables,
per BASELINE.json north_rule.

Layout
------
- ``functions/``  : frozen analysis specs (extract/tokenize), BM25 math,
                    NumPy posting-block codec (delta + bitpacked FOR with
                    varint-style exceptions, "PForDelta-style").
- ``sources/``    : table readers, the Iceberg-or-Parquet write shim, and
                    the deterministic ``pages`` synthesizer (FIXTURES.md B1).
- ``operators/``  : index build (salted two-phase posting assembly),
                    block-max WAND query path, resumable segment merge,
                    plus the general relational / dedup / similarity /
                    text-analysis surface.
- ``streaming/``  : Structured Streaming demo over the events table.
- ``plans/``      : physical-plan inspection helpers (pushdown/broadcast
                    assertions used by tests).

Everything is DataFrame-first: Catalyst owns optimization; Python appears
only inside Arrow-vectorized pandas UDFs (no per-row Python), per
BASELINE.json input_hint.
"""

__version__ = "0.1.0"
