"""ncpi_whistler_spark — a PySpark-native data-harmonization + analytics engine.

A from-scratch engine with the query and data-processing capabilities of
NIH-NCPI/ncpi-whistler (reference surveyed in /root/repo/SURVEY.md), built on
the Spark DataFrame/Catalyst stack:

- ``sources``   — normalized CSV scans, data-dictionary and harmony-CSV
                  parsing (reference: wstlr/extractor.py, wstlr/dd/*,
                  wstlr/conceptmap.py).
- ``functions`` — the whistle scalar-function surface re-expressed as native
                  Column builders (reference: wstlr/wlib/core/*.wstl).
- ``operators`` — dataflow operators: group-by-to-nested-content, embed
                  (left hash join to array), wide→long aggregators,
                  harmonize lookup, dedup family, profiling, relational and
                  LLM-pipeline extensions.
- ``plans``     — study-config → DataFrame-DAG compiler (replaces the
                  whistle subprocess; reference: wstlr/play.py).
- ``sinks``     — bundle/REST/id-resolution sinks (reference: wstlr/load.py,
                  wstlr/bundle.py).
- ``streaming`` — Structured Streaming extensions over event tables.

Everything is declarative DataFrame code so Catalyst can push filters into
scans, prune columns, broadcast small dimensions and re-plan with AQE —
designed for 1000-executor / 100 TB deployments even when tested on
``local[*]``.
"""

__version__ = "0.1.0"

from ncpi_whistler_spark.session import get_spark
from ncpi_whistler_spark.catalog import load_table, load_tables, TABLES

__all__ = ["get_spark", "load_table", "load_tables", "TABLES", "__version__"]
