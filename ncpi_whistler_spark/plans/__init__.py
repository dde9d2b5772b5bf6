"""Plan compiler: whistler-style study config → lazy DataFrame DAG.

Replaces the reference's eager row-at-a-time extraction + whistle
subprocess (wstlr/play.py, wstlr/extractor.py) with a driver-side compiler
that emits declarative DataFrame plans executed by Catalyst.
"""

from ncpi_whistler_spark.plans.config import StudyConfig, TableConfig
from ncpi_whistler_spark.plans.pipeline import extract_dataset

__all__ = ["StudyConfig", "TableConfig", "extract_dataset"]
