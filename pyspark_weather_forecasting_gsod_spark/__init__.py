"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference repo jmayank23/PySpark-Weather-Forecasting-GSOD
(a GSOD weather-forecasting PySpark pipeline), re-expressed as a composable,
importable, scale-safe library.

Design principles (see SURVEY.md §7):
  * DataFrame/SQL API only — no RDDs, no row-at-a-time Python UDFs in hot paths.
  * Explicit schemas (sources/io.py); Catalyst does pushdown/pruning for free.
  * Single-pass multi-column rewrites (one ``select``, not chained
    ``withColumn``) so plans stay small.
  * Broadcast joins for small aggregate sides (replaces the reference's
    driver-side dict lookup, ipynb:797-826).
  * cache/checkpoint discipline in iterative operators (the reference
    re-executes its full lineage per imputation iteration, ipynb:1066-1067).
  * Extensions for large-scale training-data pipelines: dedup, similarity
    search, text analysis, multimodal columns (ext/).
"""

__version__ = "0.1.0"

from .session import get_spark  # noqa: F401
