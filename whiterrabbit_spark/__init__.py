"""whiterrabbit_spark — a PySpark-native data profiling / scan-report engine.

A from-scratch re-expression of the capabilities of FritscheLab/whiteRRabbit
(reference: /root/reference/whiteRRabbit.R, a single-file R data.table
profiler) on the Spark DataFrame API, designed for 100 TB-scale folders,
plus LLM-data-pipeline extensions (dedup, similarity search, text analysis,
multimodal plumbing, streaming profiles) the reference does not have.

Architecture (SURVEY.md §7): pure DataFrame/SQL programs — Catalyst does the
optimizing; no RDDs, no custom rules. Heavy work (scans, aggregations,
shuffles) stays JVM-side; result frames are KB-scale and collect to the
driver for report sinks.
"""

from whiterrabbit_spark.config import ScanConfig
from whiterrabbit_spark.session import get_spark

__all__ = ["ScanConfig", "get_spark"]
__version__ = "0.3.0"
