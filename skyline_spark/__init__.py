"""skyline_spark — a from-scratch PySpark-native re-expression of
earthgecko/skyline's analyzer as a parse → enrich → route → aggregate
log/telemetry pipeline over a transcripts table.

Reference semantics: /root/reference (earthgecko/skyline). Citations in
docstrings are ``path:line`` into that tree. This package is NOT a port:
the execution architecture is Spark DataFrame / Catalyst / Arrow-batched
pandas UDFs; only the *statistical semantics* (algorithm formulas,
consensus vote, exception filters, routing rules) mirror the reference.
"""

from skyline_spark.config import PipelineConfig

__all__ = ["PipelineConfig"]
__version__ = "0.1.0"
