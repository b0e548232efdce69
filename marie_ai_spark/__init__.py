"""marie_ai_spark — a from-scratch PySpark-native main-content extraction engine.

Re-expresses the extraction semantics of the reference document-AI platform
(marieai/marie-ai, see SURVEY.md) as idiomatic Spark: DataFrame operators,
vectorized Arrow/pandas UDFs, salted aggregations, and a lineage table for
idempotent mid-run resume.

Layout:
    ref_ops/    pure-Python operator semantics shared by the Spark UDFs and the
                driver-side oracle (single source of truth -> byte equality)
    operators/  Spark DataFrame operators (extraction, dedup, similarity, ...)
    sources/    table IO + deterministic synthetic transcripts generator
    plans/      end-to-end jobs, lineage/checkpoint/resume
    functions/  portable column expression helpers
    streaming/  incremental/streaming entry points
"""

__version__ = "0.1.0"
