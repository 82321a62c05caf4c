"""Expression helpers: cleaning casts, exact aggregation, text
analysis, vector math. All built on pyspark.sql.functions (JVM-side,
whole-stage-codegen) — no Python UDFs in any hot path."""
