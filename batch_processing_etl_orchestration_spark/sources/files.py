"""File-based dimension sources: CSV (S7) and multi-sheet Excel (S5).

The reference reads a 150-row coordinate CSV
(OpenMeteoWeatherPipelineHourlyData.py:47-57) and two Excel reference
sheets cached by Last-Modified (EIA930PipelineHourlyData.py:15-42).
Excel support is gated behind an import-try: the container has no
Excel reader, so the loader degrades to a clear error while the CSV
path (the one exercised by tests) is pure Spark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_csv_dim(spark: SparkSession, path: str) -> DataFrame:
    """S7 — header CSV dimension scan with schema inference
    (pd.read_csv, OpenMeteoWeatherPipelineHourlyData.py:47-57)."""
    return spark.read.csv(path, header=True, inferSchema=True)


def read_excel_sheets(
    spark: SparkSession, path: str, sheets: list[str]
) -> dict[str, DataFrame]:
    """S5 — multi-sheet Excel scan (pd.read_excel(sheet_name=[...]),
    EIA930PipelineHourlyData.py:33-34). Requires an Excel engine
    (openpyxl) on the driver; the small sheets then become broadcast
    dims via createDataFrame."""
    try:
        import pandas as pd  # noqa: F401
        import openpyxl  # noqa: F401
    except ImportError as e:  # pragma: no cover - environment-dependent
        raise NotImplementedError(
            "Excel ingestion needs openpyxl; stage the sheets as CSV/parquet "
            "and use read_csv_dim instead"
        ) from e
    import pandas as pd

    frames = pd.read_excel(path, sheet_name=sheets)
    return {name: spark.createDataFrame(pdf) for name, pdf in frames.items()}
