"""Ingestion sources: paginated REST JSON (S1-S4), cached dimension
refresh (S6), CSV/Excel dims (S5/S7). HTTP itself is injected as a
callable so everything is testable offline; at scale the fetch loop
runs once per bronze refresh and lands pages as files for a
distributed spark.read."""

from batch_processing_etl_orchestration_spark.sources.rest import (
    PaginatedRestSource,
    LastModifiedCache,
)
from batch_processing_etl_orchestration_spark.sources.files import (
    read_csv_dim,
    read_excel_sheets,
)

__all__ = [
    "PaginatedRestSource",
    "LastModifiedCache",
    "read_csv_dim",
    "read_excel_sheets",
]

from batch_processing_etl_orchestration_spark.sources.xlsx import (  # noqa: E402
    read_workbook,
    write_workbook,
)

__all__ += ["read_workbook", "write_workbook"]
