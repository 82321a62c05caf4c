from batch_processing_etl_orchestration_spark.warehouse.catalog import (
    WAREHOUSE_SCHEMAS,
    create_database,
    create_table,
    create_all_tables,
    drop_all_tables,
    truncate_table,
    list_tables,
    preview_table,
    append_rows,
    merge_idempotent,
)

__all__ = [
    "WAREHOUSE_SCHEMAS",
    "create_database",
    "create_table",
    "create_all_tables",
    "drop_all_tables",
    "truncate_table",
    "list_tables",
    "preview_table",
    "append_rows",
    "merge_idempotent",
]
