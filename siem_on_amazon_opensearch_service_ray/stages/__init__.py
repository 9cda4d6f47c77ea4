"""Per-record / per-batch transform stages (the reference's ETL half,
re-expressed as vectorized ``map_batches`` functions over Arrow
batches).  See SURVEY.md §2 for the operator inventory each module
mirrors."""
