"""End-to-end Ray Data pipelines: index build, search, ETL."""
