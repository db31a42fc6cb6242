"""Reusable ETL pipelines (the reference's workload, generalized)."""
