"""Data-quality checks: the reference's 16 dbt schema tests as DataFrame assertions."""
