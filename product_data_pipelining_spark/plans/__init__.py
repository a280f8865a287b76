"""Execution planning: the DAG runner that replaces dbt orchestration."""
