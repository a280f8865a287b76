"""The reference's star-schema pipeline: staging → dims → fact → marts.

Each dbt model (``/root/reference/dbt_pipeline_demo/models/``) becomes a
pure ``DataFrame -> DataFrame`` function; the dashboard's seven analytic
queries (``portfolio_app/app.py:81-439``) become query functions over the
mart outputs.
"""
