"""Data sources: REST ingestion connector + synthetic fixture generator."""
