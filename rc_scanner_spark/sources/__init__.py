"""Custom sources (PySpark 4 Python DataSource API)."""
