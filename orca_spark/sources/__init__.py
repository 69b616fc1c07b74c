"""Custom data sources built on Spark 4's Python DataSource API."""
