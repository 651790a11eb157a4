"""Operator modules. Each module pairs DataFrame implementations with the
DuckDB oracle SQL used by the driver's correctness gate (ORACLE_SQL dicts,
aggregated by samsa_spark.registry)."""
