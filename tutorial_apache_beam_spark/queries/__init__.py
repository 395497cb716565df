"""Driver-contract query definitions, grouped by operator family.

Each module registers named queries + DuckDB oracles via
`tutorial_apache_beam_spark.registry.register`.
"""
