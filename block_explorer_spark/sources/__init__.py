"""Readers, writers, and fixture generators.

  parquet    — partitioned-parquet layout + idempotent upsert protocol
  generators — deterministic GBE-shaped fixtures (lifelines, jet trees,
               pulse chains with gaps) used by the test suite
"""
