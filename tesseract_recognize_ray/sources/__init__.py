"""Readers/writers. Physical format: Parquet; Lance (the north-star target
format) is import-gated since this sandbox ships no lance package."""
