"""Scalar function library (SURVEY.md 2.7).

Import submodules directly (``from inmem_vector_db_spark.functions import
distance``) — no re-exports here, so submodule names never get shadowed.
"""
