"""Engine scalar-function helpers shared by operators and queries.

- ``hashing`` — a portable 60-bit hash with bit-identical Spark and DuckDB
  forms, the foundation that makes MinHash/SimHash oracle-checkable.
- ``text``    — tokenization, shingling, stopword/quality heuristics.
- ``vectors`` — cosine/dot-product column expressions over array<float>.
"""
