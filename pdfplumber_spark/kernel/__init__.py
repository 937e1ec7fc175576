"""Pure pandas/numpy kernels — no Spark imports allowed in this package.

These kernels are the single source of truth for extraction semantics: the
oracle runs them single-process; the Spark engine runs the same functions
Arrow-batched inside ``mapInPandas`` / ``applyInPandas``. Byte-identity of
Spark output vs oracle output is therefore structural.
"""
