"""Named query plans: reference-pipeline batch forms + relational coverage.

Every plan here is registered in ``__spark_entry__.py::queries()`` with a
matching DuckDB oracle in ``oracle_sql()``.

Determinism convention (SURVEY §7.4 item 5): metric doubles are summed
through DECIMAL so Spark's partial/final aggregation order and DuckDB's
parallel aggregation produce bit-identical results; final outputs cast back
to double. Argmax/top-k orderings always carry a full tie-break down to a
unique key.
"""
