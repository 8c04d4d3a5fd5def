"""Column-expression builders (JVM-side, codegen'd — no Python UDFs).

Every geocode/tile expression is generated as ANSI-SQL text usable both
by Spark (`F.expr`) and by the DuckDB oracle, so the two engines compute
bit-identical values (integer hashing + IEEE double arithmetic only).
"""
