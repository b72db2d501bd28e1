"""Column-expression function library (native Catalyst exprs first).

Every function here that the reference implements as a JVM scalar UDF
(SURVEY.md §2.8) is re-expressed as a pure Column expression so it stays
inside whole-stage codegen; only genuinely non-relational kernels
(geometry assembly, codecs) live in Arrow UDFs elsewhere.
"""
