"""Scalar/vector function libraries.

The reference has no built-in function library — every scalar computation is
open-coded inside native C++ lambdas (SURVEY.md §2.2).  Here the equivalents
are `pyspark.sql.functions` compositions (JVM-side, codegen'd), grouped by
domain: hashing, text, vectors.
"""
