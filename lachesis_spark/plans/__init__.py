"""Workload plan libraries: TPC-H suite, linear algebra, similarity search.

Mirrors the reference's workload layers (src/tpch/, src/linearAlgebraDSL/,
src/tpchBench/) re-expressed on the operator algebra.
"""
