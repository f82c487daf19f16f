"""Relational, window, and statistical operators (SURVEY.md §2).

Every operator here is declarative-first: DataFrame expressions that
Catalyst can push down, prune, and codegen. Pandas-UDF paths exist
only where Spark genuinely lacks the primitive (exact EMA, scipy
p-values) and are Arrow-batched, never row-at-a-time.

Scale posture: every window helper takes partition keys
(``partition_by``). The reference runs single-entity, globally-ordered
windows (fine at 2k rows); at 100 TB the same call sites pass an
entity key and the plan becomes a partitioned window with no global
sort (SURVEY.md §7.1.5).
"""
