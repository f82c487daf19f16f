"""Bio-lakehouse parity layer: bronze→silver normalizers, gold tables,
analytics views — the reference's medallion pipeline as one Spark app
(SURVEY.md §3.2, §7.2 phases 2-3).
"""
