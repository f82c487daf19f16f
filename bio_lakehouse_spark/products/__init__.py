"""Products on top of the engine (SURVEY.md §7.2 phase 6): what-if
simulator, health alerts, FHIR export, NL-to-SQL surface, driver-side
numerics (LOWESS, MI feature selection, walk-forward CV), experiments.
"""
