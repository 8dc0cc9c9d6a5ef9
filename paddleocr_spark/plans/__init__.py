"""Spark execution plans: the extraction pipeline, audit/lineage, resume."""
