"""Dataflow operators (SURVEY.md §2) + training-data pipeline ops."""
