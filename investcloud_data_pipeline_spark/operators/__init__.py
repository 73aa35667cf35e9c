"""Operator library.

Core pipeline operators (quality, dedup, enrich, gold) plus the
training-data-pipeline extensions (fuzzy dedup, similarity search, text
analysis, multimodal columns). All are plain functions DataFrame→DataFrame
so Catalyst sees one fused logical plan per query.
"""
