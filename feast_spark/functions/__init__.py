"""Scalar function helpers (URL/domain/hash/date) — SURVEY.md §2.8."""
