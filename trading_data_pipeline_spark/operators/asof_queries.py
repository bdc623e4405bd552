"""Filled in by build plan (SURVEY.md §7)."""
