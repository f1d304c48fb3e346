"""Stub — populated per SURVEY.md §7.3 milestones."""
