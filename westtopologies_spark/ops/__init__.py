"""Operator library: SURVEY.md §2 inventory re-expressed as
composable DataFrame -> DataFrame functions."""
