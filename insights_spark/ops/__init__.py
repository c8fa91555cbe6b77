"""Relational operator pack mirroring SURVEY.md §2 (P/J/A/F/U rows)."""
