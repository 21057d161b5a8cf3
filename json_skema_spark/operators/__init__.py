"""Table-scope operators: cross-row checks the single-document reference
cannot express, generalized from its semantics (SURVEY.md §2.f-2.g)."""
