"""Developer tooling (not part of the query surface)."""
