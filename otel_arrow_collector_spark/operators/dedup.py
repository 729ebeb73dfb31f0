"""dedup operators — filled in M7 (see tasks)."""

QUERIES: dict = {}
ORACLES: dict = {}
