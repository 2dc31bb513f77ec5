"""Sources: test-table loaders, synthetic page-table generator (F1),
and OpenAlex-snapshot schemas/readers (F2/F3)."""
