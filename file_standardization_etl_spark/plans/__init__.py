"""Named query plans exercising the full operator inventory (SURVEY.md §2)
over the shared testdata, each paired with a DuckDB oracle."""
