"""Query operators: pure DataFrame -> DataFrame plan builders.

- ``timeseries`` — the reference's operator surface (SURVEY.md §2 Part A)
- ``asof``       — range join / as-of join compositions (Part B)
- ``dedup``      — exact + near-duplicate detection (Part C)
- ``similarity`` — embedding top-k similarity search (Part C)
- ``text``       — text analysis: lang-id, quality, tokens, fingerprints (Part C)
- ``multimodal`` — binary media column plumbing (Part C)
"""
