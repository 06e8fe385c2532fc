"""Operators: the engine's analytic surface.

``kmeans``     — the reference's full pipeline (SURVEY.md §2.2, O1-O10).
``dedup``      — exact/near deduplication (SURVEY.md §2.6).
``similarity`` — top-k / ANN similarity search over embeddings.
``textstats``  — language-ID, quality scoring, tokens, fingerprints.
``windows``    — event-time windowed aggregation and sessionization.
"""
