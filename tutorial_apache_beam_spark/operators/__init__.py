"""Engine operators.

Each module re-expresses one family of the reference's (or the extension
scope's) operators Spark-first:

- ``windowing``  — event-time tumbling / sliding / session windows
                   (reference Demo2's `Window.into(FixedWindows)` surface).
- ``etl``        — parse / project / validate element-wise transforms
                   (reference Demo1's `MessageTransform`).
- ``relational`` — joins / sorts / top-k / set ops / grouping sets parity.
- ``dedup``      — exact + near-duplicate detection (MinHash-LSH, SimHash,
                   n-gram Jaccard, embedding cosine).
- ``similarity`` — vector similarity search (brute-force + LSH-bucketed).
- ``text``       — language-ID, quality scoring, token counts, fingerprints.
- ``multimodal`` — binary media columns: schema + Pandas-UDF plumbing.
- ``retention``  — partition TTL (the reference's 7-day table expiry).
- ``maintenance``— bucketed layouts (shuffle-free co-located joins) and
                   small-file compaction for streaming append sinks.
"""
