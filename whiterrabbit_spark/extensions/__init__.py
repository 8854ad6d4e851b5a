"""LLM-data-pipeline extensions beyond the reference surface.

The reference (FritscheLab/whiteRRabbit) is a profiling tool only; these
operators are the driver's north-star additions (BASELINE.json): exact and
near-duplicate detection, similarity search over embeddings, text analysis,
multimodal column plumbing, and streaming profiles — each designed for
100 TB scale (bounded shuffles, broadcastable small sides, no driver-side
loops over data).
"""
