"""LLM-data-pipeline operators over documents/embeddings: text
analysis, deduplication, similarity search, multimodal plumbing.

These extend the reference's surface (SURVEY.md §7.2 step 9 /
BASELINE.json north star): every operator is designed
partition-parallel for 100 TB — no driver-side loops, no collects;
dedup joins are shingle/band-bucketed, similarity search has an
LSH-bucketed scale path next to the brute-force baseline.
"""
