"""Operator implementations, one module per family.

- ``relational``: the reference's scan/filter/project/join/agg/window/sort
  surface (SURVEY.md §2.1-§2.8) re-expressed over the testdata star schema.
- ``upsert``: PK upsert emulation (INSERT OR REPLACE semantics) on
  immutable storage.
- ``dedup``: exact + fuzzy document dedup (hash, MinHash-LSH, SimHash,
  n-gram Jaccard, embedding-cosine).
- ``similarity``: approximate nearest-neighbor search over embeddings.
- ``textops``: language-ID, quality scoring, token counting,
  fingerprinting.
- ``multimodal``: binary-column plumbing for image/audio/video payloads.
"""
