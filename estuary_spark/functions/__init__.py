"""Column-level function library: text analysis, dedup, similarity,
multimodal plumbing — the training-data-pipeline operations that make the
engine useful on 100 TB transcript/document corpora."""
