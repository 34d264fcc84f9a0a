"""Operator library: DataFrame-first implementations of the reference's
dataflow operators (SURVEY.md §2) plus large-scale training-data ops
(dedup, similarity search, text analysis, multimodal plumbing)."""
