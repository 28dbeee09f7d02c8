"""Large-scale training-data pipeline operators (dedup, text analysis,
similarity search, multimodal plumbing) — all built-in-function / Arrow-UDF
based, no per-row Python in any hot path."""
