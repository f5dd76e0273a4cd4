"""North-star LLM-data-pipeline operators (BASELINE.json:6): dedup,
similarity search, text analysis, multimodal plumbing — engineered for
100 TB scale, each verified against a DuckDB oracle where SQL can
express the semantics."""
