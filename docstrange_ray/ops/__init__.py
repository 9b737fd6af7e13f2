"""Large-scale training-data operations over flat text / embedding tables.

These extend the extraction engine with the operators a 100 TB
training-data pipeline needs (dedup, similarity search, text analysis,
multimodal plumbing). They run over the driver testdata tables
(`documents`, `embeddings`, `events`) and each headline op has a
matching DuckDB oracle in ``__ray_entry__.oracle_sql`` where SQL can
express it.
"""
