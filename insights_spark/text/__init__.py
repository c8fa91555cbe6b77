"""Web-scale training-data operators: dedup, quality, lang-id, similarity."""
