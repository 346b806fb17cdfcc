"""Operators: CDC transform/apply, as-of join, dedup, similarity, text, multimodal."""
