"""Scalar/text functions: analyzer chain, Porter stemmer, text statistics."""
