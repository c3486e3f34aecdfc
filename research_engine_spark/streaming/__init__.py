"""Structured Streaming: incremental index append of new transcript turns."""
