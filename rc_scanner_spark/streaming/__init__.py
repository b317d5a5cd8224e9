"""Structured Streaming twin of the scanner (reference event loop,
scanner.py:75-88)."""
