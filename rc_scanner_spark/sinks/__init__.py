"""Sinks K1-K4 (reference scanner.py:143-175, flaglog.py)."""
