"""Distributed operators: dedup, similarity, text analysis, as-of/range
joins, sessionization — all Catalyst-native unless noted."""
