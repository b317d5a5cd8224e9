"""Column-builder helpers (all JVM-side Catalyst expressions)."""
