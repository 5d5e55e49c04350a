"""Structured-streaming jobs, the adCombine stateful operator, and the
adaptive trigger controller (the reference's novel runtime-adaptivity)."""
