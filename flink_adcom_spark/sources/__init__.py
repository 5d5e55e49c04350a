"""Streaming sources: rate-controlled replay + skew/rate-varying generators."""
