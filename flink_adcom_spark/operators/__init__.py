"""Custom operators: combine/adCombine parity, multimodal plumbing."""
