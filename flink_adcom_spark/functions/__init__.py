"""Scalar column-expression libraries (SQL-expressible, engine-portable)."""
