"""Reusable column-expression and pandas-UDF building blocks."""
