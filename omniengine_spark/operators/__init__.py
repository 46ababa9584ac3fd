"""Operators: relational + domain + corpus operators (SURVEY §2)."""
